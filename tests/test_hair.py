"""Hair BSDF: white furnace + reciprocity (tests/hair.cpp counterparts)."""

import math

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng
from pbrt_tpu.scene import hair


def uniform_sphere(n, seed=0):
    pid = jnp.arange(n, dtype=jnp.uint32)
    u = jnp.stack([rng.uniform(pid, seed, 0), rng.uniform(pid, seed, 1)],
                  -1)
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * math.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


class TestHair:
    def test_white_furnace(self):
        """sigma_a = 0 hair scatters all energy: ∫ f |cos| dω = 1 for any
        wo (tests/hair.cpp WhiteFurnace), checked by uniform MC."""
        N = 200000
        wi = uniform_sphere(N, seed=1)
        for beta in (0.4, 0.8):
            wo = jnp.tile(jnp.asarray([[0.3, 0.8, 0.52]])
                          / np.linalg.norm([0.3, 0.8, 0.52]), (N, 1))
            h = jnp.full(N, 0.3)
            sigma_a = jnp.zeros((N, 3))
            f = hair.hair_f(wo, wi, h, sigma_a, beta_m=beta, beta_n=beta,
                            alpha=0.0)
            # E[f |cos(wi)| / pdf] with pdf = 1/4π
            est = float((f[:, 0] * jnp.abs(wi[:, 2])).mean() * 4 * math.pi)
            assert abs(est - 1.0) < 0.05, (beta, est)

    def test_reciprocity(self):
        """f(wo,wi) ≈ f(wi,wo) (tests/hair.cpp Reciprocity; exact up to the
        known asymmetry of the model at alpha≠0 — tested at alpha=0)."""
        rs = np.random.RandomState(3)
        n = 64
        wo = rs.randn(n, 3)
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        wi = rs.randn(n, 3)
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        h = jnp.full(n, -0.2)
        sigma_a = jnp.full((n, 3), 0.25)
        f1 = np.asarray(hair.hair_f(jnp.asarray(wo, jnp.float32),
                                    jnp.asarray(wi, jnp.float32), h,
                                    sigma_a, alpha=0.0))
        f2 = np.asarray(hair.hair_f(jnp.asarray(wi, jnp.float32),
                                    jnp.asarray(wo, jnp.float32), h,
                                    sigma_a, alpha=0.0))
        # compare f * |cos| symmetrized (the 1/|cos wi| factor breaks raw
        # symmetry by design). The Chiang model is only approximately
        # reciprocal (Ap uses cosThetaO alone), so check in aggregate and
        # for the bulk of directions, as the reference's eps-test does.
        # NOTE: the Chiang hair model is NOT exactly reciprocal (Ap depends
        # on wo only) — the reference's own Reciprocity test is disabled
        # behind a preprocessor guard (tests/hair.cpp:44-60). Assert only
        # the typical-direction agreement that does hold.
        s1 = f1 * np.abs(wi[:, 2:3])
        s2 = f2 * np.abs(wo[:, 2:3])
        rel = np.abs(s1 - s2) / np.maximum(np.maximum(s1, s2), 1e-2)
        assert np.median(rel) < 0.1

    def test_absorption_darkens(self):
        N = 10000
        wi = uniform_sphere(N, seed=2)
        wo = jnp.tile(jnp.asarray([[0.1, 0.9, 0.42]])
                      / np.linalg.norm([0.1, 0.9, 0.42]), (N, 1))
        h = jnp.zeros(N)
        f_clear = hair.hair_f(wo, wi, h, jnp.zeros((N, 3)))
        f_dark = hair.hair_f(wo, wi, h, jnp.full((N, 3), 2.0))
        assert float(f_dark.mean()) < float(f_clear.mean())

    def test_sigma_a_helpers(self):
        sa = np.asarray(hair.sigma_a_from_concentration(1.3, 0.0))
        assert (sa > 0).all()
        sr = np.asarray(hair.sigma_a_from_reflectance(
            jnp.asarray([0.5, 0.3, 0.1]), 0.3))
        assert (np.diff(sr) > 0).all()  # darker channels absorb more
