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

    def test_sample_pdf_consistency(self):
        """Importance sampling is exact: E[f·|cos|/pdf] = 1 in a white
        furnace, and hair_pdf integrates to 1 over the sphere (the pdf↔
        sample consistency check hair.cpp's SamplingConsistency test does)."""
        N = 100000
        rs = np.random.RandomState(7)
        wo = jnp.tile(jnp.asarray([[0.3, 0.5, 0.81]])
                      / np.linalg.norm([0.3, 0.5, 0.81]), (N, 1))
        h = jnp.full(N, 0.3)
        sigma_a = jnp.zeros((N, 3))
        u = jnp.asarray(rs.rand(3, N), jnp.float32)
        wi, f, pdf = hair.hair_sample(wo, h, sigma_a, u[0], u[1], u[2],
                                      beta_m=0.25, beta_n=0.3, alpha=2.0)
        est = (f * jnp.abs(wi[:, 2:3])
               / jnp.maximum(pdf, 1e-12)[:, None]).mean(0)
        np.testing.assert_allclose(np.asarray(est), 1.0, atol=0.01)
        wiu = uniform_sphere(N, seed=9)
        pu = hair.hair_pdf(wo, wiu, h, sigma_a, beta_m=0.25, beta_n=0.3,
                           alpha=2.0)
        assert abs(float((pu * 4 * math.pi).mean()) - 1.0) < 0.05

    def test_material_table_dispatch(self):
        """HAIR rows route bsdf_f/pdf/sample through the hair model and the
        returned (f, pdf) match re-evaluation (scene/materials.py lanes)."""
        from pbrt_tpu.scene import materials as mat
        rows = [dict(type=mat.MATTE, kd=(.5, .5, .5)),
                dict(type=mat.HAIR, sss_sigma_a=(0.1, 0.2, 0.3),
                     beta_m=0.25, beta_n=0.3, hair_alpha=2.0, eta=1.55)]
        tbl = mat.make_material_table(rows, 3)
        assert tbl.has_hair
        mp = mat.gather_materials(tbl, jnp.asarray([0, 1, 1, 0]))
        rs = np.random.RandomState(1)
        wo = jnp.tile(jnp.asarray([[0.3, 0.5, 0.81]])
                      / np.linalg.norm([0.3, 0.5, 0.81]), (4, 1))
        hh = jnp.asarray([0.0, 0.4, -0.2, 0.0])
        ul = jnp.asarray(rs.rand(4), jnp.float32)
        uu = jnp.asarray(rs.rand(4, 2), jnp.float32)
        wi, f, pdf, _ = mat.bsdf_sample(mp, wo, ul, uu, h=hh)
        fe = mat.bsdf_f(mp, wo, wi, h=hh)
        pe = mat.bsdf_pdf(mp, wo, wi, h=hh)
        np.testing.assert_allclose(np.asarray(fe), np.asarray(f), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pe), np.asarray(pdf),
                                   atol=1e-4)
