"""Fourier (measured) BSDF table: synthetic SCATFUN round trip + lambertian
equivalence (materials/fourier.cpp + tests/fourierbsdf.cpp's role, without
the 17kLoC embedded fixture)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.scene import fourier


def make_lambertian_table(path, rho=0.7, n_mu=16):
    """A lambertian BRDF in the SCATFUN basis: f = rho/pi, so the stored
    function a0 = rho/pi * |mu_i| (pbrt divides by |mu_i| at eval) and only
    the k=0 Fourier term is nonzero, for reflection quadrants only."""
    mu = np.linspace(-1.0, 1.0, n_mu)
    coeffs = []
    for i in range(n_mu):
        row = []
        for o in range(n_mu):
            # reflection: mu_i and mu_o on opposite... pbrt convention:
            # muI = cos(-wi), muO = cos(wo); reflection has muI*muO < 0
            if mu[i] * mu[o] < 0:
                a0 = rho / np.pi * abs(mu[i])
            else:
                a0 = 0.0
            row.append(np.asarray([[a0]], np.float32))
        coeffs.append(row)
    fourier.write_bsdf(path, mu, coeffs, eta=1.0)


class TestFourierBSDF:
    def test_round_trip_header(self):
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "lam.bsdf")
            make_lambertian_table(p)
            t = fourier.read_bsdf(p)
            assert t.n_channels == 1
            assert t.mu.shape == (16,)
            assert float(t.eta) == 1.0
            assert t.m_max == 1

    def test_lambertian_equivalence(self):
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "lam.bsdf")
            make_lambertian_table(p, rho=0.7, n_mu=64)
            t = fourier.read_bsdf(p)
        rs = np.random.RandomState(0)
        # reflection geometry: wo up, wi up (pbrt muI = cos(-wi) < 0)
        n = 256
        wo = rs.randn(n, 3)
        wo[:, 2] = np.abs(wo[:, 2]) + 0.2
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        wi = rs.randn(n, 3)
        wi[:, 2] = np.abs(wi[:, 2]) + 0.2
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        f = np.asarray(fourier.eval_fourier(t, jnp.asarray(wo, jnp.float32),
                                            jnp.asarray(wi, jnp.float32)))
        # away from the grid edges the spline reproduces rho/pi
        inner = (np.abs(wi[:, 2]) > 0.3) & (np.abs(wo[:, 2]) > 0.3)
        np.testing.assert_allclose(f[inner, 0], 0.7 / np.pi, rtol=0.05)

    def test_fourier_sum_cosine_series(self):
        # a(φ) = 0.5 + 0.25 cos φ + 0.1 cos 2φ
        ak = jnp.asarray([[0.5, 0.25, 0.1]])
        for phi in (0.0, 0.7, 2.0):
            v = float(fourier.fourier_sum(
                ak, jnp.asarray([3]), jnp.asarray([np.cos(phi)]), 3)[0])
            expect = 0.5 + 0.25 * np.cos(phi) + 0.1 * np.cos(2 * phi)
            np.testing.assert_allclose(v, expect, atol=1e-5)


class TestFourierMaterial:
    def test_fourier_sphere_furnace(self):
        """A FOURIER material backed by a lambertian SCATFUN table renders
        like matte: sphere furnace mean = rho·L (material-row wiring through
        scene.fourier + MaterialTable.fourier_id)."""
        from pbrt_tpu.core.spectrum import RGB
        from pbrt_tpu.core import transform
        from pbrt_tpu.integrators import render
        from pbrt_tpu.scene import camera as cam_mod
        from pbrt_tpu.scene import materials as mat
        from pbrt_tpu.scene.types import SceneBuilder

        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "lam.bsdf")
            make_lambertian_table(p, rho=0.5, n_mu=64)
            b = SceneBuilder(RGB)
            fid = b.add_fourier_table(p)
            m = b.add_material(type=mat.FOURIER, fourier_id=fid)
            b.add_sphere((0, 0, 3), 1.0, mat=m)
            b.add_light(type="infinite", L=1.0,
                        env_map=np.ones((1, 1, 3), np.float32))
            scene = b.build()
            cam = cam_mod.make_perspective(
                transform.look_at((0, 0, 0), (0, 0, 3), (0, 1, 0)),
                20.0, (10, 10))
            img = np.asarray(render(scene, cam, spp=196, integrator="path",
                                    max_depth=2))
            np.testing.assert_allclose(img.mean(), 0.5, atol=0.03)
