"""Media + volpath tests: Beer–Lambert attenuation, HG normalization
(mirrors tests/hg.cpp), grid transmittance, energy conservation."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng, transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import media
from pbrt_tpu.scene.types import SceneBuilder


class TestHG:
    def test_phase_normalization(self):
        """∫ p dω = 1 over the sphere (tests/hg.cpp normalization)."""
        for g in (-0.6, 0.0, 0.35, 0.9):
            mu = np.linspace(-1, 1, 20001)
            p = np.asarray(media.hg_phase(jnp.asarray(mu), jnp.asarray(g)))
            integral = 2 * np.pi * np.trapezoid(p, mu)
            np.testing.assert_allclose(integral, 1.0, rtol=1e-3)

    def test_sample_hg_distribution(self):
        """Sampled directions' cos-theta histogram matches the pdf."""
        g = 0.5
        N = 200000
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
        wi, ph = media.sample_hg(wo, u, jnp.asarray(g))
        cos_t = np.asarray(wi[:, 2])
        # pbrt's HG uses denom 1+g²+2g·cos(wo,wi) (wo points backward), so
        # the mean sampled cosine against wo is −g (medium.h:50-102)
        np.testing.assert_allclose(cos_t.mean(), -g, atol=0.01)

    def test_homogeneous_transmittance(self):
        med = media.make_homogeneous(0.3, 0.5)
        p0 = jnp.zeros((4, 3))
        p1 = jnp.asarray([[2.0, 0, 0]] * 4)
        tr = np.asarray(media.transmittance(
            med, p0, p1, jnp.arange(4, dtype=jnp.uint32)))
        np.testing.assert_allclose(tr, np.exp(-0.8 * 2.0), rtol=1e-5)

    def test_distance_sampling_unbiased(self):
        """E[w_surf · 1{no scatter}] = Tr(t_max) and medium+surface weights
        integrate the source correctly (homogeneous.cpp estimator)."""
        med = media.make_homogeneous(0.4, 0.6)
        N = 200000
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = rng.uniform(pid, 0, 0)
        t_max = jnp.full(N, 1.5)
        o = jnp.zeros((N, 3))
        d = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (N, 1))
        t, sampled, w_med, w_surf = media.sample_distance(
            med, o, d, t_max, u, pid)
        est_tr = np.asarray(
            jnp.where(~sampled, w_surf[:, 0], 0.0)).mean()
        np.testing.assert_allclose(est_tr, np.exp(-1.0 * 1.5), rtol=0.02)

    def test_grid_density_lookup(self):
        dens = jnp.ones((4, 4, 4)).at[2, 2, 2].set(5.0)
        med = media.make_grid(0.1, 0.2, dens, (0, 0, 0), (1, 1, 1))
        inside = media.density_at(med, jnp.asarray([[0.63, 0.63, 0.63]]))
        outside = media.density_at(med, jnp.asarray([[2.0, 0.5, 0.5]]))
        assert float(inside[0]) > 1.0
        assert float(outside[0]) == 0.0


class TestVolpath:
    def _scene(self, sigma_s=0.0, sigma_a=0.0, g=0.0):
        b = SceneBuilder(RGB)
        m = b.add_material(type=0, kd=0.5)
        b.add_mesh([(-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_light(type="point", I=20.0, pos=(0, 3, 0))
        scene = b.build()
        if sigma_s or sigma_a:
            med = media.make_homogeneous(sigma_a, sigma_s, g)
            scene = dataclasses.replace(scene, camera_medium=med)
        return scene

    def _cam(self):
        return cam_mod.make_perspective(
            transform.look_at((0, 1.5, -3), (0, 0.5, 0), (0, 1, 0)), 30.0,
            (8, 8))

    def test_vacuum_matches_path(self):
        scene = self._scene()
        img_v = np.asarray(render(scene, self._cam(), spp=64,
                                  integrator="volpath", max_depth=3,
                                  seed=2))
        img_p = np.asarray(render(scene, self._cam(), spp=64,
                                  integrator="path", max_depth=3, seed=2))
        np.testing.assert_allclose(img_v.mean(), img_p.mean(), rtol=0.05)

    def test_absorbing_medium_darkens(self):
        bright = np.asarray(render(self._scene(), self._cam(), spp=64,
                                   integrator="volpath", seed=1)).mean()
        dark = np.asarray(render(self._scene(sigma_a=0.5), self._cam(),
                                 spp=64, integrator="volpath",
                                 seed=1)).mean()
        assert dark < bright * 0.6
        assert dark > 0

    def test_scattering_medium_glows(self):
        """A purely scattering medium redistributes but keeps energy: image
        gains in-scattered halo around the light."""
        clear = np.asarray(render(self._scene(), self._cam(), spp=128,
                                  integrator="volpath", seed=3))
        foggy = np.asarray(render(self._scene(sigma_s=0.3), self._cam(),
                                  spp=128, integrator="volpath", seed=3))
        # fog adds radiance to previously-dark sky pixels
        sky = clear.sum(-1) < 1e-6
        if sky.any():
            assert foggy.sum(-1)[sky].mean() > 1e-4


class TestMediumInterface:
    def test_interior_absorption_sphere(self):
        """A null-material sphere filled with a purely absorbing medium
        attenuates the background by exp(−sigma_a·chord) — the
        MediumInterface + per-lane medium tracking path (core/medium.h:114,
        GeometricPrimitive inside/outside)."""
        b = SceneBuilder(RGB)
        from pbrt_tpu.scene import materials as mat
        m_null = b.add_material(type=mat.NONE)
        med = b.add_medium(media.make_homogeneous(0.5, 0.0))
        b.add_sphere((0, 0, 3), 1.0, mat=m_null, med_in=med, med_out=-1)
        b.add_light(type="infinite", L=1.0,
                    env_map=np.ones((1, 1, 3), np.float32))
        scene = b.build()
        cam = cam_mod.make_perspective(
            transform.look_at((0, 0, 0), (0, 0, 3), (0, 1, 0)), 4.0,
            (6, 6))
        img = np.asarray(render(scene, cam, spp=256, integrator="volpath",
                                max_depth=5, seed=5))
        # chord ≈ 2 across the narrow fov → Tr ≈ e^{−1}
        np.testing.assert_allclose(img.mean(), np.exp(-1.0), atol=0.02)

    def test_shadow_ray_through_interface(self):
        """NEE shadow rays accumulate Tr through null boundaries
        (VisibilityTester::Tr, core/light.cpp:64-85): a floor point lit
        through an absorbing slab sees exp(−tau)·direct."""
        from pbrt_tpu.scene import materials as mat

        def build(with_slab):
            b = SceneBuilder(RGB)
            m = b.add_material(type=0, kd=0.6)
            b.add_mesh([(-20, 0, -20), (20, 0, -20), (20, 0, 20),
                        (-20, 0, 20)], [(0, 1, 2), (0, 2, 3)], mat=m)
            if with_slab:
                m_null = b.add_material(type=mat.NONE)
                med = b.add_medium(media.make_homogeneous(1.0, 0.0))
                # slab y ∈ [1, 1.5] crossing the light path
                b.add_aaplane((-5, 1.0, -5), (5, 1.0, 5), 1, mat=m_null,
                              med_in=-1, med_out=med)
                b.add_aaplane((-5, 1.5, -5), (5, 1.5, 5), 1, mat=m_null,
                              med_in=med, med_out=-1)
            b.add_light(type="point", I=20.0, pos=(0, 3, 0))
            return b.build()

        cam = cam_mod.make_perspective(
            transform.look_at((0, 0.6, -2), (0, 0, 0), (0, 1, 0)), 25.0,
            (6, 6))
        base = np.asarray(render(build(False), cam, spp=64,
                                 integrator="volpath", max_depth=2,
                                 seed=7)).mean()
        slab = np.asarray(render(build(True), cam, spp=64,
                                 integrator="volpath", max_depth=2,
                                 seed=7)).mean()
        # vertical shadow ray crosses 0.5 of medium; rays are near-vertical
        np.testing.assert_allclose(slab / base, np.exp(-0.5), atol=0.06)

    def test_parser_medium_directives(self):
        """MakeNamedMedium + MediumInterface wire through the frontend."""
        from pbrt_tpu.frontend.parser import PbrtParser
        txt = '''
        Camera "perspective" "float fov" [40]
        WorldBegin
        MakeNamedMedium "fog" "string type" "homogeneous"
            "rgb sigma_a" [0.5 0.5 0.5] "rgb sigma_s" [0 0 0]
        AttributeBegin
            MediumInterface "fog" ""
            Material "none"
            Shape "sphere" "float radius" [1]
        AttributeEnd
        WorldEnd
        '''
        ps = PbrtParser().parse(txt)
        scene = ps.builder.build()
        assert len(scene.media) == 1
        assert int(scene.prim_med_in[0]) == 0
        assert int(scene.prim_med_out[0]) == -1
