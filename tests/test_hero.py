"""HWSS spectral pipeline tests (hero_path / hero_path_mis) — validation
the fork lacked: spectral furnace, hero↔scalar agreement, dispersion."""

import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import rng, spectrum, transform
from pbrt_tpu.core.spectrum import SAMPLED, RGB
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import materials as mat_mod
from pbrt_tpu.scene.types import SceneBuilder


def look_cam(eye, at, res=(8, 8), fov=30.0):
    return cam_mod.make_perspective(
        transform.look_at(eye, at, (0, 1, 0)), fov, res)


def spectral_furnace_scene():
    b = SceneBuilder(SAMPLED)
    m = b.add_material(type=0, kd=0.5)
    b.add_sphere((0, 0, 3), 1.0, mat=m)
    b.add_light(type="infinite", L=1.0,
                env_map=np.ones((1, 1, 3), np.float32))
    return b.build()


class TestHeroWavelengths:
    def test_wavelength_sampling_rotation(self):
        from pbrt_tpu.integrators.hero import sample_hero_wavelengths
        from pbrt_tpu.samplers import make_sampler
        scene = spectral_furnace_scene()
        pid = jnp.arange(1000, dtype=jnp.uint32)
        sfn = make_sampler("independent")
        wvls, idx, pmf = sample_hero_wavelengths(scene, pid, 0, sfn, 0)
        w = np.asarray(wvls)
        assert w.shape == (1000, 4)
        assert (w >= 400).all() and (w <= 700).all()
        # rotation: the 4 wavelengths are distinct almost surely
        assert (np.abs(np.diff(np.sort(w, axis=1), axis=1)) > 1e-3).all()
        assert np.asarray(pmf).min() > 0

    def test_spectral_furnace_hero_mis(self):
        """rho=0.5 furnace in spectral mode; no dispersive materials so the
        HWSS machinery must reduce to plain spectral PT (= 0.5 env)."""
        scene = spectral_furnace_scene()
        cam = look_cam((0, 0, 0), (0, 0, 3), fov=20.0)
        img = render(scene, cam, spp=128, integrator="hero_path_mis",
                     max_depth=2)
        rgb = np.asarray(spectrum.spectrum_to_rgb(img))
        # env is flat 1.0 spectrum → reflected = 0.5 flat → rgb of flat
        flat_rgb = np.asarray(spectrum.spectrum_to_rgb(
            0.5 * spectrum.rgb_to_spectrum(jnp.ones(3))))
        np.testing.assert_allclose(rgb.mean((0, 1)), flat_rgb, atol=0.03)

    def test_spectral_furnace_hero_path(self):
        scene = spectral_furnace_scene()
        cam = look_cam((0, 0, 0), (0, 0, 3), fov=20.0)
        img = render(scene, cam, spp=256, integrator="hero_path",
                     max_depth=2)
        lum = np.asarray(spectrum.luminance(img, SAMPLED))
        # luminance of 0.5*flat spectrum
        exp = float(spectrum.luminance(
            0.5 * spectrum.rgb_to_spectrum(jnp.ones(3)), SAMPLED))
        np.testing.assert_allclose(lum.mean(), exp, rtol=0.05)

    def test_dispersion_splits_wavelengths(self):
        """A dispersive glass slab refracts different wavelengths to
        different film positions → chromatic spread in the image
        (cornell_dielectric's effect; Cauchy eta(λ),
        dispersive_glass.cpp:62-64)."""
        b = SceneBuilder(SAMPLED)
        glass = b.add_material(type=mat_mod.DISPERSIVE_GLASS,
                               cauchy_b=1.3, cauchy_c=0.08, eta=1.56,
                               kr=1.0, kt=1.0)
        white = b.add_material(type=0, kd=1.0)
        # wedge prism: two triangles forming a thin tilted slab
        b.add_mesh([(-2, -2, 2.0), (2, -2, 2.0), (2, 2, 2.3), (-2, 2, 2.3)],
                   [(0, 1, 2), (0, 2, 3)], mat=glass)
        # white back wall behind the prism, lit by an emitter panel hanging
        # above the space between prism and wall
        b.add_mesh([(-5, -5, 6), (5, -5, 6), (5, 5, 6), (-5, 5, 6)],
                   [(0, 1, 2), (0, 2, 3)], mat=white)
        li = b.add_light(type="area", L=50.0, prim=-1)
        pid = b.add_aaplane((-3, 4.0, 3.5), (3, 4.0, 5.5), axis=1,
                            facing_fw=False, mat=white, light=li)
        b.light_rows[li]["prim"] = b.prim_index("pln", pid)
        scene = b.build()
        cam = look_cam((0, 0, 0), (0, 0, 3), res=(16, 16), fov=50.0)
        img = np.asarray(render(scene, cam, spp=128,
                                integrator="hero_path", max_depth=4,
                                seed=5))
        # energy must arrive and land in multiple distinct spectral bins
        assert img.sum() > 0
        occupied = (img.sum((0, 1)) > img.sum() * 1e-4).sum()
        assert occupied > 10  # not collapsed to a single bin

    def test_hero_mis_matches_path_rgb_scene(self):
        """On a dispersive-free scene, hero_path_mis in SAMPLED mode must
        agree with the scalar path integrator in RGB mode."""
        def build(cfg):
            b = SceneBuilder(cfg)
            m = b.add_material(type=0, kd=(0.6, 0.4, 0.2))
            b.add_mesh([(-10, 0, -10), (10, 0, -10), (10, 0, 10),
                        (-10, 0, 10)], [(0, 1, 2), (0, 2, 3)], mat=m)
            li = b.add_light(type="area", L=15.0, prim=-1)
            pid = b.add_aaplane((-1, 4, -1), (1, 4, 1), axis=1,
                                facing_fw=False, mat=m, light=li)
            b.light_rows[li]["prim"] = b.prim_index("pln", pid)
            return b.build()

        cam = look_cam((0, 2, -4), (0, 0.5, 0), res=(8, 8), fov=30.0)
        img_rgb = np.asarray(render(build(RGB), cam, spp=256,
                                    integrator="path", max_depth=3,
                                    seed=3))
        img_spec = render(build(SAMPLED), cam, spp=256,
                          integrator="hero_path_mis", max_depth=3, seed=3)
        img_s_rgb = np.asarray(spectrum.spectrum_to_rgb(img_spec))
        np.testing.assert_allclose(img_s_rgb.mean((0, 1)),
                                   img_rgb.mean((0, 1)), rtol=0.1,
                                   atol=0.01)
