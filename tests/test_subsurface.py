"""Subsurface scattering (separable BSSRDF with normalized diffusion):
energy behavior + probe relocation sanity."""

import numpy as np

from pbrt_tpu.core import transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import materials as mat_mod
from pbrt_tpu.scene.types import SceneBuilder


def slab_scene(sss=True, albedo=0.8, mfp=0.05):
    b = SceneBuilder(RGB)
    if sss:
        m = b.add_material(type=mat_mod.SUBSURFACE,
                           sss_sigma_s=albedo / mfp,
                           sss_sigma_a=(1 - albedo) / mfp, eta=1.33)
    else:
        m = b.add_material(type=mat_mod.MATTE, kd=albedo)
    # thick slab (top at y=0); windings give OUTWARD authored normals
    # (+y top, −y bottom) — the Sw exit lobe (r5) evaluates in the
    # authored exit frame exactly like pbrt's SeparableBSSRDFAdapter, so
    # inward-wound geometry would (correctly, like pbrt) go black
    b.add_mesh([(-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5)],
               [(0, 2, 1), (0, 3, 2)], mat=m)
    b.add_mesh([(-5, -1, -5), (5, -1, -5), (5, -1, 5), (-5, -1, 5)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    b.add_light(type="point", I=20.0, pos=(0, 3, 0))
    scene = b.build()
    assert scene.has_sss == sss
    return scene


def cam():
    return cam_mod.make_perspective(
        transform.look_at((0, 2, -3), (0, 0, 0), (0, 1, 0)), 30.0, (10, 10))


class TestSubsurface:
    def test_renders_nonzero_and_finite(self):
        img = np.asarray(render(slab_scene(), cam(), spp=64,
                                integrator="path", max_depth=4, seed=2))
        assert np.isfinite(img).all()
        assert img.mean() > 1e-3

    def test_energy_bounded_by_matte(self):
        """An sss slab cannot return more light than a lambertian surface
        of the same albedo (interface fresnel + absorption only lose)."""
        i_sss = np.asarray(render(slab_scene(True), cam(), spp=128,
                                  integrator="path", max_depth=4,
                                  seed=3)).mean()
        i_matte = np.asarray(render(slab_scene(False), cam(), spp=128,
                                    integrator="path", max_depth=4,
                                    seed=3)).mean()
        assert i_sss < i_matte * 1.15
        assert i_sss > i_matte * 0.2

    def test_absorption_darkens(self):
        bright = np.asarray(render(slab_scene(True, albedo=0.95), cam(),
                                   spp=96, integrator="path", max_depth=4,
                                   seed=4)).mean()
        dark = np.asarray(render(slab_scene(True, albedo=0.3), cam(),
                                 spp=96, integrator="path", max_depth=4,
                                 seed=4)).mean()
        assert dark < bright * 0.7

    def test_parser_subsurface(self):
        from pbrt_tpu.frontend.parser import parse_pbrt_string
        scene, _, _ = parse_pbrt_string("""
            WorldBegin
            Material "subsurface" "float scale" [2.0]
            Shape "sphere" "float radius" [1]
            WorldEnd
        """)
        assert scene.has_sss
        mt = np.asarray(scene.materials.mtype)
        assert (mt == mat_mod.SUBSURFACE).any()


class TestSubsurfaceVolpath:
    def test_volpath_agrees_with_path(self):
        """pbrt's volpath runs the same bssrdf block as path
        (volpath.cpp:151-163); in a medium-free scene the two integrators
        estimate the same quantity, so the sss slab must agree to MC
        noise."""
        s = slab_scene(True)
        i_path = np.asarray(render(s, cam(), spp=192, integrator="path",
                                   max_depth=4, seed=6)).mean()
        i_vol = np.asarray(render(s, cam(), spp=192, integrator="volpath",
                                  max_depth=4, seed=6)).mean()
        assert abs(i_vol - i_path) < 0.12 * max(i_path, 1e-6)

    def test_volpath_disney_sss_agrees_with_path(self):
        from tests.test_disney_sss import _slab_scene, _cam
        s = _slab_scene((0.2, 0.2, 0.2))
        i_path = np.asarray(render(s, _cam(), spp=192, integrator="path",
                                   max_depth=4, seed=6)).mean()
        i_vol = np.asarray(render(s, _cam(), spp=192,
                                  integrator="volpath",
                                  max_depth=4, seed=6)).mean()
        assert i_vol > 0.3 * i_path  # volpath previously dropped sss
        assert abs(i_vol - i_path) < 0.15 * max(i_path, 1e-6)
