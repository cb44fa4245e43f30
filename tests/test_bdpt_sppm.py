"""BDPT & SPPM consistency tests: both must agree with the (verified)
unidirectional path tracer on diffuse scenes
(tests/analytic_scenes.cpp runs Path vs BDPT vs MLT on matched scenes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.integrators import render
from pbrt_tpu.integrators.sppm import render_sppm
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene.types import SceneBuilder


def box_scene():
    """Small closed box with an area light: indirect-heavy."""
    b = SceneBuilder(RGB)
    white = b.add_material(type=0, kd=0.65)
    quads = [
        [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],       # floor
        [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],       # ceiling
        [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],       # back
        [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],       # left
        [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],       # right
    ]
    for v in quads:
        b.add_mesh(v, [(0, 1, 2), (0, 2, 3)], mat=white)
    li = b.add_light(type="area", L=12.0, prim=-1)
    pid = b.add_aaplane((0.35, 0.98, 0.35), (0.65, 0.98, 0.65), axis=1,
                        facing_fw=False, mat=white, light=li)
    b.light_rows[li]["prim"] = b.prim_index("pln", pid)
    return b.build()


def box_cam(res=(12, 12)):
    return cam_mod.make_perspective(
        transform.look_at((0.5, 0.5, -1.2), (0.5, 0.5, 1.0), (0, 1, 0)),
        45.0, res)


class TestBDPT:
    def test_bdpt_matches_path(self):
        scene = box_scene()
        cam = box_cam()
        ref = np.asarray(render(scene, cam, spp=256, integrator="path",
                                max_depth=3, seed=1))
        img = np.asarray(render(scene, cam, spp=256, integrator="bdpt",
                                max_depth=3, seed=1))
        assert np.isfinite(img).all()
        assert img.mean() > 0
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.12, (img.mean(), ref.mean())

    def test_bdpt_direct_light_visible(self):
        """Camera directly seeing the emitter (s=0, t=2 strategy)."""
        b = SceneBuilder(RGB)
        m = b.add_material(type=0, kd=0.0)
        li = b.add_light(type="area", L=(3.0, 2.0, 1.0), prim=0)
        b.add_aaplane((-1, -1, 2), (1, 1, 2), axis=2, facing_fw=False,
                      mat=m, light=li)
        scene = b.build()
        cam = cam_mod.make_perspective(
            transform.look_at((0, 0, 0), (0, 0, 2), (0, 1, 0)), 10.0,
            (6, 6))
        img = np.asarray(render(scene, cam, spp=32, integrator="bdpt",
                                max_depth=3))
        np.testing.assert_allclose(img.mean((0, 1)), [3.0, 2.0, 1.0],
                                   atol=0.15)


class TestSPPM:
    def test_sppm_matches_path(self):
        scene = box_scene()
        cam = box_cam(res=(10, 10))
        ref = np.asarray(render(scene, cam, spp=384, integrator="path",
                                max_depth=3, seed=2))
        img = np.asarray(render_sppm(scene, cam, n_iterations=6,
                                     photons_per_iter=8192, max_depth=3,
                                     seed=2))
        assert np.isfinite(img).all()
        assert img.mean() > 0
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.2, (img.mean(), ref.mean())


class TestBDPTLightTracing:
    def test_full_bdpt_with_splats_matches_path(self):
        """render_bdpt (camera strategies + t=1 splats with consistent MIS
        weights) still agrees with the path tracer."""
        from pbrt_tpu.integrators.bdpt import render_bdpt
        scene = box_scene()
        cam = box_cam(res=(10, 10))
        ref = np.asarray(render(scene, cam, spp=256, integrator="path",
                                max_depth=3, seed=6))
        img = np.asarray(render_bdpt(scene, cam, spp=192, max_depth=3,
                                     seed=6))
        assert np.isfinite(img).all()
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.12, (img.mean(), ref.mean())
