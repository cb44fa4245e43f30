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


class TestBdptLightTypes:
    """r4: BDPT light-type coverage — point/spot/distant-lit scenes were
    BLACK through BDPT (light subpaths sampled area emitters only and no
    escape handling existed). Each type must now agree with `path` on the
    same scene. Caught along the way: the spot cone falloff was baked
    into the light vertex's beta AND applied per-connection (0.66x), and
    far-disk distant subpaths double-counted the delta-NEE families
    (+4%)."""

    def _scene(self, **light_kw):
        from pbrt_tpu.core.spectrum import RGB
        from pbrt_tpu.scene.types import SceneBuilder
        b = SceneBuilder(RGB)
        m = b.add_material(type=0, kd=0.6)
        b.add_mesh([(-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_mesh([(-2, 0, 2), (2, 0, 2), (2, 3, 2), (-2, 3, 2)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_light(**light_kw)
        return b.build()

    def _cam(self):
        from pbrt_tpu.core import transform
        from pbrt_tpu.scene import camera as cam_mod
        return cam_mod.make_perspective(
            transform.look_at((0, 1.5, -3), (0, 0.5, 0), (0, 1, 0)),
            45.0, (12, 12))

    @pytest.mark.parametrize("light_kw", [
        dict(type="point", I=10.0, pos=(0, 2, 0)),
        dict(type="spot", I=30.0, pos=(0, 2.5, -0.5), to=(0, 0, 0),
             cone_angle=35.0),
        dict(type="distant", L=2.0, dir=(0.3, -1, 0.3)),
    ], ids=["point", "spot", "distant"])
    def test_bdpt_matches_path(self, light_kw):
        from pbrt_tpu.integrators.render import render
        scene = self._scene(**light_kw)
        cam = self._cam()
        ip = np.asarray(render(scene, cam, spp=160, integrator="path",
                               max_depth=4, seed=1)).mean()
        ib = np.asarray(render(scene, cam, spp=160, integrator="bdpt",
                               max_depth=4, seed=2)).mean()
        assert ip > 1e-3
        assert abs(ib - ip) / ip < 0.05, (light_kw["type"], ip, ib)


class TestSppmLightTypes:
    """r4: SPPM photon emission for every light type (sppm.cpp shoots
    Sample_Le for all lights; area-only emission silently dropped all
    indirect light in point/spot/distant/env-lit scenes). Measured
    ratios vs path at this budget: point 0.984, spot 0.938 (cone-edge
    kernel-estimation bias; 0.968 at 3x budget), distant 0.982,
    infinite 1.026."""

    @pytest.mark.parametrize("light_kw,tol", [
        (dict(type="point", I=10.0, pos=(0, 2, 0)), 0.06),
        (dict(type="spot", I=30.0, pos=(0, 2.5, -0.5), to=(0, 0, 0),
              cone_angle=35.0), 0.12),
        (dict(type="distant", L=2.0, dir=(0.3, -1, 0.3)), 0.06),
        (dict(type="infinite", L=0.7, env_map="ones"), 0.08),
    ], ids=["point", "spot", "distant", "infinite"])
    def test_sppm_matches_path(self, light_kw, tol):
        from pbrt_tpu.core import transform
        from pbrt_tpu.core.spectrum import RGB
        from pbrt_tpu.integrators.render import render
        from pbrt_tpu.integrators.sppm import render_sppm
        from pbrt_tpu.scene import camera as cam_mod
        from pbrt_tpu.scene.types import SceneBuilder
        if light_kw.get("env_map") == "ones":
            light_kw = dict(light_kw, env_map=np.ones((1, 1, 3),
                                                      np.float32))
        b = SceneBuilder(RGB)
        m = b.add_material(type=0, kd=0.6)
        b.add_mesh([(-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_mesh([(-2, 0, 2), (2, 0, 2), (2, 3, 2), (-2, 3, 2)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_light(**light_kw)
        scene = b.build()
        cam = cam_mod.make_perspective(
            transform.look_at((0, 1.5, -3), (0, 0.5, 0), (0, 1, 0)),
            45.0, (12, 12))
        ip = np.asarray(render(scene, cam, spp=128, integrator="path",
                               max_depth=4, seed=1)).mean()
        isp = np.asarray(render_sppm(scene, cam, n_iterations=8,
                                     photons_per_iter=1 << 14,
                                     max_depth=4, seed=1)).mean()
        assert ip > 1e-3
        assert abs(isp - ip) / ip < tol, (light_kw["type"], ip, isp)


class TestGonioProjectionEmission:
    """r4: goniometric/projection lights emit in BDPT subpaths and SPPM
    photons (uniform-sphere Sample_Le with lights.emission_scale
    modulation). Measured ratios vs path: gonio 1.000/1.007, projection
    0.99/0.92 (sppm: window-edge kernel-estimation bias, same class as
    the spot cone edge)."""

    def _run(self, light_kw):
        from pbrt_tpu.core import transform
        from pbrt_tpu.core.spectrum import RGB
        from pbrt_tpu.integrators.render import render
        from pbrt_tpu.integrators.sppm import render_sppm
        from pbrt_tpu.scene import camera as cam_mod
        from pbrt_tpu.scene.types import SceneBuilder
        b = SceneBuilder(RGB)
        m = b.add_material(type=0, kd=0.6)
        b.add_mesh([(-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_mesh([(-2, 0, 2), (2, 0, 2), (2, 3, 2), (-2, 3, 2)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        b.add_light(**light_kw)
        scene = b.build()
        cam = cam_mod.make_perspective(
            transform.look_at((0, 1.5, -3), (0, 0.5, 0), (0, 1, 0)),
            45.0, (10, 10))
        ip = np.asarray(render(scene, cam, spp=128, integrator="path",
                               max_depth=4, seed=1)).mean()
        ib = np.asarray(render(scene, cam, spp=128, integrator="bdpt",
                               max_depth=4, seed=2)).mean()
        isp = np.asarray(render_sppm(scene, cam, n_iterations=6,
                                     photons_per_iter=1 << 14,
                                     max_depth=4, seed=1)).mean()
        return ip, ib, isp

    def test_goniometric(self):
        gm = np.zeros((8, 16, 3), np.float32)
        gm[:4] = 1.5
        gm[4:] = 0.2
        ip, ib, isp = self._run(dict(type="goniometric", I=10.0,
                                     pos=(0, 2, 0), gonio_map=gm))
        assert ip > 1e-3
        assert abs(ib - ip) / ip < 0.06
        assert abs(isp - ip) / ip < 0.10

    def test_projection(self):
        ip, ib, isp = self._run(dict(
            type="projection", I=40.0, pos=(0, 2.5, -0.5), to=(0, 0, 0),
            fov=40.0, gonio_map=np.ones((4, 4, 3), np.float32)))
        assert ip > 1e-3
        assert abs(ib - ip) / ip < 0.06
        assert abs(isp - ip) / ip < 0.15


def test_bdpt_directly_visible_environment():
    """Camera rays escaping straight to the environment must carry MIS
    weight 1 (no env-NEE strategy exists at the camera vertex — r4 fix:
    the phantom NEE pdf down-weighted visible-background pixels)."""
    from pbrt_tpu.core import transform
    from pbrt_tpu.core.spectrum import RGB
    from pbrt_tpu.integrators.render import render
    from pbrt_tpu.scene import camera as cam_mod
    from pbrt_tpu.scene.types import SceneBuilder
    b = SceneBuilder(RGB)
    m = b.add_material(type=0, kd=0.5)
    b.add_sphere((0, 0, 3), 0.6, mat=m)
    b.add_light(type="infinite", L=1.0,
                env_map=np.ones((1, 1, 3), np.float32))
    scene = b.build()
    cam = cam_mod.make_perspective(
        transform.look_at((0, 0, 0), (0, 0, 3), (0, 1, 0)), 45.0,
        (12, 12))
    ip = np.asarray(render(scene, cam, spp=96, integrator="path",
                           max_depth=3, seed=1)).mean()
    ib = np.asarray(render(scene, cam, spp=96, integrator="bdpt",
                           max_depth=3, seed=2)).mean()
    assert abs(ib - ip) / ip < 0.03


def test_bdpt_env_light_subpaths_contribute_and_match_path():
    """r5 (VERDICT r4 #4): light subpaths START from infinite lights
    (bdpt.cpp:95-141 with the :123-133 density corrections). On a scene
    where the env reaches the camera-visible surface mostly indirectly
    (a roofed cavity open on one side), the s>=2 connection family must
    (a) actually fire — env-origin walks land surface vertices — and
    (b) keep the estimator unbiased: full render_bdpt (camera strategies
    + env subpath connections + t=1 splats) agrees with the verified
    path tracer."""
    from pbrt_tpu.core import transform
    from pbrt_tpu.core.spectrum import RGB
    from pbrt_tpu.integrators.bdpt import (VT_SURFACE, render_bdpt,
                                           generate_light_subpath)
    from pbrt_tpu.integrators.render import render
    from pbrt_tpu.samplers import make_sampler
    from pbrt_tpu.scene import camera as cam_mod
    from pbrt_tpu.scene import lights as lights_mod
    from pbrt_tpu.scene.types import SceneBuilder

    b = SceneBuilder(RGB)
    m = b.add_material(type=0, kd=0.7)
    # floor + roof: the floor under the roof sees the env only via
    # bounces off the surrounding geometry
    b.add_mesh([(-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)],
               [(0, 2, 1), (0, 3, 2)], mat=m)
    b.add_mesh([(-3, 1.2, -1), (3, 1.2, -1), (3, 1.2, 3), (-3, 1.2, 3)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    b.add_mesh([(-3, 0, 3), (3, 0, 3), (3, 1.2, 3), (-3, 1.2, 3)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    env = np.ones((1, 1, 3), np.float32)
    b.add_light(type="infinite", L=1.5, env_map=env)
    scene = b.build()
    cam = cam_mod.make_perspective(
        transform.look_at((0, 0.7, -2.6), (0, 0.3, 1.0), (0, 1, 0)),
        40.0, (12, 12))

    # (a) env-origin light subpaths produce real surface vertices with
    # the corrected densities (pdf_fwd[0] solid-angle > 0,
    # pdf_fwd[1] = pdfPos*cos in area measure > 0)
    R = 4096
    pid = jnp.arange(R, dtype=jnp.uint32)
    sidx = jnp.zeros(R, jnp.uint32)
    sp = generate_light_subpath(scene, 5, pid, sidx,
                                make_sampler("independent"), 0)
    g0 = np.asarray(sp.light_id[:, 0])
    v1_surf = np.asarray(sp.vtype[:, 1]) == VT_SURFACE
    env_rows = g0 >= 0
    assert (env_rows & v1_surf).sum() > R // 10
    sel = env_rows & v1_surf
    assert (np.asarray(sp.pdf_fwd[:, 0])[sel] > 0).all()
    assert (np.asarray(sp.pdf_fwd[:, 1])[sel] > 0).all()
    assert (np.asarray(sp.beta[:, 1])[sel] > 0).any()

    # (b) agreement with the path tracer. NOTE the depth-cap context
    # (established against the reference binary this round): on this
    # cavity at maxdepth 4, pbrt's own bdpt sits at 0.889 of pbrt's own
    # path (vertex-cap conventions differ between the algorithms; deep
    # families are truncated). Ours reaches one vertex deeper than
    # pbrt's bdpt (env NEE at t=max_v) and measures ~0.96 of path —
    # strictly closer than the reference's own bdpt-vs-path gap.
    ip = np.asarray(render(scene, cam, spp=128, integrator="path",
                           max_depth=4, seed=1)).mean()
    ib = np.asarray(render_bdpt(scene, cam, spp=128, max_depth=4,
                                seed=2)).mean()
    assert ip > 1e-3
    assert abs(ib - ip) / ip < 0.06, (ip, ib)
    # and at a depth where the cap does NOT bind (maxdepth 2 ⇒ every
    # family is within max_v), the agreement must be tight
    ip2 = np.asarray(render(scene, cam, spp=160, integrator="path",
                            max_depth=2, seed=1)).mean()
    ib2 = np.asarray(render_bdpt(scene, cam, spp=160, max_depth=2,
                                 seed=2)).mean()
    assert abs(ib2 - ip2) / ip2 < 0.04, (ip2, ib2)
