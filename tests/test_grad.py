"""Differentiable rendering: gradients vs finite differences
(BASELINE.json config 4: recover emitter radiance + albedo + portal
geometry from pixel-loss gradients)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.integrators.render import RenderConfig, render_pass
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import film as film_mod
from pbrt_tpu.scene.types import SceneBuilder


def simple_scene(kd=0.5, Le=10.0):
    b = SceneBuilder(RGB)
    m = b.add_material(type=0, kd=kd)
    b.add_mesh([(-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    li = b.add_light(type="area", L=Le, prim=-1)
    pid = b.add_aaplane((-1, 4, -1), (1, 4, 1), axis=1, facing_fw=False,
                        mat=m, light=li)
    b.light_rows[li]["prim"] = b.prim_index("pln", pid)
    return b.build()


def render_small(scene, spp=16, seed=0):
    cam = cam_mod.make_perspective(
        transform.look_at((0, 2, -4), (0, 0.5, 0), (0, 1, 0)), 30.0,
        (8, 8))
    filt = film_mod.make_filter("box")
    cfg = RenderConfig(integrator="path", max_depth=3, seed=seed)
    return render_pass(scene, cam, filt, cfg, 8, 8, spp,
                       jnp.uint32(0)) / spp


class TestGradients:
    def test_emit_grad_matches_finite_difference(self):
        scene = simple_scene()

        def mean_img(emit):
            s = dc.replace(scene, lights=dc.replace(scene.lights,
                                                    emit=emit))
            return jnp.mean(render_small(s, spp=32))

        e0 = scene.lights.emit
        g = jax.grad(mean_img)(e0)
        # emission is linear in Le with identical sample sequences → FD
        # matches to float precision
        eps = 0.5
        de = jnp.zeros_like(e0).at[0, 0].set(eps)
        fd = (mean_img(e0 + de) - mean_img(e0 - de)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=2e-2)

    def test_kd_grad_matches_finite_difference(self):
        scene = simple_scene()

        def mean_img(kd):
            s = dc.replace(scene,
                           materials=dc.replace(scene.materials, kd=kd))
            return jnp.mean(render_small(s, spp=32))

        k0 = scene.materials.kd
        g = jax.grad(mean_img)(k0)
        eps = 0.02
        dk = jnp.zeros_like(k0).at[0, 1].set(eps)
        fd = (mean_img(k0 + dk) - mean_img(k0 - dk)) / (2 * eps)
        assert float(g[0, 1]) > 0
        np.testing.assert_allclose(float(g[0, 1]), float(fd), rtol=0.05)

    def test_gradient_descent_recovers_albedo(self):
        """Inverse rendering: recover kd from a target image."""
        target_scene = simple_scene(kd=0.7)
        target = render_small(target_scene, spp=64, seed=1)
        scene = simple_scene(kd=0.3)

        @jax.jit
        def step(kd):
            def loss_fn(kd):
                s = dc.replace(
                    scene, materials=dc.replace(scene.materials, kd=kd))
                img = render_small(s, spp=16, seed=1)
                return jnp.mean((img - target) ** 2)
            l, g = jax.value_and_grad(loss_fn)(kd)
            return l, g

        kd = scene.materials.kd
        for i in range(60):
            l, g = step(kd)
            kd = kd - 8.0 * g
        recovered = float(kd[0].mean())
        assert abs(recovered - 0.7) < 0.08, recovered

    def test_portal_geometry_grad(self):
        """Gradients flow to portal extents (projection-strategy pdf is a
        smooth function of the portal rect)."""
        b = SceneBuilder(RGB)
        m = b.add_material(type=0, kd=0.6)
        b.add_mesh([(-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)],
                   [(0, 1, 2), (0, 2, 3)], mat=m)
        li = b.add_light(type="area", L=10.0, prim=-1,
                         strategy="projection",
                         portals=[((-0.5, 0.5, 2.0), (0.5, 1.5, 2.0), 2,
                                   False)])
        pid = b.add_aaplane((-1, 0.2, 3), (1, 2.2, 3), axis=2,
                            facing_fw=False, mat=m, light=li)
        b.light_rows[li]["prim"] = b.prim_index("pln", pid)
        scene = b.build()

        def mean_img(plo):
            s = dc.replace(scene, lights=dc.replace(scene.lights,
                                                    portal_lo=plo))
            return jnp.mean(render_small(s, spp=16))

        g = jax.grad(mean_img)(scene.lights.portal_lo)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
