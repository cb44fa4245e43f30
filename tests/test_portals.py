"""Portal tests — the validation the reference never had (SURVEY.md §4:
"The fork added no tests for portals ... the new framework should close
that gap": pdf↔MC consistency, strategy agreement, frustum semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import rng, transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import lights as lights_mod
from pbrt_tpu.scene import portals, shapes
from pbrt_tpu.scene.types import SceneBuilder


def portal_box_scene(strategy="projection", two_portals=False):
    """Room with an aaplane light behind a portal opening — miniature of
    scenes/blender/lamp/out/lamp.pbrt:72-79."""
    b = SceneBuilder(RGB)
    white = b.add_material(type=0, kd=0.7)
    black = b.add_material(type=0, kd=0.0)
    # floor y=0
    b.add_mesh([(-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)],
               [(0, 1, 2), (0, 2, 3)], mat=white)
    # light: aaplane at z=3 facing -z (toward origin)
    li = b.add_light(type="area", L=10.0, prim=-1, strategy=strategy,
                     portals=([((-0.5, 0.5, 2.0), (0.5, 1.5, 2.0), 2, False)]
                              + ([((-2.0, 0.2, 1.0), (-1.0, 1.2, 1.0), 2,
                                   False)] if two_portals else [])))
    pid = b.add_aaplane((-1, 0.2, 3), (1, 2.2, 3), axis=2, facing_fw=False,
                        mat=black, light=li)
    b.light_rows[li]["prim"] = b.prim_index("pln", pid)
    # occluder wall at z=2 with a hole where the portal is
    # (four quads around the [-0.5,0.5]x[0.5,1.5] opening)
    wall = [((-4, -4, 2), (-0.5, 4, 2)),   # left slab
            ((0.5, -4, 2), (4, 4, 2)),     # right slab
            ((-0.5, -4, 2), (0.5, 0.5, 2)),  # below
            ((-0.5, 1.5, 2), (0.5, 4, 2))]   # above
    for lo, hi in wall:
        b.add_aaplane(lo, hi, axis=2, facing_fw=False, mat=white)
    return b


def render_portal_scene(strategy, spp=256, seed=0):
    b = portal_box_scene(strategy)
    scene = b.build()
    cam = cam_mod.make_perspective(
        transform.look_at((0, 3.0, -2.5), (0, 0.5, 0), (0, 1, 0)), 40.0,
        (12, 12))
    return np.asarray(render(scene, cam, spp=spp, integrator="direct",
                             seed=seed))


class TestPortalGeometry:
    def test_in_front(self):
        lo = jnp.array([[-1.0, -1.0, 2.0]])
        p_front = jnp.array([[0.0, 0.0, 1.0]])
        p_back = jnp.array([[0.0, 0.0, 3.0]])
        ax = jnp.array([2])
        # facing_fw=True → in front means p[ax] > lo[ax]
        assert not bool(shapes.aaplane_in_front(
            p_front, lo, ax, jnp.array([True]))[0])
        assert bool(shapes.aaplane_in_front(
            p_back, lo, ax, jnp.array([True]))[0])
        # facing_fw=False → p[ax] < lo[ax]
        assert bool(shapes.aaplane_in_front(
            p_front, lo, ax, jnp.array([False]))[0])

    def test_select_visible_portal_uniform(self):
        in_front = jnp.array([[True, False, True, False]] * 10000)
        u = rng.uniform(jnp.arange(10000, dtype=jnp.uint32), 0, 0)
        idx, pdf, behind = portals.select_visible_portal(in_front, u)
        idx = np.asarray(idx)
        assert set(np.unique(idx)) == {0, 2}
        assert abs((idx == 0).mean() - 0.5) < 0.02
        np.testing.assert_allclose(np.asarray(pdf), 0.5)
        assert not np.asarray(behind).any()

    def test_select_behind_all(self):
        in_front = jnp.zeros((4, 4), bool)
        _, pdf, behind = portals.select_visible_portal(
            in_front, jnp.full(4, 0.3))
        assert np.asarray(behind).all()
        np.testing.assert_allclose(np.asarray(pdf), 0.0)


class TestPortalPdf:
    """Monte Carlo ↔ pdf consistency: E[g(wi)/pdf(wi)] over portal samples
    must equal the solid-angle integral of g over the portal."""

    def _glight(self, lo, hi, n=1):
        """Fabricate gathered light rows with one portal."""
        class G:
            portal_lo = jnp.tile(jnp.asarray([lo], jnp.float32)[None],
                                 (n, 1, 1))
            portal_hi = jnp.tile(jnp.asarray([hi], jnp.float32)[None],
                                 (n, 1, 1))
            portal_ax = jnp.full((n, 1), 2, jnp.int32)
            portal_facing = jnp.zeros((n, 1), bool)
            n_portals = jnp.ones(n, jnp.int32)
        return G()

    def test_sample_portal_pdf_consistency(self):
        N = 100000
        g = self._glight((-0.5, 0.5, 2.0), (0.5, 1.5, 2.0), N)
        ref_p = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (N, 1))
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
        pidx = jnp.zeros(N, jnp.int32)
        wi, pdf, _ = portals.sample_portal(g, pidx, ref_p, u)
        # MC estimate of portal solid angle: E[1/pdf]
        est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-12)))
        # analytic solid angle of the 1x1 rect at distance 2, grazing-ish:
        # validate instead against dense quadrature
        import numpy as _np
        xs = _np.linspace(-0.5 + 1e-4, 0.5 - 1e-4, 200)
        ys = _np.linspace(0.5 + 1e-4, 1.5 - 1e-4, 200)
        X, Y = _np.meshgrid(xs, ys)
        P = _np.stack([X, Y, _np.full_like(X, 2.0)], -1)
        d = P - _np.array([0.0, 1.0, 0.0])
        r = _np.linalg.norm(d, axis=-1)
        cos = _np.abs(d[..., 2]) / r
        omega = (cos / r ** 2).mean() * 1.0  # area = 1
        assert abs(est - omega) / omega < 0.01

    def test_pdf_portal_matches_sample(self):
        """pdf_portal(wi) equals the pdf reported by sample_portal."""
        N = 1000
        g = self._glight((-0.5, 0.5, 2.0), (0.5, 1.5, 2.0), N)
        ref_p = jnp.tile(jnp.asarray([[0.3, 0.8, -0.5]]), (N, 1))
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
        pidx = jnp.zeros(N, jnp.int32)
        wi, pdf_s, _ = portals.sample_portal(g, pidx, ref_p, u)
        pdf_e = portals.pdf_portal(g, pidx, ref_p, wi)
        np.testing.assert_allclose(np.asarray(pdf_e), np.asarray(pdf_s),
                                   rtol=1e-3)

    def test_projection_pdf_consistency(self):
        """sample_projection's reported pdf matches pdf_projection and the
        sampled direction always reaches the light rect through the clip."""
        N = 10000
        g = self._glight((-2.0, -1.0, 2.0), (2.0, 3.0, 2.0), N)
        light_lo = jnp.tile(jnp.asarray([[-1.0, 0.0, 3.0]]), (N, 1))
        light_hi = jnp.tile(jnp.asarray([[1.0, 2.0, 3.0]]), (N, 1))
        light_ax = jnp.full(N, 2, jnp.int32)
        ref_p = jnp.tile(jnp.asarray([[0.2, 1.0, 0.0]]), (N, 1))
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
        pidx = jnp.zeros(N, jnp.int32)
        wi, pdf_s, _ = portals.sample_projection(
            g, pidx, light_lo, light_hi, light_ax, ref_p, u)
        pdf_e = portals.pdf_projection(g, pidx, light_lo, light_hi,
                                       light_ax, ref_p, wi)
        ok = np.asarray(pdf_s) > 0
        assert ok.all()
        np.testing.assert_allclose(np.asarray(pdf_e)[ok],
                                   np.asarray(pdf_s)[ok], rtol=1e-3)


class TestPortalRendering:
    def test_strategies_agree(self):
        """light / portal / projection strategies estimate the same direct
        illumination (single visible portal ⇒ no reference selection-pdf
        quirk): the thesis's core unbiasedness property."""
        imgs = {s: render_portal_scene(s, spp=384, seed=2)
                for s in ("light", "portal", "projection")}
        m_light = imgs["light"].mean()
        assert m_light > 1e-3  # scene actually lit
        for s in ("portal", "projection"):
            rel = abs(imgs[s].mean() - m_light) / m_light
            assert rel < 0.08, (s, imgs[s].mean(), m_light)

    def test_projection_lower_variance(self):
        """Projection sampling should cut variance vs plain light sampling
        for a small portal (the thesis's headline claim)."""
        reps = 6
        var = {}
        for s in ("light", "projection"):
            means = [render_portal_scene(s, spp=32, seed=7 + r).mean()
                     for r in range(reps)]
            var[s] = np.var(means)
        assert var["projection"] < var["light"] * 1.5
