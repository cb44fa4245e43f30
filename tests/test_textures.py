"""Texture evaluation tests (textures/checkerboard.cpp etc.)."""

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.core import transform
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import textures as tex
from pbrt_tpu.scene.types import SceneBuilder


def _tt(rows, images=None):
    return tex.make_texture_table(rows, images or [], 3)


class TestEval:
    def test_constant(self):
        t = _tt([dict(type=tex.CONSTANT, v1=(0.2, 0.4, 0.6))])
        out = tex.eval_texture(t, jnp.zeros(5, jnp.int32),
                               jnp.zeros((5, 2)), jnp.zeros((5, 3)))
        np.testing.assert_allclose(np.asarray(out),
                                   [[0.2, 0.4, 0.6]] * 5, atol=1e-6)

    def test_checkerboard(self):
        t = _tt([dict(type=tex.CHECKERBOARD, v1=1.0, v2=0.0,
                      uscale=1.0, vscale=1.0)])
        uv = jnp.asarray([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [2.5, 0.5]])
        out = np.asarray(tex.eval_texture(
            t, jnp.zeros(4, jnp.int32), uv, jnp.zeros((4, 3))))[:, 0]
        np.testing.assert_allclose(out, [1.0, 0.0, 1.0, 1.0])

    def test_imagemap_bilinear(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = 1.0  # top-left (v=1 row)
        t = _tt([dict(type=tex.IMAGEMAP, img=0, v1=1.0)], [img])
        # uv (0.25, 0.75) → pixel (0,0) center exactly
        out = np.asarray(tex.eval_texture(
            t, jnp.zeros(1, jnp.int32), jnp.asarray([[0.25, 0.75]]),
            jnp.zeros((1, 3))))
        np.testing.assert_allclose(out[0], [1, 1, 1], atol=1e-5)

    def test_mip_pyramid_build(self):
        # 4x4 image → levels 4x4, 2x2, 1x1; top level = overall mean
        img = np.arange(48, dtype=np.float32).reshape(4, 4, 3)
        t = _tt([dict(type=tex.IMAGEMAP, img=0, v1=1.0)], [img])
        assert int(t.n_levels[0]) == 3
        assert np.all(np.asarray(t.mip_wh[0]) == [[4, 4], [2, 2], [1, 1]])
        x1, y1 = np.asarray(t.mip_off[0, 2])
        np.testing.assert_allclose(np.asarray(t.images[0, y1, x1]),
                                   img.reshape(-1, 3).mean(0), rtol=1e-5)

    def test_mip_trilinear_lod(self):
        # checker image: level 0 resolves texels, coarse LOD → mean 0.5
        img = np.zeros((8, 8, 3), np.float32)
        img[::2, 1::2] = 1.0
        img[1::2, ::2] = 1.0
        t = _tt([dict(type=tex.IMAGEMAP, img=0, v1=1.0)], [img])
        uv = jnp.asarray([[0.3, 0.6]])
        tid = jnp.zeros(1, jnp.int32)
        p = jnp.zeros((1, 3))
        fine = np.asarray(tex.eval_texture(
            t, tid, uv, p, width_uv=jnp.asarray([1e-6])))
        base = np.asarray(tex.eval_texture(t, tid, uv, p))
        np.testing.assert_allclose(fine, base, atol=1e-6)
        coarse = np.asarray(tex.eval_texture(
            t, tid, uv, p, width_uv=jnp.asarray([4.0])))
        np.testing.assert_allclose(coarse[0], [0.5, 0.5, 0.5], atol=1e-3)

    def test_noise_bounded_and_smooth(self):
        p = jnp.asarray(np.random.RandomState(0).randn(1000, 3) * 3,
                        jnp.float32)
        n = np.asarray(tex.noise3(p))
        assert np.abs(n).max() <= 2.0
        assert n.std() > 0.05
        # smooth: nearby points have nearby values
        n2 = np.asarray(tex.noise3(p + 1e-3))
        assert np.abs(n - n2).max() < 0.02

    def test_fbm_octaves(self):
        p = jnp.asarray(np.random.RandomState(1).randn(500, 3),
                        jnp.float32)
        f1 = np.asarray(tex.fbm(p, jnp.full(500, 1.0), jnp.full(500, 0.5)))
        f6 = np.asarray(tex.fbm(p, jnp.full(500, 6.0), jnp.full(500, 0.5)))
        assert f6.std() > f1.std() * 0.9  # more octaves add detail


class TestRenderWithTexture:
    def test_checker_floor_renders(self):
        b = SceneBuilder(RGB)
        tid = b.add_texture(type=tex.CHECKERBOARD, v1=(1.0, 1.0, 1.0),
                            v2=(0.0, 0.0, 0.0), uscale=4.0, vscale=4.0)
        m = b.add_material(type=0, kd=0.5, kd_tex=tid)
        b.add_mesh([(-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5)],
                   [(0, 1, 2), (0, 2, 3)], mat=m,
                   uvs=[(0, 0), (1, 0), (1, 1), (0, 1)])
        b.add_light(type="distant", L=3.0, dir=(0, -1, 0))
        scene = b.build()
        cam = cam_mod.make_perspective(
            transform.look_at((0, 4, -4), (0, 0, 0), (0, 1, 0)), 40.0,
            (16, 16))
        img = np.asarray(render(scene, cam, spp=16, integrator="direct"))
        vals = img.mean(-1)
        lit = vals[vals > 1e-4]
        # checker: bimodal brightness — bright tiles >> dark tiles
        assert lit.size > 0
        assert vals.max() > 5 * max(np.median(vals), 1e-4) or \
            (vals > vals.max() * 0.5).mean() < 0.8


class TestNestedOperands:
    def test_scale_of_checkerboard(self):
        """scale(tex1=checker, tex2=const 0.5) — arbitrary texture
        operands (scale.cpp:44-48), r4."""
        t = _tt([dict(type=tex.CHECKERBOARD, v1=1.0, v2=0.0),
                 dict(type=tex.SCALE, op1=0, v2=0.5)])
        uv = jnp.asarray([[0.5, 0.5], [1.5, 0.5]])
        out = np.asarray(tex.eval_texture(
            t, jnp.ones(2, jnp.int32), uv, jnp.zeros((2, 3))))[:, 0]
        np.testing.assert_allclose(out, [0.5, 0.0])

    def test_mix_with_texture_amount(self):
        """mix(v1=0, v2=1, amount=checker): amount follows the checker."""
        t = _tt([dict(type=tex.CHECKERBOARD, v1=1.0, v2=0.0),
                 dict(type=tex.MIX, v1=0.0, v2=1.0, op3=0)])
        uv = jnp.asarray([[0.5, 0.5], [1.5, 0.5]])
        out = np.asarray(tex.eval_texture(
            t, jnp.ones(2, jnp.int32), uv, jnp.zeros((2, 3))))[:, 0]
        np.testing.assert_allclose(out, [1.0, 0.0])

    def test_two_level_nesting(self):
        """scale(mix(checker, ...)) — depth-2 operand tree."""
        t = _tt([dict(type=tex.CHECKERBOARD, v1=1.0, v2=0.0),
                 dict(type=tex.MIX, v1=0.0, v2=1.0, op3=0),
                 dict(type=tex.SCALE, op1=1, v2=2.0)])
        assert t.nest_depth == 2
        uv = jnp.asarray([[0.5, 0.5], [1.5, 0.5]])
        out = np.asarray(tex.eval_texture(
            t, jnp.full(2, 2, jnp.int32), uv, jnp.zeros((2, 3))))[:, 0]
        np.testing.assert_allclose(out, [2.0, 0.0])


class TestCheckerAA:
    def test_closed_form_limits(self):
        """checkerboard.h:75-100 closed form: tiny footprints reproduce
        the point sample; period-scale footprints average to 0.5."""
        t = _tt([dict(type=tex.CHECKERBOARD, v1=1.0, v2=0.0)])
        uv = jnp.asarray([[0.5, 0.5], [1.5, 0.5], [0.5, 0.5]])
        w = jnp.asarray([1e-6, 1e-6, 3.0])
        out = np.asarray(tex.eval_texture(
            t, jnp.zeros(3, jnp.int32), uv, jnp.zeros((3, 3)),
            width_uv=w))[:, 0]
        np.testing.assert_allclose(out[:2], [1.0, 0.0], atol=1e-4)
        np.testing.assert_allclose(out[2], 0.5, atol=1e-4)

    def test_closed_form_edge_blend(self):
        """A footprint straddling a check edge blends proportionally."""
        t = _tt([dict(type=tex.CHECKERBOARD, v1=1.0, v2=0.0)])
        # footprint [0.9, 1.1] × [0.3, 0.5]: quarter of s-range in check 0
        uv = jnp.asarray([[1.0, 0.4]])
        out = np.asarray(tex.eval_texture(
            t, jnp.zeros(1, jnp.int32), uv, jnp.zeros((1, 3)),
            width_uv=jnp.asarray([0.1])))[0, 0]
        assert 0.3 < out < 0.7


def test_marble_matches_reference_formula():
    """Marble (marble.h:59-89): p.y + variation·FBm through the 9-color
    Bezier spline ×1.5, incl. pbrt-v3's min(1, floor(t·NSEG)) clamp —
    spot-check against a direct numpy evaluation of the same formula."""
    t = _tt([dict(type=tex.MARBLE, octaves=8.0, omega=0.5, scale3d=1.0,
                  variation=0.2)])
    pts = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (64, 3))
                      .astype(np.float32))
    out = np.asarray(tex.eval_texture(
        t, jnp.zeros(64, jnp.int32), jnp.zeros((64, 2)), pts))
    # reproduce via the module's own fbm (the spline is what's under test)
    f = np.asarray(tex.fbm(pts, jnp.full(64, 8.0), jnp.full(64, 0.5)))
    mt = 0.5 + 0.5 * np.sin(np.asarray(pts)[:, 1] + 0.2 * f)
    c = np.asarray([[.58, .58, .6]] * 3 + [[.5, .5, .5], [.6, .59, .58],
                    [.58, .58, .6], [.58, .58, .6], [.2, .2, .33],
                    [.58, .58, .6]])
    first = np.minimum(1, np.floor(mt * 6).astype(int))
    tt2 = (mt * 6 - first)[:, None]
    c0, c1, c2, c3 = c[first], c[first + 1], c[first + 2], c[first + 3]
    b0 = (1 - tt2) * c0 + tt2 * c1
    b1 = (1 - tt2) * c1 + tt2 * c2
    b2 = (1 - tt2) * c2 + tt2 * c3
    b0 = (1 - tt2) * b0 + tt2 * b1
    b1 = (1 - tt2) * b1 + tt2 * b2
    want = 1.5 * ((1 - tt2) * b0 + tt2 * b1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
