"""BVH correctness (vs brute force) and image I/O round trips
(mirrors tests/imageio.cpp:89 format round-trip tests)."""

import dataclasses
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.scene import bvh as bvh_mod
from pbrt_tpu.scene import intersect as isect_mod
from pbrt_tpu.scene.types import SceneBuilder
from pbrt_tpu.utils import imageio


def random_tri_scene(n_tris=500, seed=0, use_bvh="never"):
    rs = np.random.RandomState(seed)
    b = SceneBuilder(RGB)
    m = b.add_material(type=0, kd=0.5)
    centers = rs.uniform(-5, 5, (n_tris, 3)).astype(np.float32)
    offs = rs.uniform(-0.4, 0.4, (n_tris, 2, 3)).astype(np.float32)
    for i in range(n_tris):
        b.add_triangle(centers[i], centers[i] + offs[i, 0],
                       centers[i] + offs[i, 1], mat=m)
    return b.build(use_bvh="never" if use_bvh == "never" else "always")


class TestBVH:
    def test_bvh_matches_brute_force(self):
        scene_bf = random_tri_scene(400, seed=1)
        scene_bvh = dataclasses.replace(
            scene_bf, bvh=bvh_mod.build_bvh(None, scene_bf))
        rs = np.random.RandomState(2)
        R = 2000
        o = jnp.asarray(rs.uniform(-8, 8, (R, 3)), jnp.float32)
        d = jnp.asarray(rs.randn(R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tmax = jnp.full(R, jnp.inf)
        h1 = isect_mod.intersect(scene_bf, o, d, tmax)
        h2 = isect_mod.intersect(scene_bvh, o, d, tmax)
        np.testing.assert_array_equal(np.asarray(h1.valid),
                                      np.asarray(h2.valid))
        v = np.asarray(h1.valid)
        np.testing.assert_allclose(np.asarray(h1.t)[v],
                                   np.asarray(h2.t)[v], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1.prim_id)[v],
                                      np.asarray(h2.prim_id)[v])

    def test_bvh_shadow_matches(self):
        scene_bf = random_tri_scene(300, seed=3)
        scene_bvh = dataclasses.replace(
            scene_bf, bvh=bvh_mod.build_bvh(None, scene_bf))
        rs = np.random.RandomState(4)
        R = 2000
        o = jnp.asarray(rs.uniform(-8, 8, (R, 3)), jnp.float32)
        d = jnp.asarray(rs.randn(R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tmax = jnp.full(R, 6.0)
        p1 = isect_mod.intersect_p(scene_bf, o, d, tmax)
        p2 = isect_mod.intersect_p(scene_bvh, o, d, tmax)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


class TestImageIO:
    def _img(self):
        rs = np.random.RandomState(0)
        return rs.uniform(0, 2.0, (17, 23, 3)).astype(np.float32)

    def test_exr_round_trip(self):
        img = self._img()
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.exr")
            imageio.write_exr(p, img)
            back = imageio.read_exr(p)
        np.testing.assert_allclose(back, img, atol=1e-6)

    def test_pfm_round_trip(self):
        img = self._img()
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.pfm")
            imageio.write_pfm(p, img)
            back = imageio.read_pfm(p)
        np.testing.assert_allclose(back, img, atol=1e-6)

    def test_png_round_trip(self):
        img = np.clip(self._img(), 0, 1)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.png")
            imageio.write_png(p, img)
            back = imageio.read_png(p)
        np.testing.assert_allclose(back, img, atol=0.01)

    def test_dispatch_by_extension(self):
        img = self._img()
        with tempfile.TemporaryDirectory() as td:
            for ext in (".exr", ".pfm", ".png", ".tga"):
                imageio.write_image(os.path.join(td, "x" + ext), img)
                assert os.path.getsize(os.path.join(td, "x" + ext)) > 100


def test_split_methods_agree_with_brute():
    """All four BVHAccel SplitMethods (bvh.h:58) give identical hits to the
    brute-force reference on a random triangle soup."""
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from pbrt_tpu.core.spectrum import RGB
    from pbrt_tpu.scene import bvh as bvh_mod
    from pbrt_tpu.scene import intersect as isect_mod
    from pbrt_tpu.scene.types import SceneBuilder

    rng = np.random.RandomState(0)
    b = SceneBuilder(RGB)
    m = b.add_material(type=0)
    for _ in range(120):
        c = rng.rand(3) * 4 - 2
        v = c + rng.rand(3, 3) * 0.4
        b.add_mesh(v, [(0, 1, 2)], mat=m)
    b.add_light(type="point", I=(1.0, 1.0, 1.0), pos=(0.0, 3.0, 0.0))
    scene = b.build()
    R = 256
    o = jnp.asarray(rng.rand(R, 3) * 6 - 3, jnp.float32)
    d = jnp.asarray(rng.randn(R, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full(R, 100.0)
    ref = isect_mod._intersect_brute(scene, o, d, tmax)
    for sm in ("sah", "middle", "equal", "hlbvh"):
        sc2 = dc.replace(scene,
                         bvh=bvh_mod.build_bvh(b, scene, split_method=sm))
        hit = isect_mod.intersect(sc2, o, d, tmax)
        assert (np.asarray(hit.prim_id) == np.asarray(ref.prim_id)).all(), sm


def test_parser_splitmethod_param():
    from pbrt_tpu.frontend.parser import PbrtParser

    ps = PbrtParser()
    ps.parse('Accelerator "bvh" "string splitmethod" ["middle"]\n'
             'WorldBegin\nWorldEnd\n')
    assert ps.builder.bvh_split == "middle"
