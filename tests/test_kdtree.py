"""kd-tree accelerator: parity with brute force (accelerators/
kdtreeaccel.cpp counterpart)."""

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.scene import kdtree as kd_mod
from pbrt_tpu.scene import shapes
from test_bvh_io import random_tri_scene


class TestKdTree:
    def test_matches_brute_force(self):
        scene = random_tri_scene(300, seed=5)
        kd = kd_mod.build_kdtree(scene)
        rs = np.random.RandomState(6)
        R = 1500
        o = jnp.asarray(rs.uniform(-8, 8, (R, 3)), jnp.float32)
        d = jnp.asarray(rs.randn(R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tmax = jnp.full(R, jnp.inf)
        t_kd, i_kd, hit_kd = kd_mod.kdtree_intersect_tris(kd, o, d, tmax)
        # brute force reference
        g = scene.geom
        t_bf, _, _, h_bf = shapes.intersect_triangles(
            o, d, tmax, g.tri_v0, g.tri_v1, g.tri_v2)
        t_m = jnp.where(h_bf, t_bf, jnp.inf)
        i_bf = jnp.argmin(t_m, axis=-1)
        hit_bf = h_bf.any(-1)
        tb = jnp.take_along_axis(t_m, i_bf[:, None], axis=-1)[:, 0]
        np.testing.assert_array_equal(np.asarray(hit_kd),
                                      np.asarray(hit_bf))
        m = np.asarray(hit_bf)
        np.testing.assert_allclose(np.asarray(t_kd)[m], np.asarray(tb)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i_kd)[m],
                                      np.asarray(i_bf)[m])
