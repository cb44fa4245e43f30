"""Tessellated shape families + shape sampling property tests
(mirrors tests/shapes.cpp's sampling/reintersection checks)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng
from pbrt_tpu.scene import shapes, tessellate as tess


class TestTessellate:
    def test_cylinder_area(self):
        v, f, n = tess.tessellate_cylinder(radius=2.0, zmin=0.0, zmax=3.0,
                                           n_phi=128, n_z=4)
        area = _mesh_area(v, f)
        np.testing.assert_allclose(area, 2 * np.pi * 2.0 * 3.0, rtol=0.01)

    def test_cone_area(self):
        r, h = 1.5, 2.0
        v, f, n = tess.tessellate_cone(r, h, n_phi=256, n_z=16)
        slant = np.hypot(r, h)
        np.testing.assert_allclose(_mesh_area(v, f), np.pi * r * slant,
                                   rtol=0.01)

    def test_paraboloid_bounds(self):
        v, f, n = tess.tessellate_paraboloid(1.0, 0.0, 1.0)
        assert v[:, 2].min() >= 0.0 and v[:, 2].max() <= 1.0 + 1e-5
        r = np.hypot(v[:, 0], v[:, 1])
        np.testing.assert_allclose(r.max(), 1.0, atol=0.01)

    def test_hyperboloid_revolution(self):
        v, f, n = tess.tessellate_hyperboloid((1, 0, 0), (0.5, 0.5, 1.0))
        assert len(f) > 0 and np.isfinite(v).all()

    def test_heightfield_grid(self):
        z = np.arange(12, dtype=np.float32).reshape(3, 4) / 12.0
        v, f, n = tess.tessellate_heightfield(4, 3, z)
        assert v.shape == (12, 3)
        assert len(f) == 2 * 3 * 2

    def test_curve_ribbon(self):
        cp = [(0, 0, 0), (0, 1, 0), (0, 2, 0), (0, 3, 0)]
        v, f, n = tess.tessellate_curve(cp, 0.1, 0.05, n_seg=8)
        assert v.shape == (18, 3)
        assert len(f) == 16

    def test_nurbs_plane(self):
        # degree-1 NURBS patch = bilinear plane
        v, f, n = tess.tessellate_nurbs(
            2, 2, [0, 0, 1, 1], 2, 2, [0, 0, 1, 1],
            np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                       np.float64), n_tess_u=4, n_tess_v=4)
        np.testing.assert_allclose(v[:, 2], 0.0, atol=1e-6)
        assert v[:, 0].max() > 0.7 and v[:, 1].max() > 0.7


class TestShapeSampling:
    def test_aaplane_sample_on_surface(self):
        N = 5000
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
        lo = jnp.tile(jnp.asarray([[-1.0, 2.0, -3.0]]), (N, 1))
        hi = jnp.tile(jnp.asarray([[4.0, 2.0, 5.0]]), (N, 1))
        ax = jnp.full(N, 1, jnp.int32)
        fw = jnp.ones(N, bool)
        p, n, pdf = shapes.sample_aaplane(lo, hi, ax, fw, u)
        p = np.asarray(p)
        np.testing.assert_allclose(p[:, 1], 2.0, atol=1e-5)
        assert (p[:, 0] >= -1).all() and (p[:, 0] <= 4).all()
        assert (p[:, 2] >= -3).all() and (p[:, 2] <= 5).all()
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / 40.0, rtol=1e-4)
        # uniform coverage
        assert abs(p[:, 0].mean() - 1.5) < 0.1

    def test_triangle_reintersection(self):
        """Sampled points re-intersect their triangle (shapes.cpp
        TestReintersectConvex)."""
        N = 2000
        pid = jnp.arange(N, dtype=jnp.uint32)
        u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
        v0 = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (N, 1))
        v1 = jnp.tile(jnp.asarray([[3.0, 0.0, 2.0]]), (N, 1))
        v2 = jnp.tile(jnp.asarray([[0.0, 3.0, 2.0]]), (N, 1))
        p, n, ipdf = shapes.sample_triangle(v0, v1, v2, u)
        o = jnp.zeros((N, 3))
        d = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        t, _, _, hit = shapes.intersect_triangle_paired(
            o, d, jnp.full(N, 1e9), v0, v1, v2)
        assert np.asarray(hit).all()
        np.testing.assert_allclose(np.asarray(o + t[:, None] * d),
                                   np.asarray(p), atol=1e-4)


def _mesh_area(v, f):
    a = v[f[:, 0]]
    b = v[f[:, 1]]
    c = v[f[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
