"""Packet BVH traversal kernel (ops/bvh_pallas.py) vs the XLA traversal.

Runs the Pallas kernel in interpreter mode on CPU (same numerics as the
TPU lowering) and checks closest-hit/any-hit agreement with the threaded
XLA traversal on a random triangle soup.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.ops import bvh_pallas as bp
from pbrt_tpu.scene import bvh as bvh_mod
from tests.test_bvh_io import random_tri_scene


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, jnp.full(n, 1e30)


def test_packet_kernel_matches_threaded_traversal():
    scene = random_tri_scene(500, seed=0)
    bvh = bvh_mod.build_bvh(None, scene)
    o, d, tmax = _rays(3000)
    t_ref, i_ref = bvh_mod._traverse_batch(bvh, o, d, tmax, False)
    t_pk, i_pk = bp._impl(bvh.pk_meta, bvh.pk_nb, bvh.pk_tri, o, d, tmax,
                          any_hit=False, interpret=True)
    hit_ref = np.asarray(i_ref) >= 0
    hit_pk = np.asarray(i_pk) >= 0
    np.testing.assert_array_equal(hit_ref, hit_pk)
    m = hit_ref
    np.testing.assert_allclose(np.asarray(t_ref)[m], np.asarray(t_pk)[m],
                               rtol=1e-4, atol=1e-5)
    # indices must agree except at genuine t-ties (two coincident-depth
    # surfaces): SBVH's duplicated refs reorder leaf tests, so a ~1-ulp
    # tie can resolve to either surface
    ir, ip = np.asarray(i_ref)[m], np.asarray(i_pk)[m]
    tied = np.isclose(np.asarray(t_ref)[m], np.asarray(t_pk)[m],
                      rtol=1e-5, atol=1e-6)
    assert np.all((ir == ip) | tied)


def test_packet_kernel_any_hit():
    scene = random_tri_scene(300, seed=2)
    bvh = bvh_mod.build_bvh(None, scene)
    o, d, tmax = _rays(2048, seed=3)
    t_ref, i_ref = bvh_mod._traverse_batch(bvh, o, d, tmax, False)
    _, i_any = bp._impl(bvh.pk_meta, bvh.pk_nb, bvh.pk_tri, o, d, tmax,
                        any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_ref) >= 0,
                                  np.asarray(i_any) >= 0)


def test_packet_kernel_non_multiple_batch():
    """Ray counts that don't divide the packet size are padded correctly."""
    scene = random_tri_scene(100, seed=4)
    bvh = bvh_mod.build_bvh(None, scene)
    o, d, tmax = _rays(777, seed=5)
    t_ref, i_ref = bvh_mod._traverse_batch(bvh, o, d, tmax, False)
    t_pk, i_pk = bp._impl(bvh.pk_meta, bvh.pk_nb, bvh.pk_tri, o, d, tmax,
                          any_hit=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_ref) >= 0,
                                  np.asarray(i_pk) >= 0)
