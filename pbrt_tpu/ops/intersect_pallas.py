"""Fused ray–scene intersection kernel (Pallas, TPU).

Replaces the XLA all-pairs path of scene/intersect.py for small scenes
(≲1k primitives — every shipped portal/cornell scene): primitive data sits
in SMEM (scalar memory — one scalar load per prim attribute per loop
iteration), rays stream through VMEM in (ROWS, 128) vector blocks, and the
per-ray closest hit is computed entirely on-chip. The jnp path materializes
(R, P)-shaped intermediates in HBM (bandwidth-bound); this kernel is
compute-bound at ~60 flops per ray-prim test on the VPU.

Detached for AD (custom_vjp, zero cotangents): the estimator differentiates
the integrand, not the sampled hit distances (detached-sampling design,
SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

LANES = 128
ROWS = 16          # rays per block = ROWS * LANES = 2048
BIG = 1e30


def _intersect_kernel(tri_ref, sph_ref, pln_ref, ox_ref, oy_ref, oz_ref,
                      dx_ref, dy_ref, dz_ref, tmax_ref, t_out, prim_out,
                      *, n_tri, n_sph, n_pln):
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]

    best_t = jnp.minimum(tmax_ref[:, :], BIG)
    best_p = jnp.full(best_t.shape, -1, jnp.int32)

    # ---- triangles: Möller–Trumbore (shapes/triangle.cpp role)
    def tri_body(i, carry):
        bt, bp = carry
        v0x = tri_ref[i, 0]
        v0y = tri_ref[i, 1]
        v0z = tri_ref[i, 2]
        e1x = tri_ref[i, 3]
        e1y = tri_ref[i, 4]
        e1z = tri_ref[i, 5]
        e2x = tri_ref[i, 6]
        e2y = tri_ref[i, 7]
        e2z = tri_ref[i, 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        rx = ox - v0x
        ry = oy - v0y
        rz = oz - v0z
        u = (rx * px + ry * py + rz * pz) * inv_det
        qx = ry * e1z - rz * e1y
        qy = rz * e1x - rx * e1z
        qz = rx * e1y - ry * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > 1e-4) & (t < bt))
        bt = jnp.where(hit, t, bt)
        bp = jnp.where(hit, bp * 0 + i, bp)
        return bt, bp

    if n_tri:
        best_t, best_p = jax.lax.fori_loop(0, n_tri, tri_body,
                                           (best_t, best_p))

    # ---- spheres (shapes/sphere.cpp role)
    def sph_body(i, carry):
        bt, bp = carry
        cx = sph_ref[i, 0]
        cy = sph_ref[i, 1]
        cz = sph_ref[i, 2]
        r = sph_ref[i, 3]
        lx = ox - cx
        ly = oy - cy
        lz = oz - cz
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (lx * dx + ly * dy + lz * dz)
        c = lx * lx + ly * ly + lz * lz - r * r
        disc = b * b - 4.0 * a * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = jnp.where(b >= 0.0, -0.5 * (b + sq), -0.5 * (b - sq))
        t0 = q / jnp.maximum(a, 1e-20)
        t1 = c / jnp.where(jnp.abs(q) > 1e-20, q, 1e-20)
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t = jnp.where(tn > 1e-4, tn, tf)
        hit = ok & (t > 1e-4) & (t < bt)
        bt = jnp.where(hit, t, bt)
        bp = jnp.where(hit, bp * 0 + (n_tri + i), bp)
        return bt, bp

    if n_sph:
        best_t, best_p = jax.lax.fori_loop(0, n_sph, sph_body,
                                           (best_t, best_p))

    # ---- aaplanes (fork shapes/plane.cpp role)
    def pln_body(i, carry):
        bt, bp = carry
        # broadcast all SMEM scalars into vectors up front: Mosaic cannot
        # legalize selects mixing scalar and vector operands
        zero_v = jnp.zeros_like(dx)
        lox = pln_ref[i, 0] + zero_v
        loy = pln_ref[i, 1] + zero_v
        loz = pln_ref[i, 2] + zero_v
        hix = pln_ref[i, 3] + zero_v
        hiy = pln_ref[i, 4] + zero_v
        hiz = pln_ref[i, 5] + zero_v
        ax = pln_ref[i, 6] + zero_v
        is_x = ax < 0.5
        is_y = (ax >= 0.5) & (ax < 1.5)
        d_ax = jnp.where(is_x, dx, jnp.where(is_y, dy, dz))
        o_ax = jnp.where(is_x, ox, jnp.where(is_y, oy, oz))
        lo_ax = jnp.where(is_x, lox, jnp.where(is_y, loy, loz))
        t = (lo_ax - o_ax) / jnp.where(jnp.abs(d_ax) > 1e-12, d_ax, 1e-12)
        hx = ox + t * dx
        hy = oy + t * dy
        hz = oz + t * dz
        # select float coordinates, not booleans — Mosaic cannot truncate
        # selects to i1 vectors
        p0 = jnp.where(is_x, hy, hx)
        lo0 = jnp.where(is_x, loy, lox)
        hi0 = jnp.where(is_x, hiy, hix)
        is_xy = is_x | is_y
        p1 = jnp.where(is_xy, hz, hy)
        lo1 = jnp.where(is_xy, loz, loy)
        hi1 = jnp.where(is_xy, hiz, hiy)
        hit = ((jnp.abs(d_ax) > 1e-12) & (t > 1e-4) & (t < bt)
               & (p0 > lo0) & (p0 < hi0) & (p1 > lo1) & (p1 < hi1))
        bt = jnp.where(hit, t, bt)
        bp = jnp.where(hit, bp * 0 + (n_tri + n_sph + i), bp)
        return bt, bp

    if n_pln:
        best_t, best_p = jax.lax.fori_loop(0, n_pln, pln_body,
                                           (best_t, best_p))

    t_out[:, :] = best_t
    prim_out[:, :] = best_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def intersect_brute_pallas(tri_data, sph_data, pln_data, o, d, tmax,
                           n_tri, n_sph, n_pln):
    """o,d: (R,3); returns (t (R,), prim_id (R,))."""
    return _impl(tri_data, sph_data, pln_data, o, d, tmax, n_tri=n_tri,
                 n_sph=n_sph, n_pln=n_pln)


def _ibp_fwd(tri_data, sph_data, pln_data, o, d, tmax, n_tri, n_sph,
             n_pln):
    out = _impl(tri_data, sph_data, pln_data, o, d, tmax, n_tri=n_tri,
                n_sph=n_sph, n_pln=n_pln)
    shapes_ = jax.tree_util.tree_map(
        lambda x: (x.shape, x.dtype),
        (tri_data, sph_data, pln_data, o, d, tmax))
    return out, shapes_


def _ibp_bwd(n_tri, n_sph, n_pln, shapes_, g):
    return tuple(jnp.zeros(s, dt) for (s, dt) in shapes_)


intersect_brute_pallas.defvjp(_ibp_fwd, _ibp_bwd)


@functools.partial(jax.jit, static_argnames=("n_tri", "n_sph", "n_pln"))
def _impl(tri_data, sph_data, pln_data, o, d, tmax, *, n_tri, n_sph,
          n_pln):
    R = o.shape[0]
    block = ROWS * LANES
    Rpad = ((R + block - 1) // block) * block
    pad = Rpad - R

    def pad1(x, fill):
        return jnp.concatenate([x, jnp.full(pad, fill, x.dtype)]) if pad \
            else x

    comps = []
    for k in range(3):
        comps.append(pad1(o[:, k], 0.0).reshape(-1, LANES))
    for k in range(3):
        comps.append(pad1(d[:, k], 1.0).reshape(-1, LANES))
    tmax2 = pad1(tmax, 0.0).reshape(-1, LANES)
    n_row_blocks = Rpad // block

    kernel = functools.partial(_intersect_kernel, n_tri=n_tri, n_sph=n_sph,
                               n_pln=n_pln)
    prim_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, prim = pl.pallas_call(
        kernel,
        grid=(n_row_blocks,),
        in_specs=[prim_spec(tri_data.shape), prim_spec(sph_data.shape),
                  prim_spec(pln_data.shape)] + [ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Rpad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Rpad // LANES, LANES), jnp.int32),
        ],
    )(tri_data, sph_data, pln_data, *comps, tmax2)
    return t.reshape(-1)[:R], prim.reshape(-1)[:R]


def pack_scene(scene):
    """Pack primitive SoA into the kernel's SMEM layout."""
    g = scene.geom
    tri = jnp.concatenate(
        [g.tri_v0, g.tri_v1 - g.tri_v0, g.tri_v2 - g.tri_v0], axis=-1)
    sph = jnp.concatenate([g.sph_center, g.sph_radius[:, None]], axis=-1)
    pln = jnp.concatenate(
        [g.pln_lo, g.pln_hi, g.pln_ax[:, None].astype(jnp.float32),
         jnp.zeros((g.pln_ax.shape[0], 1))], axis=-1)
    return tri, sph, pln
