"""Experimental BVH4 packet-kernel variants (killeroo perf push, round 4).

Variants over ops/bvh_pallas.py's production kernel:
  v1: interior wide-node bounds live in SMEM as f32 scalars — the slab
      test uses scalar operands directly (native scalar→vector splat)
      instead of a VMEM roll-fetch + 24 log-doubling broadcasts.
  v2: v1 + leaf fetch via per-row sublane-doubling then (8,1)->(8,128)
      lane broadcasts (1 op/field instead of 4).
  v3: v2 + entry-distance stack pruning: a parallel f32 SMEM stack keeps
      each pushed group's packet-min slab entry distance; a popped entry
      whose tn exceeds every live ray's best_t is skipped.

Winner gets merged into ops/bvh_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 8
WIDE = 4
NODE_F = WIDE * 6
TRI_F = 10
TRIS_PER_LEAF_ROW = 12
PACKET_LEAF_MAX = 16
LEAF_BLOCK_ROWS = (PACKET_LEAF_MAX * TRI_F + LANES - 1) // LANES
STACK = 96
BIG = 1e30
META_CNT_MASK = 0x1F
META_AXIS_SHIFT = 5


def nb_to_smem(pk_nb, nw):
    """(ceil(Nw/5),128) VMEM rows → (24, Nw) f32 SMEM table."""
    flat = np.asarray(pk_nb).reshape(-1, 128)[:, :5 * NODE_F]
    flat = flat.reshape(-1, NODE_F)[:nw]          # (Nw, 24)
    return np.ascontiguousarray(flat.T)           # (24, Nw)


def pack_params(lo, hi, right, count, axis, v0, v1, v2, *, wide=4,
                leaf_max=16):
    """Parametrized host packer: binary flat tree → (meta (W+1,Nw) i32,
    nbs (6W, Nw) f32 [both SMEM], tri blocks (n_leaf*rows,128) f32)."""
    from pbrt_tpu.ops.bvh_pallas import _collapse_tree
    lo, hi, right, count, axis = _collapse_tree(
        np.asarray(lo), np.asarray(hi), np.asarray(right, np.int64),
        np.asarray(count, np.int64), np.asarray(axis, np.int64),
        max_leaf=leaf_max)
    n = right.shape[0]
    e1 = v1 - v0
    e2 = v2 - v0
    tri_f = TRI_F
    tris_per_row = LANES // tri_f                 # 12
    block_rows = (leaf_max * tri_f + LANES - 1) // LANES
    cnt_bits = max(5, leaf_max.bit_length())
    cnt_mask = (1 << cnt_bits) - 1

    leaves = np.where(count > 0)[0]
    n_leaf = max(len(leaves), 1)
    blocks = np.zeros((n_leaf * block_rows, LANES), np.float32)
    block_id = np.full(n, -1, np.int64)
    for b, i in enumerate(leaves):
        st = int(right[i])
        cn = int(count[i])
        block_id[i] = b
        for k in range(cn):
            r, base = divmod(k, tris_per_row)
            row = block_rows * b + r
            blocks[row, base * tri_f:base * tri_f + 3] = v0[st + k]
            blocks[row, base * tri_f + 3:base * tri_f + 6] = e1[st + k]
            blocks[row, base * tri_f + 6:base * tri_f + 9] = e2[st + k]
            blocks[row, base * tri_f + 9] = float(st + k)

    wmeta = []
    wbounds = []

    def leaf_enc(i):
        return int(block_id[i]) << cnt_bits | int(count[i])

    def expand(i, levels):
        if levels == 0 or count[i] > 0:
            return [int(i)]
        return (expand(int(i) + 1, levels - 1)
                + expand(int(right[i]), levels - 1))

    wide_levels = {8: 3, 4: 2}[wide]

    def make_wide(b):
        wid = len(wmeta)
        wmeta.append([-1] * wide + [0])
        wbounds.append(np.zeros(wide * 6, np.float32))
        if count[b] > 0:
            slots = [b]
        else:
            slots = expand(int(b) + 1, wide_levels - 1) \
                + expand(int(right[b]), wide_levels - 1)
        for k, si in enumerate(slots):
            wbounds[wid][6 * k:6 * k + 3] = lo[si]
            wbounds[wid][6 * k + 3:6 * k + 6] = hi[si]
            if count[si] > 0:
                wmeta[wid][k] = leaf_enc(si)
            else:
                wmeta[wid][k] = make_wide(si) << cnt_bits
        wmeta[wid][wide] = int(axis[b])
        return wid

    import sys
    old_lim = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_lim, n + 64))
    try:
        make_wide(0)
    finally:
        sys.setrecursionlimit(old_lim)
    meta = np.asarray(wmeta, np.int32).T.copy()
    nbs = np.ascontiguousarray(np.asarray(wbounds, np.float32).T)
    return meta, nbs, blocks, dict(wide=wide, leaf_max=leaf_max,
                                   cnt_bits=cnt_bits,
                                   block_rows=block_rows,
                                   tris_per_row=tris_per_row)


def pack_dual_leaf(lo, hi, right, count, axis, v0, v1, v2, *,
                   leaf_max=16):
    """Like pack_params(wide=4) but leaf encodings address a starting
    ROW, and leaves with <=8 tris occupy ONE row (8x10 floats) while
    larger ones take two. The kernel tests 8 or 16 triangles per pop
    depending on cnt (variant 5)."""
    from pbrt_tpu.ops.bvh_pallas import _collapse_tree
    lo, hi, right, count, axis = _collapse_tree(
        np.asarray(lo), np.asarray(hi), np.asarray(right, np.int64),
        np.asarray(count, np.int64), np.asarray(axis, np.int64),
        max_leaf=leaf_max)
    n = right.shape[0]
    e1 = v1 - v0
    e2 = v2 - v0
    cnt_bits = 5
    leaves = np.where(count > 0)[0]
    rows_list = []
    start_row = np.full(n, -1, np.int64)
    row_cursor = 0
    for i in leaves:
        st = int(right[i]); cn = int(count[i])
        nrows = 1 if cn <= 8 else 2
        start_row[i] = row_cursor
        row_cursor += nrows
        block = np.zeros((nrows, LANES), np.float32)
        for k in range(cn):
            r, base = divmod(k, 8 if cn <= 8 else TRIS_PER_LEAF_ROW)
            if cn <= 8:
                r, base = 0, k
            else:
                r, base = divmod(k, TRIS_PER_LEAF_ROW)
            block[r, base*TRI_F:base*TRI_F+3] = v0[st+k]
            block[r, base*TRI_F+3:base*TRI_F+6] = e1[st+k]
            block[r, base*TRI_F+6:base*TRI_F+9] = e2[st+k]
            block[r, base*TRI_F+9] = float(st+k)
        rows_list.append(block)
    blocks = np.concatenate(rows_list, 0) if rows_list else np.zeros((1, LANES), np.float32)

    wmeta = []; wbounds = []
    def leaf_enc(i):
        return int(start_row[i]) << cnt_bits | int(count[i])
    def expand(i, levels):
        if levels == 0 or count[i] > 0:
            return [int(i)]
        return expand(int(i)+1, levels-1) + expand(int(right[i]), levels-1)
    def make_wide(b):
        wid = len(wmeta)
        wmeta.append([-1]*4 + [0])
        wbounds.append(np.zeros(24, np.float32))
        slots = [b] if count[b] > 0 else (expand(int(b)+1, 1) + expand(int(right[b]), 1))
        for k, si in enumerate(slots):
            wbounds[wid][6*k:6*k+3] = lo[si]
            wbounds[wid][6*k+3:6*k+6] = hi[si]
            wmeta[wid][k] = leaf_enc(si) if count[si] > 0 else make_wide(si) << cnt_bits
        wmeta[wid][4] = int(axis[b])
        return wid
    import sys as _sys
    old = _sys.getrecursionlimit(); _sys.setrecursionlimit(max(old, n+64))
    try:
        make_wide(0)
    finally:
        _sys.setrecursionlimit(old)
    meta = np.asarray(wmeta, np.int32).T.copy()
    nbs = np.ascontiguousarray(np.asarray(wbounds, np.float32).T)
    return meta, nbs, blocks


def _row8(row_1x, nrows=ROWS):
    v = row_1x
    while v.shape[0] < nrows:
        v = jnp.concatenate([v, v], axis=0)
    return v


def _lane_bcast(row8, col, shape):
    return jnp.broadcast_to(row8[:, col:col + 1], shape)


def _kernel(meta_ref, nbs_ref, tri_ref, ox_ref, oy_ref, oz_ref,
            ix_ref, iy_ref, iz_ref, dx_ref, dy_ref, dz_ref,
            tmax_ref, t_out, i_out, stack_ref, tn_ref, *, any_hit,
            gamma3x2, variant, pp):
    wide = pp["wide"]
    leaf_max = pp["leaf_max"]
    cnt_bits = pp["cnt_bits"]
    cnt_mask = (1 << cnt_bits) - 1
    block_rows = pp["block_rows"]
    tris_per_row = pp["tris_per_row"]
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    ix = ix_ref[:, :]
    iy = iy_ref[:, :]
    iz = iz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]
    shape = ox.shape

    sneg_x = jnp.sum(dx) < 0.0
    sneg_y = jnp.sum(dy) < 0.0
    sneg_z = jnp.sum(dz) < 0.0

    best_t0 = jnp.minimum(tmax_ref[:, :], BIG)
    best_i0 = jnp.full(shape, -1, jnp.int32)
    stack_ref[0] = 0
    if variant >= 3:
        tn_ref[0] = 0.0
    gscale = 1.0 + gamma3x2

    count_mode = variant >= 10
    if count_mode:
        variant = variant - 10

    def cond(c):
        sp, done, _, _, _, _ = c
        return (sp > 0) & jnp.logical_not(done)

    def _slab_scalar(t, k, bt, bi):
        """Slab-test child k of wide node t with scalar SMEM bounds.
        Returns (any_enter, packet_min_tn)."""
        lo_x = nbs_ref[6 * k + 0, t]
        lo_y = nbs_ref[6 * k + 1, t]
        lo_z = nbs_ref[6 * k + 2, t]
        hi_x = nbs_ref[6 * k + 3, t]
        hi_y = nbs_ref[6 * k + 4, t]
        hi_z = nbs_ref[6 * k + 5, t]
        t0x = (lo_x - ox) * ix
        t1x = (hi_x - ox) * ix
        t0y = (lo_y - oy) * iy
        t1y = (hi_y - oy) * iy
        t0z = (lo_z - oz) * iz
        t1z = (hi_z - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z)) * gscale
        live = bt if not any_hit else jnp.where(bi >= 0, -BIG, bt)
        enter = (tn <= tf) & (tf > 0.0) & (tn < live)
        if variant >= 3:
            tn_min = jnp.min(jnp.where(enter, tn, BIG))
            return jnp.any(enter), tn_min
        return jnp.any(enter), 0.0

    def _leaf_rows(start_row, cnt, bt, bi, n_tri, per_row):
        nrows = (n_tri + per_row - 1) // per_row
        rows2 = tri_ref[pl.ds(start_row, nrows), :]
        r8 = [_row8(rows2[r:r + 1, :], shape[0]) for r in range(nrows)]

        def fld(k, f):
            r = k // per_row
            base = (k % per_row) * TRI_F
            return _lane_bcast(r8[r], base + f, shape)

        for k in range(n_tri):
            v0x = fld(k, 0); v0y = fld(k, 1); v0z = fld(k, 2)
            e1x = fld(k, 3); e1y = fld(k, 4); e1z = fld(k, 5)
            e2x = fld(k, 6); e2y = fld(k, 7); e2z = fld(k, 8)
            idx_f = fld(k, 9)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            rx = ox - v0x; ry = oy - v0y; rz = oz - v0z
            u = (rx * px + ry * py + rz * pz) * inv_det
            qx = ry * e1z - rz * e1y
            qy = rz * e1x - rx * e1z
            qz = rx * e1y - ry * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = ((k < cnt) & (jnp.abs(det) > 1e-12) & (u >= 0.0)
                   & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-4) & (t < bt))
            bt = jnp.where(hit, t, bt)
            bi = jnp.where(hit, idx_f.astype(jnp.int32), bi)
        return bt, bi

    def _leaf(block, cnt, bt, bi):
        if variant == 5:
            return jax.lax.cond(
                cnt <= 8,
                lambda c2: _leaf_rows(block, cnt, c2[0], c2[1], 8, 8),
                lambda c2: _leaf_rows(block, cnt, c2[0], c2[1], 16,
                                      TRIS_PER_LEAF_ROW),
                (bt, bi))
        rows2 = tri_ref[pl.ds(block * block_rows, block_rows), :]
        if variant >= 2:
            r8 = [_row8(rows2[r:r + 1, :], shape[0])
                  for r in range(block_rows)]

            def fld(k, f):
                r = k // tris_per_row
                base = (k % tris_per_row) * TRI_F
                return _lane_bcast(r8[r], base + f, shape)
        else:
            def fld(k, f):
                r = k // tris_per_row
                base = (k % tris_per_row) * TRI_F
                tv = rows2[r:r + 1, base:base + TRI_F]
                v = jnp.broadcast_to(tv[0:1, f:f + 1], (1, shape[1]))
                while v.shape[0] < shape[0]:
                    v = jnp.concatenate([v, v], axis=0)
                return v

        for k in range(leaf_max):
            v0x = fld(k, 0)
            v0y = fld(k, 1)
            v0z = fld(k, 2)
            e1x = fld(k, 3)
            e1y = fld(k, 4)
            e1z = fld(k, 5)
            e2x = fld(k, 6)
            e2y = fld(k, 7)
            e2z = fld(k, 8)
            idx_f = fld(k, 9)
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
            hit = ((k < cnt) & (jnp.abs(det) > 1e-12) & (u >= 0.0)
                   & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-4)
                   & (t < bt))
            bt = jnp.where(hit, t, bt)
            bi = jnp.where(hit, idx_f.astype(jnp.int32), bi)
        return bt, bi

    def body(c):
        sp, done, bt, bi, n_int, n_leaf = c
        e = stack_ref[sp - 1]
        cnt = e & cnt_mask
        target = e >> cnt_bits
        if variant >= 3:
            tn_e = tn_ref[sp - 1]
            live = jnp.any(tn_e < bt) if not any_hit else True
        else:
            live = True
        do_leaf = (cnt > 0) & live
        bt, bi = jax.lax.cond(
            do_leaf, lambda c2: _leaf(target, cnt, c2[0], c2[1]),
            lambda c2: c2, (bt, bi))
        sp2 = sp - 1

        def wide_fn(sp2):
            axis = meta_ref[wide, target]
            sneg = jnp.where(axis == 0, sneg_x,
                             jnp.where(axis == 1, sneg_y, sneg_z))
            encs = [meta_ref[k, target] for k in range(wide)]
            res = [_slab_scalar(target, k, bt, bi) for k in range(wide)]
            valid = [(encs[k] >= 0) & res[k][0] for k in range(wide)]
            half = wide // 2
            order_neg = tuple(range(wide))
            order_pos = tuple(range(half, wide)) + tuple(range(half))
            for j in range(wide):
                ek = jnp.where(sneg, encs[order_neg[j]],
                               encs[order_pos[j]])
                vk = jnp.where(sneg, valid[order_neg[j]],
                               valid[order_pos[j]])
                if variant >= 3:
                    tk = jnp.where(sneg, res[order_neg[j]][1],
                                   res[order_pos[j]][1])

                    @pl.when(vk)
                    def _(sp2=sp2, ek=ek, tk=tk):
                        stack_ref[sp2] = ek
                        tn_ref[sp2] = tk
                else:
                    @pl.when(vk)
                    def _(sp2=sp2, ek=ek):
                        stack_ref[sp2] = ek

                sp2 = jnp.where(vk, sp2 + 1, sp2)
            return sp2

        do_wide = (cnt == 0) & live
        sp2 = jax.lax.cond(do_wide, wide_fn, lambda s2: s2, sp2)
        done2 = jnp.logical_not(jnp.any(bi < 0)) if any_hit else done
        if count_mode:
            n_int = jnp.where(do_wide, n_int + 1, n_int)
            n_leaf = jnp.where(do_leaf, n_leaf + 1, n_leaf)
        return (sp2, done2, bt, bi, n_int, n_leaf)

    _, _, bt, bi, n_int, n_leaf = jax.lax.while_loop(
        cond, body, (jnp.int32(1), False, best_t0, best_i0,
                     jnp.int32(0), jnp.int32(0)))
    t_out[:, :] = bt
    if count_mode:
        i_out[:, :] = jnp.full(shape, n_int * 65536 + n_leaf, jnp.int32)
    else:
        i_out[:, :] = bi


DEFAULT_PP = dict(wide=4, leaf_max=16, cnt_bits=5, block_rows=2,
                  tris_per_row=12)


@functools.partial(jax.jit, static_argnames=("any_hit", "variant",
                                             "interpret", "rows", "pp"))
def traverse(meta, nbs, tris, o, d, tmax, *, any_hit, variant,
             interpret=False, rows=ROWS, pp=None):
    pp = dict(pp) if pp is not None else DEFAULT_PP
    import sys
    sys.path.insert(0, "/root/repo")
    from pbrt_tpu.core import vecmath

    R = o.shape[0]
    block = rows * LANES
    Rpad = ((R + block - 1) // block) * block
    pad = Rpad - R

    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)

    def pad1(x, fill):
        return jnp.concatenate([x, jnp.full(pad, fill, x.dtype)]) if pad \
            else x

    comps = [pad1(o[:, k], 0.0).reshape(-1, LANES) for k in range(3)]
    comps += [pad1(inv_d[:, k], 1.0).reshape(-1, LANES) for k in range(3)]
    comps += [pad1(d[:, k], 1.0).reshape(-1, LANES) for k in range(3)]
    tmax2 = pad1(tmax, 0.0).reshape(-1, LANES)

    kernel = functools.partial(
        _kernel, any_hit=any_hit, variant=variant, pp=pp,
        gamma3x2=float(2.0 * np.asarray(vecmath.gamma(3))))
    table_spec = lambda shape, space: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=space)
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        kernel,
        grid=(Rpad // block,),
        in_specs=[table_spec(meta.shape, pltpu.SMEM),
                  table_spec(nbs.shape, pltpu.SMEM),
                  table_spec(tris.shape, pltpu.VMEM)] + [ray_spec] * 10,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Rpad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Rpad // LANES, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32)],
        interpret=interpret,
    )(meta, nbs, tris, *comps, tmax2)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]
