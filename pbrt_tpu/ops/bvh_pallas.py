"""Packet BVH traversal kernel (Pallas, TPU).

Role of BVHAccel::Intersect/IntersectP's ordered stack walk
(accelerators/bvh.cpp:299-365), redesigned for the TPU's execution model.
The XLA while-loop formulation (scene/bvh.py _traverse_batch) is correct
everywhere but collapses on the axon TPU backend: dynamic gathers inside a
loop body lower to a pathologically slow code path (~15 ms per loop step
for a 262k-ray batch — measured; raw standalone gathers take 25 µs). This
kernel keeps the whole traversal on-chip and uses no gathers at all:

- **Packet traversal**: rays are processed in blocks of ROWS×128; one
  scalar DFS stack (SMEM scratch) is shared by the block, and a node is
  entered when ANY live ray's slab test passes — the classic SIMD packet
  scheme, which maps exactly onto the VPU's (8,128) vector shape.
- **Wide-node bounds live in SMEM as f32 scalars** ((24, Nw)): the slab
  test reads 6 scalars per child and feeds them to the VPU as native
  scalar→vector splat operands. This replaced the round-3 VMEM record
  fetch (pltpu.roll + 24 log-doubling broadcasts, ~190 ns/step of pure
  data movement): measured r4, interior fetch cost ≈ 0 and the whole
  kernel went 3.0 → 3.8 Mrays/s on coherent loads before the packet-size
  retune. SMEM holds ~768 KB on this chip (probed); killeroo's 2971 wide
  nodes need 285 KB.
- **4-wide (BVH4) nodes**: pairs of binary levels merge; all four slots
  are slab-tested per step and only entered ones pushed (near group
  last): a missed subtree never consumes a while iteration. Slot
  encodings + the parent split axis live in SMEM. 8-wide A/Bed
  equal-or-slower both rounds (longer scalar push chain).
- **Leaf blocks at static lanes**: subtrees of ≤PACKET_LEAF_MAX prims
  collapse into one leaf (pack_bvh) stored as aligned rows with every
  triangle at a STATIC lane offset (v0|e1|e2|leaf-ordered-index). Leaf
  fields broadcast in ONE op each: the fetched row is sublane-doubled
  once (log-2 concats), then each field is an (R,1)→(R,128)
  lane-broadcast — never a (1,1)→(R,128) both-dims broadcast (no Mosaic
  lowering) and never the MXU (whose default f32 path rounds operands
  to bf16: the r3 silent-corruption bug — see git history of
  _extract_fields).
- Ordered descent: near child first by the packet's majority direction
  sign along the split axis; per-lane best_t keeps pruning exact.
- ROWS=16 (2048-ray packets) measured best on the killeroo BVH:
  rows 8/16/32/64 → 28/42/28/24 Mrays/s coherent (r4 A/B). Entry-
  distance stack pruning A/Bed slower (the per-child packet-min reduce
  costs more than the skipped pops) — not adopted.

Closest-hit and any-hit variants share the kernel (ANY_HIT static flag).
Detached for AD like ops/intersect_pallas.py (sampled hit distances carry
no gradient; the integrand does).
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
ROWS = 16                 # rays per packet = ROWS * LANES = 2048
WIDE = 4                  # children per wide node; 8 A/Bed slower (the
                          # longer scalar push chain beats the step cut)
NODE_F = WIDE * 6         # f32 bounds per wide node in the SMEM table:
                          # [slot0.lo3 slot0.hi3 ... slotW.lo3 slotW.hi3]
TRIS_PER_LEAF_ROW = 12    # leaf-block layout: 12 tris x 10 floats/row
TRI_F = 10                # v0 e1 e2 + leaf-ordered tri index (float)
STACK = 96
BIG = 1e30

# meta packing: target<<5 | leaf_count  (count <= PACKET_LEAF_MAX=16)
META_CNT_MASK = 0x1F
META_AXIS_SHIFT = 5
# packet-tree leaves hold up to this many triangles: pack_bvh collapses
# subtrees of ≤16 prims into one leaf. The while-loop step (scalar
# control + SMEM meta + leaf fetch) dominates traversal cost, so a 5×
# smaller tree beats the extra masked triangle tests (which are cheap
# vector work). The XLA traversal path keeps the builder's LEAF_MAX=4
# tree — only the packet layout is coarsened.
PACKET_LEAF_MAX = 16   # A/B: 8 and 12 measured equal-or-slower (r3+r4)
# rows per leaf block (12 tris × 10 floats fit one 128-lane row)
LEAF_BLOCK_ROWS = (PACKET_LEAF_MAX * TRI_F + LANES - 1) // LANES


def _sublane_double(row_1x, nrows):
    """(1,128) → (nrows,128) by log-doubling concatenation (Mosaic has no
    (1,1)→(R,128) both-dims broadcast, and a chained lane-then-sublane
    broadcast pair gets re-folded into that unsupported form; doubling a
    full row avoids both)."""
    v = row_1x
    while v.shape[0] < nrows:
        v = jnp.concatenate([v, v], axis=0)
    return v


def _traverse_kernel(meta_ref, nbs_ref, tri_ref, ox_ref, oy_ref, oz_ref,
                     ix_ref, iy_ref, iz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref, t_out, i_out, stack_ref, *, any_hit,
                     gamma3x2):
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

    # majority direction sign per axis decides near-child order for the
    # whole packet (bvh.cpp:330 dirIsNeg per ray; packets vote)
    sneg_x = jnp.sum(dx) < 0.0
    sneg_y = jnp.sum(dy) < 0.0
    sneg_z = jnp.sum(dz) < 0.0

    best_t0 = jnp.minimum(tmax_ref[:, :], BIG)
    best_i0 = jnp.full(shape, -1, jnp.int32)
    stack_ref[0] = 0
    gscale = 1.0 + gamma3x2

    def cond(c):
        sp, done, _, _ = c
        return (sp > 0) & jnp.logical_not(done)

    def _slab_scalar(t, k, bt, bi):
        """Slab-test child slot k of wide node t against the packet; the
        six bounds are scalar SMEM loads splatted into the VPU ops."""
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
        return jnp.any((tn <= tf) & (tf > 0.0) & (tn < live))

    def _leaf(block, cnt, bt, bi):
        """Triangle tests over one static-lane leaf block."""
        rows2 = tri_ref[pl.ds(block * LEAF_BLOCK_ROWS,
                              LEAF_BLOCK_ROWS), :]
        r8 = [_sublane_double(rows2[r:r + 1, :], shape[0])
              for r in range(LEAF_BLOCK_ROWS)]

        def fld(k, f):
            r = k // TRIS_PER_LEAF_ROW
            base = (k % TRIS_PER_LEAF_ROW) * TRI_F
            return jnp.broadcast_to(r8[r][:, base + f:base + f + 1],
                                    shape)

        for k in range(PACKET_LEAF_MAX):
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
        """Pop one encoded entry: (target<<5|cnt); cnt>0 → leaf block,
        else a wide node whose FOUR child slots are slab-tested from
        scalar SMEM bounds, entered ones pushed near-group-last (the
        wide node stores the parent binary split axis for the group
        vote)."""
        sp, done, bt, bi = c
        e = stack_ref[sp - 1]
        cnt = e & META_CNT_MASK
        target = e >> META_AXIS_SHIFT
        do_leaf = cnt > 0
        bt, bi = jax.lax.cond(
            do_leaf, lambda c2: _leaf(target, cnt, c2[0], c2[1]),
            lambda c2: c2, (bt, bi))
        sp2 = sp - 1

        def wide_fn(sp2):
            axis = meta_ref[WIDE, target]
            sneg = jnp.where(axis == 0, sneg_x,
                             jnp.where(axis == 1, sneg_y, sneg_z))
            encs = [meta_ref[k, target] for k in range(WIDE)]
            hits = [_slab_scalar(target, k, bt, bi) for k in range(WIDE)]
            valid = [(encs[k] >= 0) & hits[k] for k in range(WIDE)]
            # first half = left subtree, second half = right; push the
            # far group first so the near group pops first (LIFO)
            half = WIDE // 2
            order_neg = tuple(range(WIDE))
            order_pos = tuple(range(half, WIDE)) + tuple(range(half))
            for j in range(WIDE):
                ek = jnp.where(sneg, encs[order_neg[j]],
                               encs[order_pos[j]])
                vk = jnp.where(sneg, valid[order_neg[j]],
                               valid[order_pos[j]])

                @pl.when(vk)
                def _(sp2=sp2, ek=ek):
                    stack_ref[sp2] = ek

                sp2 = jnp.where(vk, sp2 + 1, sp2)
            return sp2

        sp2 = jax.lax.cond(do_leaf, lambda s2: s2, wide_fn, sp2)
        done2 = jnp.logical_not(jnp.any(bi < 0)) if any_hit else done
        return (sp2, done2, bt, bi)

    # root: enter unconditionally (one possibly-wasted step on a missed
    # scene bbox is cheaper than a pre-loop test)
    _, _, bt, bi = jax.lax.while_loop(
        cond, body, (jnp.int32(1), False, best_t0, best_i0))
    t_out[:, :] = bt
    i_out[:, :] = bi


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def bvh_traverse_pallas(meta, nbounds, tris, o, d, tmax, n_nodes, n_tris,
                        any_hit):
    """o,d: (R,3); returns (t (R,), leaf_tri_idx (R,))."""
    return _impl(meta, nbounds, tris, o, d, tmax, any_hit=any_hit)


def _fwd(meta, nbounds, tris, o, d, tmax, n_nodes, n_tris, any_hit):
    out = _impl(meta, nbounds, tris, o, d, tmax, any_hit=any_hit)
    shapes_ = jax.tree_util.tree_map(
        lambda x: (x.shape, x.dtype),
        (meta, nbounds, tris, o, d, tmax, n_nodes, n_tris))
    return out, shapes_


def _bwd(any_hit, shapes_, g):
    return tuple(jnp.zeros(s, dt) for (s, dt) in shapes_)


bvh_traverse_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret",
                                             "rows"))
def _impl(meta, nbounds, tris, o, d, tmax, *, any_hit, interpret=False,
          rows=ROWS):
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
        _traverse_kernel, any_hit=any_hit,
        gamma3x2=float(2.0 * np.asarray(vecmath.gamma(3))))
    table_spec = lambda shape, space: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=space)
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        kernel,
        grid=(Rpad // block,),
        in_specs=[table_spec(meta.shape, pltpu.SMEM),
                  table_spec(nbounds.shape, pltpu.SMEM),
                  table_spec(tris.shape, pltpu.VMEM)] + [ray_spec] * 10,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Rpad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Rpad // LANES, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(meta, nbounds, tris, *comps, tmax2)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]


def _collapse_tree(lo, hi, right, count, axis, max_leaf=PACKET_LEAF_MAX):
    """Collapse subtrees of ≤ max_leaf prims into single leaves,
    producing a new flat DFS tree (host-side, numpy).

    The builder's DFS leaf ordering makes every subtree's triangles a
    CONTIGUOUS range, so a collapsed leaf is just (start, count)."""
    n = right.shape[0]
    start = np.zeros(n, np.int64)
    end = np.zeros(n, np.int64)
    # post-order: children appear after parents in DFS order, so a
    # reverse sweep sees children before parents
    for i in range(n - 1, -1, -1):
        if count[i] > 0:
            start[i] = right[i]
            end[i] = right[i] + count[i]
        else:
            start[i] = start[i + 1]
            end[i] = end[right[i]]
    out = dict(lo=[], hi=[], right=[], count=[], axis=[])

    def emit(i):
        me = len(out["lo"])
        out["lo"].append(lo[i])
        out["hi"].append(hi[i])
        sub = end[i] - start[i]
        if count[i] > 0 or sub <= max_leaf:
            out["right"].append(int(start[i]))
            out["count"].append(int(sub))
            out["axis"].append(0)
            return me
        out["right"].append(-1)   # patched after left subtree emitted
        out["count"].append(0)
        out["axis"].append(int(axis[i]))
        emit(i + 1)
        out["right"][me] = len(out["lo"])
        emit(int(right[i]))
        return me

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, n + 64))
    try:
        emit(0)
    finally:
        sys.setrecursionlimit(old)
    return (np.asarray(out["lo"], np.float32),
            np.asarray(out["hi"], np.float32),
            np.asarray(out["right"], np.int64),
            np.asarray(out["count"], np.int64),
            np.asarray(out["axis"], np.int64))


def pack_bvh(lo, hi, right, count, axis, v0, v1, v2):
    """Host-side packing of a flat DFS BVH into the BVH4 kernel layout.

    The binary tree is first collapsed to PACKET_LEAF_MAX-triangle
    leaves (_collapse_tree), then pairs of binary levels merge into
    4-wide nodes: each wide node's (up to) four slots' bounds go into an
    SMEM f32 table ((24, Nw): 6 scalars per slot) and the slot
    encodings + parent split axis into an SMEM int32 table ((5, Nw)).
    Leaf triangles are repacked into aligned static-lane VMEM blocks
    (v0|e1|e2|leaf-ordered-index, 12 tris per row).

    Returns (meta (5,Nw) i32 [SMEM], nbounds (24,Nw) f32 [SMEM],
    tris (n_leaf*LEAF_BLOCK_ROWS, 128) f32 [VMEM])."""
    lo, hi, right, count, axis = _collapse_tree(
        np.asarray(lo), np.asarray(hi), np.asarray(right, np.int64),
        np.asarray(count, np.int64), np.asarray(axis, np.int64))
    n = right.shape[0]
    e1 = v1 - v0
    e2 = v2 - v0

    # ---- leaf blocks (block id per binary leaf)
    leaves = np.where(count > 0)[0]
    n_leaf = max(len(leaves), 1)
    br = LEAF_BLOCK_ROWS
    blocks = np.zeros((n_leaf * br, LANES), np.float32)
    block_id = np.full(n, -1, np.int64)
    for b, i in enumerate(leaves):
        st = int(right[i])
        cn = int(count[i])
        block_id[i] = b
        for k in range(cn):
            r, base = divmod(k, TRIS_PER_LEAF_ROW)
            blocks[br * b + r, base * TRI_F:base * TRI_F + 3] = v0[st + k]
            blocks[br * b + r,
                   base * TRI_F + 3:base * TRI_F + 6] = e1[st + k]
            blocks[br * b + r,
                   base * TRI_F + 6:base * TRI_F + 9] = e2[st + k]
            blocks[br * b + r, base * TRI_F + 9] = float(st + k)

    # ---- wide (BVH4) nodes
    wmeta = []      # rows of 5 ints: 4 slot encodings + parent axis
    wbounds = []    # rows of 24 floats

    def leaf_enc(i):
        return int(block_id[i]) << META_AXIS_SHIFT | int(count[i])

    def expand(i, levels):
        """Expand binary node i to ≤2^levels descendant slots."""
        if levels == 0 or count[i] > 0:
            return [int(i)]
        return (expand(int(i) + 1, levels - 1)
                + expand(int(right[i]), levels - 1))

    wide_levels = {8: 3, 4: 2}[WIDE]

    def make_wide(b):
        """Binary interior (or lone-leaf root) → wide node id."""
        wid = len(wmeta)
        wmeta.append([-1] * WIDE + [0])
        wbounds.append(np.zeros(NODE_F, np.float32))
        if count[b] > 0:            # degenerate root-leaf
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
                wmeta[wid][k] = make_wide(si) << META_AXIS_SHIFT
        wmeta[wid][WIDE] = int(axis[b])
        return wid

    import sys
    old_lim = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_lim, n + 64))
    try:
        make_wide(0)
    finally:
        sys.setrecursionlimit(old_lim)

    nw = len(wmeta)
    # worst-case stack requirement: popping a wide node pushes up to
    # `c` children (net +c-1), so a deep skewed tree can exceed the old
    # 3*depth+1 intuition. U[w] = slots used at/above w's own slot while
    # its subtree runs; adversarial pop order bound = (c-1) + max(child U).
    # Children are created after parents (pre-order), so a reverse sweep
    # sees children first.
    umax = np.ones(nw, np.int64)
    for wid in range(nw - 1, -1, -1):
        child_u = [1 if (e & META_CNT_MASK) > 0
                   else umax[e >> META_AXIS_SHIFT]
                   for e in wmeta[wid][:WIDE] if e >= 0]
        if child_u:
            umax[wid] = (len(child_u) - 1) + max(child_u)
    if int(umax[0]) > STACK:
        raise ValueError(
            f"BVH4 packet tree needs a {int(umax[0])}-deep traversal "
            f"stack (> STACK={STACK}); raise bvh_pallas.STACK for this "
            "scene")
    meta = np.asarray(wmeta, np.int32).T.copy()          # (W+1, Nw)
    nbounds = np.ascontiguousarray(
        np.asarray(wbounds, np.float32).T)               # (24, Nw)
    return meta, nbounds, blocks
