"""TPU-fast row gathers for small tables.

Why: on TPU, `table[idx]` with a per-ray index array compiles to an XLA
gather whose indices must live in scalar memory (SMEM) — the profile of the
bench program (PROFILE_r03.md) shows each such gather costing 8-30 ms at
R=524k (HBM→SMEM index copies + scalar-core addressing), ~1000× off the
VPU's streaming speed. For the small tables a renderer gathers per ray
(material rows, light rows, per-primitive ids, triangle vertices of a small
scene), a one-hot matmul `onehot(idx, N) @ table` is a pure
vector/matrix-unit streaming op: 0.02-0.04 ms for the same shapes.

`gather_rows` picks one-hot for N ≤ `max_onehot` and falls back to the
plain take above it (large tables amortize the index copy; the BVH path
gathers per-node, not per-ray). Integer/bool tables ride the same matmul
(values < 2^24 are exact in f32 — all id/tag tables qualify); wider
integers (e.g. Sobol matrices) must keep plain takes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = Any

MAX_ONEHOT = 512
# below this row count an unrolled where-chain beats the one-hot matmul:
# it fuses into consumers with no (R,N) intermediate or relayout copies
MAX_SELECT = 32


def _apply_select(idx: Array, leaf: Array) -> Array:
    """Unrolled where-chain gather: leaf (N, ...), idx (R,) → (R, ...)."""
    n = leaf.shape[0]
    cond_shape = idx.shape + (1,) * (leaf.ndim - 1)
    out = jnp.broadcast_to(leaf[0], idx.shape + leaf.shape[1:])
    for j in range(1, n):
        out = jnp.where((idx == j).reshape(cond_shape), leaf[j], out)
    return out


def _apply_onehot(oh: Array, leaf: Array) -> Array:
    """(R,N) one-hot @ (N,...) table → (R,...), dtype-preserving."""
    n = leaf.shape[0]
    flat = leaf.reshape(n, -1)
    if leaf.dtype == jnp.bool_:
        out = oh @ flat.astype(jnp.float32)
        out = out > 0.5
    elif jnp.issubdtype(leaf.dtype, jnp.integer):
        out = oh @ flat.astype(jnp.float32)
        out = jnp.rint(out).astype(leaf.dtype)
    else:
        out = (oh @ flat.astype(jnp.float32)).astype(leaf.dtype)
    return out.reshape(oh.shape[:1] + leaf.shape[1:])


def gather_rows(table: Array, idx: Array, max_onehot: int = MAX_ONEHOT
                ) -> Array:
    """`table[idx]` for idx (R,) int — one-hot matmul when the table is
    small (avoids the TPU SMEM-index gather path), plain take otherwise.
    idx is clipped into range."""
    n = table.shape[0]
    idx = jnp.clip(idx, 0, n - 1)
    if n > max_onehot or idx.ndim != 1:
        return table[idx]
    if n <= MAX_SELECT:
        return _apply_select(idx, table)
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    return _apply_onehot(oh, table)


def make_row_gather(n: int, idx: Array, max_onehot: int = MAX_ONEHOT):
    """Return g(a) gathering rows idx from any (n, ...) array, sharing one
    one-hot matrix across calls (small n) or plain takes (large n)."""
    idx = jnp.clip(idx, 0, n - 1)
    if idx.ndim == 1 and n <= MAX_SELECT:
        return lambda a: _apply_select(idx, a)
    if idx.ndim == 1 and n <= max_onehot:
        oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
        return lambda a: _apply_onehot(oh, a)
    return lambda a: a[idx]


def gather_tree(tree, idx: Array, n: int, max_onehot: int = MAX_ONEHOT):
    """Gather rows idx from every (n, ...) leaf of a pytree via the
    fastest applicable strategy; leaves whose leading dim ≠ n pass
    through unchanged."""
    g = make_row_gather(n, idx, max_onehot)
    return jax.tree_util.tree_map(
        lambda a: g(a) if (hasattr(a, "shape") and a.ndim >= 1
                           and a.shape[0] == n) else a, tree)


def select_component(v: Array, ax: Array) -> Array:
    """v[..., ax] for a per-element axis index ax ∈ {0..C-1}: one-hot dot
    instead of take_along_axis (same SMEM-index hazard)."""
    c = v.shape[-1]
    oh = jax.nn.one_hot(ax, c, dtype=v.dtype if jnp.issubdtype(
        v.dtype, jnp.floating) else jnp.float32)
    out = jnp.sum(v * oh, axis=-1)
    return out if jnp.issubdtype(v.dtype, jnp.floating) \
        else jnp.rint(out).astype(v.dtype)


def select_row(v: Array, idx: Array) -> Array:
    """v[r, idx[r]] for v (R, M, ...) with small M: unrolled where-chain
    over the M slots (replaces advanced-index gathers; fuses fully)."""
    m = v.shape[1]
    cond_shape = idx.shape + (1,) * (v.ndim - 2)
    out = v[:, 0]
    for j in range(1, m):
        out = jnp.where((idx == j).reshape(cond_shape), v[:, j], out)
    return out


def select_along_last(v: Array, idx: Array) -> Array:
    """take_along_axis(v, idx[..., None], -1)[..., 0] without the gather:
    one-hot dot over the last axis (use when that axis is small — P
    primitives of one family, C components)."""
    return select_component(v, idx)
