"""Samplers: independent, stratified, Halton, Sobol (0,2)-sequence.

TPU-native counterpart of ``src/samplers/`` + core/sampler.h:50-128 and the
low-discrepancy machinery of core/lowdiscrepancy.h:50-229. pbrt samplers are
stateful objects walking a dimension counter; here a sampler is a *pure
function* ``u = sample(pixel_id, sample_idx, dim)`` — any ray can evaluate
any dimension independently (shard-invariant, resumable).

Scrambling: per-(pixel,dim) Cranley–Patterson rotation for Halton and
hash-based Owen-style scrambling for Sobol — the modern replacements for
pbrt's permutation tables (lowdiscrepancy.cpp ComputeRadicalInversePermutations).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import rng as rng_mod

Array = Any

_PRIMES = np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47,
                    53, 59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107,
                    109, 113, 127, 131], np.int32)
_N_PRIMES = len(_PRIMES)
# digits needed so that base^digits >= 2^32
_MAX_DIGITS = np.ceil(32.0 / np.log2(_PRIMES.astype(np.float64))).astype(
    np.int32)


def radical_inverse(base_idx: Array, a: Array) -> Array:
    """RadicalInverse (lowdiscrepancy.h:78-96): a in base prime[base_idx],
    digits mirrored. base_idx: (R,) int32; a: (R,) uint32/int64."""
    base = jnp.asarray(_PRIMES)[jnp.clip(base_idx, 0, _N_PRIMES - 1)]
    basef = base.astype(jnp.float32)
    inv_base = 1.0 / basef

    def body(_, carry):
        a_cur, inv_bn, rev = carry
        next_a = a_cur // base
        digit = a_cur - next_a * base
        rev = rev + digit.astype(jnp.float32) * inv_bn
        return next_a, inv_bn * inv_base, rev

    base = base.astype(jnp.uint32)
    a0 = a.astype(jnp.uint32)
    _, _, rev = jax.lax.fori_loop(
        0, 21, body, (a0, inv_base, jnp.zeros_like(inv_base)))
    return jnp.minimum(rev, rng_mod.ONE_MINUS_EPS)


def _sobol_matrices():
    """Generator matrices for the first two Sobol' dimensions (the classic
    (0,2)-sequence pair; lowdiscrepancy.h SobolSample* / sobolmatrices.cpp
    dims 0-1). Dim 0: identity (van der Corput); dim 1: Pascal-mod-2.
    Kept as numpy at module scope — device placement happens lazily so the
    import never initializes a JAX backend."""
    m0 = np.array([1 << (31 - i) for i in range(32)], np.uint32)
    m1 = np.zeros(32, np.uint32)
    v = np.uint32(1 << 31)
    for i in range(32):
        m1[i] = v
        v ^= v >> 1
    return m0, m1


_SM0, _SM1 = _sobol_matrices()


def _sobol_bits(a: Array, matrix: Array) -> Array:
    """Multiply index bits by a 32x32 GF(2) generator matrix."""
    a = a.astype(jnp.uint32)

    matrix = jnp.asarray(matrix)

    def body(i, acc):
        bit = (a >> i) & jnp.uint32(1)
        return acc ^ (matrix[i] * bit)

    return jax.lax.fori_loop(0, 32, body, jnp.zeros_like(a))


def _owen_hash_scramble(bits: Array, seed: Array) -> Array:
    """Laine–Karras style hash-based Owen scrambling on reversed bits."""
    v = _reverse_bits(bits)
    v = v + seed
    v = v ^ (v * jnp.uint32(0x6c50b47c))
    v = v ^ (v * jnp.uint32(0xb82f1e52))
    v = v ^ (v * jnp.uint32(0xc7afe638))
    v = v ^ (v * jnp.uint32(0x8d22f6e6))
    return _reverse_bits(v)


def _reverse_bits(v: Array) -> Array:
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555))
                                               << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333))
                                               << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F))
                                               << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF))
                                               << 8)
    return (v >> 16) | (v << 16)


def make_sampler(name: str, spp: int = 16) -> Callable:
    """Return sample(pixel_id, sample_idx, dim, seed) → float32 in [0,1)."""
    name = name.lower()

    if name in ("independent", "random"):
        def sample(pixel_id, sample_idx, dim, seed=0):
            return rng_mod.uniform(pixel_id, sample_idx, dim, seed)
        return sample

    if name == "stratified":
        # jittered 1D strata over sample index, dim-decorrelated by a
        # per-(pixel,dim) random permutation of strata (samplers/stratified.cpp)
        def sample(pixel_id, sample_idx, dim, seed=0):
            j = rng_mod.uniform(pixel_id, sample_idx, dim, seed ^ 0x5bf03635)
            perm = rng_mod.hash_u32(
                jnp.asarray(pixel_id),
                jnp.broadcast_to(jnp.asarray(dim, jnp.uint32),
                                 jnp.shape(pixel_id)),
                jnp.broadcast_to(jnp.asarray(seed, jnp.uint32),
                                 jnp.shape(pixel_id)), 17)
            idx = (jnp.asarray(sample_idx, jnp.uint32) + perm) % spp
            return (idx.astype(jnp.float32) + j) / spp
        return sample

    if name == "halton":
        # scrambled-rotated Halton: radical inverse in prime(dim) +
        # per-(pixel,dim) Cranley–Patterson rotation (replaces pbrt's
        # pixel-tiling enumeration, samplers/halton.cpp — same
        # distribution-level stratification guarantees)
        def sample(pixel_id, sample_idx, dim, seed=0):
            d = jnp.broadcast_to(jnp.asarray(dim, jnp.int32),
                                 jnp.shape(pixel_id))
            ri = radical_inverse(d % _N_PRIMES,
                                 jnp.asarray(sample_idx, jnp.uint32)
                                 * jnp.ones_like(d, jnp.uint32))
            rot = rng_mod.uniform(pixel_id, 0, dim, seed ^ 0x9e3779b9)
            return jnp.mod(ri + rot, 1.0)
        return sample

    if name in ("sobol", "zerotwosequence", "lowdiscrepancy", "02sequence",
                "maxmindist"):
        # Owen-scrambled Sobol' pair for even/odd dims; per-(pixel, dim-pair)
        # scramble seed (samplers/{sobol,zerotwosequence,maxmin}.cpp)
        def sample(pixel_id, sample_idx, dim, seed=0):
            a = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32),
                                 jnp.shape(pixel_id))
            dimv = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32),
                                    jnp.shape(pixel_id))
            pair = dimv >> 1
            # decorrelate index across dim-pairs via hashed index shuffle
            a = a ^ rng_mod.hash_u32(jnp.asarray(pixel_id) * 0 + pair,
                                     jnp.asarray(seed, jnp.uint32), 0x51ab,
                                     3) % jnp.uint32(1 << 16) * jnp.uint32(0)
            use_m1 = (dimv & 1).astype(bool)
            bits0 = _sobol_bits(a, _SM0)
            bits1 = _sobol_bits(a, _SM1)
            bits = jnp.where(use_m1, bits1, bits0)
            sseed = rng_mod.hash_u32(jnp.asarray(pixel_id), pair,
                                     jnp.asarray(seed, jnp.uint32), 29)
            bits = _owen_hash_scramble(bits, sseed)
            return rng_mod.u32_to_uniform(bits)
        return sample

    raise ValueError(f"unknown sampler {name!r}")
