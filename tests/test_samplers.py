"""Low-discrepancy sampler fidelity tests.

Mirrors the reference's tests/sampling.cpp: elementary-interval ((0,2)-net)
properties, GlobalSampler pixel-enumeration invariants for Halton
(samplers/halton.cpp:97-127) and Sobol (SobolIntervalToIndex,
core/lowdiscrepancy.h:229-249), and generator-matrix validity for the
generated Sobol' tables (replacing core/sobolmatrices.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.samplers import (make_halton_global, make_sobol_global,
                               make_sampler)
from pbrt_tpu.samplers.sobolmatrices import N_SOBOL_DIMS, SOBOL_MATRICES


def _ri(base, a, nd=32):
    v, ib, ibn = 0.0, 1.0 / base, 1.0
    for _ in range(nd):
        a, d = divmod(a, base)
        ibn *= ib
        v += d * ibn
    return v


def _sobol_np(a, d):
    v, i = np.uint32(0), 0
    while a:
        if a & 1:
            v ^= SOBOL_MATRICES[d][i]
        a >>= 1
        i += 1
    return int(v) / 2**32


def test_sobol_matrices_are_02_net():
    """Dims (0,1) form a (0,2)-net in base 2: every 2^j x 2^(8-j) elementary
    interval of the first 256 points holds exactly one point
    (tests/sampling.cpp ElementaryIntervals)."""
    pts = [(_sobol_np(a, 0), _sobol_np(a, 1)) for a in range(256)]
    for j in range(9):
        cells = {(int(x * (1 << j)), int(y * (1 << (8 - j))))
                 for x, y in pts}
        assert len(cells) == 256, f"elementary interval 2^{j} failed"


def test_sobol_matrices_1d_stratification():
    """Every dimension is a (0,1)-sequence: first 2^k points hit all 2^k
    strata (nonsingular generator matrices)."""
    for d in range(0, N_SOBOL_DIMS, 11):
        pts = [_sobol_np(a, d) for a in range(128)]
        assert len({int(p * 128) for p in pts}) == 128, f"dim {d}"


def test_halton_global_index_enumeration():
    """GetIndexForSample agrees with brute-force enumeration of the global
    Halton sequence bucketed by pixel (samplers/halton.cpp:97-116)."""
    W, H = 40, 30
    s = make_halton_global((W, H), 8)
    bs0, bs1 = s.base_scales
    stride = s.stride
    buckets = {}
    for i in range(stride * 6):
        key = (int(_ri(2, i) * bs0), int(_ri(3, i) * bs1))
        buckets.setdefault(key, []).append(i)
    rng = np.random.RandomState(0)
    pids, sids, expect = [], [], []
    for _ in range(100):
        x, y, j = rng.randint(W), rng.randint(H), rng.randint(5)
        pids.append(y * W + x)
        sids.append(j)
        expect.append(buckets[(x % bs0, y % bs1)][j])
    got = np.asarray(s.index_for(jnp.asarray(pids, jnp.uint32),
                                 jnp.asarray(sids, jnp.uint32)))
    assert (got == np.asarray(expect)).all()


def test_halton_global_dims01_strip_pixel():
    """Dims 0/1 return the *within-pixel* offset: RadicalInverse of the
    index with the pixel digits stripped (halton.cpp:118-127)."""
    W, H = 40, 30
    s = make_halton_global((W, H), 8)
    bs0, bs1 = s.base_scales
    e0, _ = s.base_exponents
    pids = jnp.asarray([0, 41, 777, W * H - 1], jnp.uint32)
    sids = jnp.asarray([0, 1, 3, 7], jnp.uint32)
    idx = np.asarray(s.index_for(pids, sids))
    u0 = np.asarray(s(pids, sids, 0))
    u1 = np.asarray(s(pids, sids, 1))
    ref0 = np.array([_ri(2, int(i) >> e0) for i in idx], np.float32)
    ref1 = np.array([_ri(3, int(i) // bs1) for i in idx], np.float32)
    np.testing.assert_allclose(u0, ref0, atol=1e-5)
    np.testing.assert_allclose(u1, ref1, atol=1e-5)
    assert (u0 >= 0).all() and (u0 < 1).all()


def test_halton_traced_dim_matches_static():
    """The traced-dim path (bounce-indexed dims inside fori_loop) must
    produce the identical stream as the static path."""
    import jax

    s = make_halton_global((32, 32), 8)
    pids = jnp.arange(64, dtype=jnp.uint32) * 13 % (32 * 32)
    sids = jnp.arange(64, dtype=jnp.uint32) % 8
    for dim in (2, 7, 33, 200):
        static = s(pids, sids, dim, 3)

        def traced(d):
            return s(pids, sids, d, 3)

        dyn = jax.jit(traced)(jnp.asarray(dim, jnp.uint32))
        np.testing.assert_allclose(np.asarray(static), np.asarray(dyn),
                                   atol=2e-5)


def test_sobol_global_pixel_mapping():
    """SobolIntervalToIndex invariants (lowdiscrepancy.h:229-249): the
    returned index has frame in its high bits and its dims (0,1) land in
    the requested pixel."""
    W, H = 24, 17
    sb = make_sobol_global((W, H), 16)
    m = sb.log2_resolution
    res = 1 << m
    rng = np.random.RandomState(1)
    pids, sids = [], []
    for _ in range(100):
        pids.append(rng.randint(H) * W + rng.randint(W))
        sids.append(rng.randint(16))
    idx = np.asarray(sb.index_for(jnp.asarray(pids, jnp.uint32),
                                  jnp.asarray(sids, jnp.uint32)))
    for k in range(100):
        x, y, f = pids[k] % W, pids[k] // W, sids[k]
        i = int(idx[k])
        assert i >> (2 * m) == f
        assert int(_sobol_np(i, 0) * res) == x
        assert int(_sobol_np(i, 1) * res) == y


def test_sobol_global_dims01_in_pixel():
    W, H = 24, 17
    sb = make_sobol_global((W, H), 16)
    pids = jnp.asarray([0, 5, 100, W * H - 1], jnp.uint32)
    sids = jnp.asarray([0, 3, 9, 15], jnp.uint32)
    for dim in (0, 1):
        u = np.asarray(sb(pids, sids, dim))
        assert (u >= 0).all() and (u < 1).all()


def test_sobol_traced_dim_matches_static():
    import jax

    sb = make_sobol_global((32, 32), 16)
    pids = jnp.arange(64, dtype=jnp.uint32) * 7 % (32 * 32)
    sids = jnp.arange(64, dtype=jnp.uint32) % 16
    for dim in (2, 9, 50):
        static = sb(pids, sids, dim)
        dyn = jax.jit(lambda d: sb(pids, sids, d))(
            jnp.asarray(dim, jnp.uint32))
        np.testing.assert_allclose(np.asarray(static), np.asarray(dyn),
                                   atol=0)


def test_global_samplers_render_mean():
    """A tiny furnace-style render with each global sampler stays unbiased
    (analytic_scenes.cpp pattern): mean of dim-0 samples over all pixels
    and sample indices ≈ 0.5 with LDS-fast convergence."""
    for maker in (make_halton_global, make_sobol_global):
        s = maker((16, 16), 16)
        pid = jnp.repeat(jnp.arange(256, dtype=jnp.uint32), 16)
        sid = jnp.tile(jnp.arange(16, dtype=jnp.uint32), 256)
        for dim in (0, 1, 2, 5):
            u = np.asarray(s(pid, sid, dim))
            assert abs(u.mean() - 0.5) < 0.01, (maker.__name__, dim)


def test_make_sampler_dispch():
    s = make_sampler("halton", 8, resolution=(32, 24))
    assert hasattr(s, "index_for")
    s2 = make_sampler("sobol", 8, resolution=(32, 24))
    assert hasattr(s2, "log2_resolution")
    s3 = make_sampler("halton", 8)  # no resolution → CP-rotation fallback
    assert not hasattr(s3, "index_for")
    u = np.asarray(s3(jnp.arange(8, dtype=jnp.uint32),
                      jnp.zeros(8, jnp.uint32), 3))
    assert (u >= 0).all() and (u < 1).all()


def test_maxmindist_net_properties():
    """MaxMinDistSampler first pair (samplers/maxmin.h:74-80 +
    CMaxMinDist, core/lowdiscrepancy.cpp:249): x_i = i/spp stratified,
    y = C·i stratified, one point per 4×4 elementary interval, and the
    toroidal min distance of the 16-point set equals the published
    √13/16 of the max-min-distance construction."""
    spp = 16
    s = make_sampler("maxmindist", spp=spp)
    pid = jnp.zeros(spp, jnp.uint32) + 7
    idx = jnp.arange(spp, dtype=jnp.uint32)
    x = np.asarray(s(pid, idx, 0, 0))
    y = np.asarray(s(pid, idx, 1, 0))
    assert (np.bincount((x * spp).astype(int), minlength=spp) == 1).all()
    assert (np.bincount((y * spp).astype(int), minlength=spp) == 1).all()
    cells = (x * 4).astype(int) * 4 + (y * 4).astype(int)
    assert (np.bincount(cells, minlength=16) == 1).all()
    pts = np.stack([x, y], 1)
    d = np.abs(pts[:, None, :] - pts[None, :, :])
    d = np.minimum(d, 1.0 - d)
    dist = np.sqrt((d ** 2).sum(-1)) + np.eye(spp) * 10
    np.testing.assert_allclose(dist.min(), np.sqrt(13.0) / 16.0, atol=1e-6)


def test_maxmindist_pixel_shuffle_and_fallback():
    """Per-pixel order shuffle is a permutation of the same point set
    (maxmin.cpp StartPixel Shuffle); dims >= 2 fall back to the scrambled
    (0,2) pair (VanDerCorput/Sobol2D split)."""
    spp = 16
    s = make_sampler("maxmindist", spp=spp)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    xa = np.asarray(s(jnp.zeros(spp, jnp.uint32) + 3, idx, 0, 0))
    xb = np.asarray(s(jnp.zeros(spp, jnp.uint32) + 9, idx, 0, 0))
    np.testing.assert_allclose(np.sort(xa), np.sort(xb), atol=0)
    assert not np.allclose(xa, xb)
    zt = make_sampler("zerotwosequence", spp=spp)
    pid = jnp.zeros(spp, jnp.uint32) + 3
    np.testing.assert_allclose(np.asarray(s(pid, idx, 4, 1)),
                               np.asarray(zt(pid, idx, 4, 1)), atol=0)
