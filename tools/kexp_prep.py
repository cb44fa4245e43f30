"""Prep for packet-kernel experiments: build the killeroo BVH once on CPU
and cache the packed layouts + ray sets + XLA-reference traversal results
to /tmp/kexp.npz so each TPU experiment process starts in ~2 s.

Usage: JAX_PLATFORMS=cpu python tools/kexp_prep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pbrt_tpu.frontend.parser import load_pbrt
    from pbrt_tpu.scene import bvh as bvh_mod
    from pbrt_tpu.scene import camera as cam_mod

    scene, cam, opts = load_pbrt(
        "/root/reference/scenes/killeroo-simple.pbrt")
    bvh = scene.bvh
    v0_np = np.asarray(bvh.v0)

    R = 262144
    tmax = np.full(R, 1e30, np.float32)
    lid = jnp.arange(R, dtype=jnp.uint32)
    pf = jnp.stack([(lid % 512).astype(jnp.float32) + 0.5,
                    (lid // 512).astype(jnp.float32) + 0.5], -1)
    rays = cam_mod.generate_rays(cam, pf, jnp.zeros((R, 2)), jnp.zeros(R))
    o_p = np.asarray(rays.o)
    d_p = np.asarray(rays.d)
    rng = np.random.RandomState(0)
    pick = rng.randint(0, v0_np.shape[0], R)
    o_r = v0_np[pick] + rng.randn(R, 3).astype(np.float32) * 0.5
    d_r = rng.randn(R, 3).astype(np.float32)
    d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)

    # octant+origin-Morton sorted copy of the random set (sorted-traversal
    # ceiling; production sorts on-device)
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    oct_ = ((d_r[:, 0] < 0) * 4 + (d_r[:, 1] < 0) * 2
            + (d_r[:, 2] < 0)).astype(np.uint32)
    lo_o = o_r.min(0)
    hi_o = o_r.max(0)
    q = np.clip(((o_r - lo_o) / (hi_o - lo_o + 1e-9) * 1023.0), 0,
                1023).astype(np.uint32)
    morton = ((spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1)
              | spread(q[:, 2]))
    key = (oct_.astype(np.uint64) << 32) | morton.astype(np.uint64)
    perm = np.argsort(key, kind="stable")
    o_rs, d_rs = o_r[perm], d_r[perm]

    # XLA reference traversal for agreement checks (mixed rays)
    n_chk = 16384
    o_mix = np.concatenate([o_p[:n_chk // 2], o_r[:n_chk // 2]])
    d_mix = np.concatenate([d_p[:n_chk // 2], d_r[:n_chk // 2]])
    t_x, i_x = bvh_mod._traverse_batch(
        bvh, jnp.asarray(o_mix), jnp.asarray(d_mix),
        jnp.full(n_chk, 1e30), False)

    np.savez(
        "/tmp/kexp.npz",
        # binary flat tree (for repacking experiments)
        lo=np.asarray(bvh.lo), hi=np.asarray(bvh.hi),
        right=np.asarray(bvh.right), count=np.asarray(bvh.count),
        axis=np.asarray(bvh.axis),
        v0=np.asarray(bvh.v0), v1=np.asarray(bvh.v1),
        v2=np.asarray(bvh.v2),
        # current packed layout
        pk_meta=np.asarray(bvh.pk_meta), pk_nb=np.asarray(bvh.pk_nb),
        pk_tri=np.asarray(bvh.pk_tri),
        # rays
        o_p=o_p, d_p=d_p, o_r=o_r, d_r=d_r, o_rs=o_rs, d_rs=d_rs,
        tmax=tmax,
        o_mix=o_mix, d_mix=d_mix,
        t_x=np.asarray(t_x), i_x=np.asarray(i_x))
    print("saved /tmp/kexp.npz",
          {k: v.shape for k, v in np.load("/tmp/kexp.npz").items()})


if __name__ == "__main__":
    main()
