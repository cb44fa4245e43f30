"""Killeroo end-to-end TPU benchmark + packet-kernel validation artifact.

BASELINE config 3 (killeroo-simple.pbrt: ~66k-triangle loopsubdiv mesh,
BVH, plastic, mypath d3). Produces KILLEROO_r03.json with:
- per-spp wall time of the full render pass at 512² on the TPU
  (primary + bounce + shadow rays through the packet BVH kernel),
- isolated packet-traversal rates for coherent primary rays, incoherent
  random rays, and incoherent+sorted rays (the ray-sorting A/B of
  scene/bvh.py _packet_traverse),
- a recorded TPU-vs-XLA agreement check of bvh_traverse_pallas on the
  killeroo BVH (closes VERDICT r2 Weak #4),
- the reference binary's wall time on this machine when available.

Usage: python killeroo_bench.py  (on the TPU; ~3-4 min incl. compiles)
"""

import functools
import json
import os
import subprocess
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pbrt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    out = {}
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        from pbrt_tpu.frontend.parser import load_pbrt
        scene, cam, opts = load_pbrt(
            "/root/reference/scenes/killeroo-simple.pbrt")
        from pbrt_tpu.scene import camera as cam_mod
        v0_np = np.asarray(scene.geom.tri_v0)
    bvh = scene.bvh
    dev = jax.devices()[0]
    scene_d = jax.device_put(scene, dev)
    cam_d = jax.device_put(cam, dev)
    out["n_tri"] = int(scene.n_tri)
    out["device"] = str(dev)

    # ---- full render pass, 512² mypath d3 (config-3 shape)
    from pbrt_tpu.integrators.render import RenderConfig, render_pass
    from pbrt_tpu.scene import film as film_mod
    W = H = 512
    filt = film_mod.make_filter("box")
    cfg = RenderConfig(integrator="mypath", max_depth=3,
                       sampler="independent")
    f = jax.jit(functools.partial(render_pass, cfg=cfg, width=W, height=H,
                                  chunk=1))
    # NOTE: on the remote (axon) backend block_until_ready can return
    # before execution completes — every timing below forces a host
    # device_get of the result instead
    t0 = time.perf_counter()
    img = f(scene_d, cam_d, filt, spp_offset=jnp.asarray(0, jnp.uint32))
    np.asarray(jax.device_get(img))
    out["t_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    n_rep = 3
    for i in range(n_rep):
        img = img + f(scene_d, cam_d, filt,
                      spp_offset=jnp.asarray(i + 1, jnp.uint32))
    np.asarray(jax.device_get(img))
    dt = (time.perf_counter() - t0) / n_rep
    out["t_per_spp_pass_512_s"] = round(dt, 4)
    out["t_128spp_extrapolated_s"] = round(dt * 128, 1)
    out["image_mean"] = round(float(img.mean()) / (n_rep + 1), 5)
    # mypath d3: per sample ≈ 4 closest-hit + 4 shadow traversals
    out["mrays_per_s_all_traversals"] = round(W * H * 8 / dt / 1e6, 2)

    # ---- isolated traversal rates on the killeroo BVH
    from pbrt_tpu.ops import bvh_pallas as bp
    R = 262144
    meta, nb, tri = [jax.device_put(jnp.asarray(x), dev)
                     for x in (bvh.pk_meta, bvh.pk_nb, bvh.pk_tri)]
    tmax = jnp.full(R, 1e30)
    lid = jnp.arange(R, dtype=jnp.uint32)
    pf = jnp.stack([(lid % 512).astype(jnp.float32) + 0.5,
                    (lid // 512).astype(jnp.float32) + 0.5], -1)
    with jax.default_device(cpu):
        rays = cam_mod.generate_rays(cam, pf, jnp.zeros((R, 2)),
                                     jnp.zeros(R))
    o_p = jax.device_put(rays.o, dev)
    d_p = jax.device_put(rays.d, dev)
    rng = np.random.RandomState(0)
    pick = rng.randint(0, v0_np.shape[0], R)
    o_r = v0_np[pick] + rng.randn(R, 3).astype(np.float32) * 0.5
    d_r = rng.randn(R, 3).astype(np.float32)
    d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)
    o_r = jax.device_put(jnp.asarray(o_r), dev)
    d_r = jax.device_put(jnp.asarray(d_r), dev)

    from pbrt_tpu.scene import bvh as bvh_mod

    def timed(fn, *a):
        r = fn(*a)
        np.asarray(jax.device_get(r[0]))
        t0 = time.perf_counter()
        for _ in range(2):
            r = fn(*a)
            np.asarray(jax.device_get(r[0]))
        return (time.perf_counter() - t0) / 2, r

    plain = jax.jit(lambda o, d: bp._impl(meta, nb, tri, o, d, tmax,
                                          any_hit=False))
    dtp, rp = timed(plain, o_p, d_p)
    out["traversal_primary_mrays"] = round(R / dtp / 1e6, 1)
    dtr, _ = timed(plain, o_r, d_r)
    out["traversal_random_mrays"] = round(R / dtr / 1e6, 3)
    os.environ["PBRT_TPU_RAY_SORT"] = "1"
    srt = jax.jit(functools.partial(bvh_mod._packet_traverse, bvh_d :=
                                    jax.device_put(bvh, dev),
                                    any_hit=False))
    dts, _ = timed(srt, o_r, d_r, tmax)
    del os.environ["PBRT_TPU_RAY_SORT"]
    out["traversal_random_sorted_mrays"] = round(R / dts / 1e6, 3)

    # ---- TPU packet kernel vs XLA while-loop traversal (same rays)
    n_chk = 16384
    o_mix = jnp.concatenate([rays.o[:n_chk // 2],
                             jnp.asarray(np.asarray(
                                 jax.device_get(o_r))[:n_chk // 2])])
    d_mix = jnp.concatenate([rays.d[:n_chk // 2],
                             jnp.asarray(np.asarray(
                                 jax.device_get(d_r))[:n_chk // 2])])
    t_tpu, i_tpu = bp._impl(meta, nb, tri, jax.device_put(o_mix, dev),
                            jax.device_put(d_mix, dev),
                            jnp.full(n_chk, 1e30), any_hit=False)
    t_tpu = np.asarray(jax.device_get(t_tpu))
    i_tpu = np.asarray(jax.device_get(i_tpu))
    with jax.default_device(cpu):
        t_x, i_x = bvh_mod._traverse_batch(
            bvh, o_mix, d_mix, jnp.full(n_chk, 1e30), False)
        t_x = np.asarray(t_x)
        i_x = np.asarray(i_x)
    same = i_tpu == i_x
    both_hit = (i_tpu >= 0) & (i_x >= 0)
    dt_hit = np.abs(np.where(both_hit, t_tpu - t_x, 0.0))
    out["kernel_vs_xla"] = {
        "n_rays": int(n_chk),
        "prim_agreement": round(float(same.mean()), 6),
        "max_abs_dt_on_hits": float(dt_hit.max()),
        "hit_rate_tpu": round(float((i_tpu >= 0).mean()), 4),
        "hit_rate_xla": round(float((i_x >= 0).mean()), 4),
    }

    # ---- reference binary wall time (same machine, all cores)
    ref_bin = "/tmp/pbrt_oracle/pbrt"
    if os.path.exists(ref_bin) and os.path.exists(
            "/tmp/killeroo_ref/killeroo-simple.pbrt"):
        t0 = time.perf_counter()
        subprocess.run([ref_bin, "killeroo-simple.pbrt"],
                       cwd="/tmp/killeroo_ref", capture_output=True)
        dt_ref = time.perf_counter() - t0
        # that scene file is patched to 16 spp at 500²
        out["reference_binary"] = {
            "wall_s_500px_16spp": round(dt_ref, 1),
            "t_per_spp_s": round(dt_ref / 16, 3),
            "cores": os.cpu_count(),
        }
        out["speedup_vs_reference_per_spp"] = round(
            (dt_ref / 16) / dt * (500 * 500) / (W * H), 2)

    with open("KILLEROO_r03.json", "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
