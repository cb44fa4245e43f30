"""Killeroo end-to-end TPU benchmark + packet-kernel validation artifact.

BASELINE config 3 (killeroo-simple.pbrt: ~66k-triangle loopsubdiv mesh,
BVH, plastic, mypath d3). Produces KILLEROO_r04.json with:
- per-spp wall time of the full render pass at 512² on the TPU
  (primary + bounce + shadow rays through the packet BVH kernel),
- isolated packet-traversal rates for coherent primary rays, incoherent
  random rays, and incoherent+sorted rays,
- a recorded TPU-vs-XLA agreement check of bvh_traverse_pallas on the
  killeroo BVH,
- a TPU-side exactness check of fastgather's one-hot window (33..512
  rows, values > 256 — the MXU-bf16 hazard class, r4 ADVICE #1),
- the reference binary's wall time on this machine when available.

Timing methodology (r4): single-call timings through the axon tunnel
carry a ~58 ms fixed sync/fetch cost (measured: primary-vs-random step
counts imply 368 ns/step + 58 ms/call). All rates below therefore time
the SLOPE between 1 and N chained in-program iterations, which cancels
the fixed cost; `t1_s` fields record the raw single-call wall time.

Usage: python killeroo_bench.py  (on the TPU; ~4-6 min incl. compiles)
"""

import functools
import json
import os
import subprocess
import time

import numpy as np


def slope(make_loop, n_big=9, reps=2):
    import jax
    f1, fN = make_loop(1), make_loop(n_big)
    ts = {}
    for name, f in (("t1", f1), ("tN", fN)):
        r = f()
        np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(jax.device_get(f()))
        ts[name] = (time.perf_counter() - t0) / reps
    return (ts["tN"] - ts["t1"]) / (n_big - 1), ts["t1"]


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
    fpass = functools.partial(render_pass, cfg=cfg, width=W, height=H,
                              chunk=1)

    def make_render_loop(n):
        @jax.jit
        def f():
            def step(j, acc):
                return acc + fpass(scene_d, cam_d, filt,
                                   spp_offset=j.astype(jnp.uint32))
            return jax.lax.fori_loop(0, n, step,
                                     jnp.zeros((H, W, 3), jnp.float32))
        return f

    t0 = time.perf_counter()
    dt, t1 = slope(make_render_loop, n_big=5)
    out["t_compile_s"] = round(time.perf_counter() - t0, 1)
    out["t_per_spp_pass_512_s"] = round(dt, 4)
    out["t_per_spp_single_call_s"] = round(t1, 4)
    out["t_128spp_extrapolated_s"] = round(dt * 128, 1)
    img = make_render_loop(1)()
    out["image_mean"] = round(float(np.asarray(
        jax.device_get(img)).mean()), 5)
    # mypath d3: per sample ≈ 4 closest-hit + 4 shadow traversals
    out["mrays_per_s_all_traversals"] = round(W * H * 8 / dt / 1e6, 2)

    # ---- isolated traversal rates on the killeroo BVH
    from pbrt_tpu.ops import bvh_pallas as bp
    R = 262144
    meta, nb, tri = [jax.device_put(jnp.asarray(x), dev)
                     for x in (bvh.pk_meta, bvh.pk_nb, bvh.pk_tri)]
    tmax = jax.device_put(jnp.full(R, 1e30, jnp.float32), dev)
    lid = jnp.arange(R, dtype=jnp.uint32)
    pf = jnp.stack([(lid % 512).astype(jnp.float32) + 0.5,
                    (lid // 512).astype(jnp.float32) + 0.5], -1)
    with jax.default_device(cpu):
        rays = cam_mod.generate_rays(cam, pf, jnp.zeros((R, 2)),
                                     jnp.zeros(R))
    rng = np.random.RandomState(0)
    pick = rng.randint(0, v0_np.shape[0], R)
    o_r_np = v0_np[pick] + rng.randn(R, 3).astype(np.float32) * 0.5
    d_r_np = rng.randn(R, 3).astype(np.float32)
    d_r_np /= np.linalg.norm(d_r_np, axis=1, keepdims=True)

    # octant+origin-Morton sort (the production _packet_traverse order)
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    oct_ = ((d_r_np[:, 0] < 0) * 4 + (d_r_np[:, 1] < 0) * 2
            + (d_r_np[:, 2] < 0)).astype(np.uint32)
    q = np.clip((o_r_np - o_r_np.min(0))
                / (o_r_np.max(0) - o_r_np.min(0) + 1e-9) * 1023.0, 0,
                1023).astype(np.uint32)
    morton = ((spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1)
              | spread(q[:, 2]))
    perm = np.argsort((oct_.astype(np.uint64) << 32)
                      | morton.astype(np.uint64), kind="stable")

    def trav_rate(o_np, d_np, n_big=9):
        o = jax.device_put(jnp.asarray(o_np), dev)
        d = jax.device_put(jnp.asarray(d_np), dev)

        def make_loop(n):
            @jax.jit
            def f():
                def step(j, acc):
                    t, _ = bp._impl(
                        meta, nb, tri, o, d,
                        tmax * (1.0 + j.astype(jnp.float32) * 1e-7),
                        any_hit=False)
                    return acc + t
                return jax.lax.fori_loop(0, n, step,
                                         jnp.zeros(R, jnp.float32))
            return f

        dt, _ = slope(make_loop, n_big=n_big)
        return R / dt / 1e6

    out["traversal_primary_mrays"] = round(
        trav_rate(np.asarray(rays.o), np.asarray(rays.d), n_big=17), 1)
    out["traversal_random_mrays"] = round(trav_rate(o_r_np, d_r_np,
                                                    n_big=5), 3)
    out["traversal_random_sorted_mrays"] = round(
        trav_rate(o_r_np[perm], d_r_np[perm], n_big=9), 3)

    # ---- TPU packet kernel vs XLA while-loop traversal (same rays)
    from pbrt_tpu.scene import bvh as bvh_mod
    n_chk = 16384
    o_mix = np.concatenate([np.asarray(rays.o)[:n_chk // 2],
                            o_r_np[:n_chk // 2]])
    d_mix = np.concatenate([np.asarray(rays.d)[:n_chk // 2],
                            d_r_np[:n_chk // 2]])
    t_tpu, i_tpu = bp._impl(meta, nb, tri,
                            jax.device_put(jnp.asarray(o_mix), dev),
                            jax.device_put(jnp.asarray(d_mix), dev),
                            jnp.full(n_chk, 1e30), any_hit=False)
    t_tpu = np.asarray(jax.device_get(t_tpu))
    i_tpu = np.asarray(jax.device_get(i_tpu))
    with jax.default_device(cpu):
        t_x, i_x = bvh_mod._traverse_batch(
            bvh, jnp.asarray(o_mix), jnp.asarray(d_mix),
            jnp.full(n_chk, 1e30), False)
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

    # ---- fastgather one-hot window exactness ON TPU (ADVICE r4 #1):
    # 300-row i32 table with values up to 2^20 — would mis-round to a
    # wrong row under the MXU's default bf16 f32 path
    from pbrt_tpu.ops import fastgather as fg
    tab_np = (np.arange(300, dtype=np.int64)[:, None] * 3517 % (1 << 20)
              ).astype(np.int32) + np.arange(4, dtype=np.int32)[None, :]
    idx_np = rng.randint(0, 300, 8192).astype(np.int32)
    tab = jax.device_put(jnp.asarray(tab_np), dev)
    idx = jax.device_put(jnp.asarray(idx_np), dev)
    got = np.asarray(jax.device_get(jax.jit(fg.gather_rows)(tab, idx)))
    ftab_np = rng.randn(300, 4).astype(np.float32)
    fgot = np.asarray(jax.device_get(jax.jit(fg.gather_rows)(
        jax.device_put(jnp.asarray(ftab_np), dev), idx)))
    out["fastgather_tpu_check"] = {
        "i32_rows_exact": bool((got == tab_np[idx_np]).all()),
        "f32_rows_exact": bool((fgot == ftab_np[idx_np]).all()),
    }

    # ---- reference binary wall time (same machine, all cores).
    # r5 (VERDICT r4 Weak #2): BEST OF 3 runs, all recorded — the r3/r4
    # committed artifacts carried single-shot timings that differed 2×
    # between rounds (0.546 vs 1.032 s/spp), doubling the headline.
    ref_bin = "/tmp/pbrt_oracle/pbrt"
    if os.path.exists(ref_bin) and not os.path.exists(
            "/tmp/killeroo_ref/killeroo-simple.pbrt"):
        # materialize the timed reference scene: killeroo-simple patched
        # to 16 spp (the shipped file is 4) — geometry includes sit low
        import re
        import shutil
        src = "/root/reference/scenes"
        os.makedirs("/tmp/killeroo_ref", exist_ok=True)
        try:
            with open(os.path.join(src, "killeroo-simple.pbrt")) as f:
                txt = f.read()
            txt = re.sub(r'"integer pixelsamples" \[\d+\]',
                         '"integer pixelsamples" [16]', txt)
            with open("/tmp/killeroo_ref/killeroo-simple.pbrt", "w") as f:
                f.write(txt)
            for aux in ("killeroo.pbrt", "geometry"):
                p = os.path.join(src, aux)
                d = os.path.join("/tmp/killeroo_ref", aux)
                if os.path.isdir(p) and not os.path.exists(d):
                    shutil.copytree(p, d)
                elif os.path.isfile(p) and not os.path.exists(d):
                    shutil.copy(p, d)
        except OSError:
            pass
    if os.path.exists(ref_bin) and os.path.exists(
            "/tmp/killeroo_ref/killeroo-simple.pbrt"):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run([ref_bin, "killeroo-simple.pbrt"],
                           cwd="/tmp/killeroo_ref", capture_output=True)
            runs.append(time.perf_counter() - t0)
        dt_ref = min(runs)
        # that scene file is patched to 16 spp at 500²
        out["reference_binary"] = {
            "wall_s_500px_16spp_best_of_3": round(dt_ref, 1),
            "wall_s_runs": [round(t, 1) for t in runs],
            "t_per_spp_s": round(dt_ref / 16, 3),
            "cores": os.cpu_count(),
        }
        out["speedup_vs_reference_per_spp"] = round(
            (dt_ref / 16) / out["t_per_spp_pass_512_s"]
            * (W * H) / (500 * 500), 2)

    with open("KILLEROO_r05.json", "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
