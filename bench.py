"""Benchmark: Mrays/s/chip forward+backward on the cornell portal scene.

Driver metric (BASELINE.json): "Mrays/s/chip fwd+bwd (cornell portal scene,
64spp)". The reference publishes no numbers (BASELINE.md); this self-measured
figure is tracked across rounds.

Ray accounting: the wavefront integrator traces, per sample per bounce, one
path-extension closest-hit plus two NEE closest-hits (light strategy +
BSDF-strategy MIS). All lanes do this work regardless of masks (no
compaction), so traced rays = W*H*spp*bounces*3 for the forward pass; the
backward pass re-traverses the same rays (VJP through every trace), counted
once more.

Exactly ONE XLA program is compiled (jit(value_and_grad(loss))) — remote TPU
compiles are the dominant cold-start cost, so fwd-only timing is derived from
the same program's value-only execution rather than compiling a second
program. Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time


def main():
    """Orchestrator: run the measurement in child processes with deadlines.

    The remote-TPU (axon) compile tunnel intermittently stalls on
    Mosaic/Pallas kernel compiles (the same program compiles in ~2 min or
    hangs >9 min across attempts; plain XLA is unaffected). A single shot
    would make the round's benchmark a coin flip, so: attempt the full
    Pallas path under a deadline, then retry, then fall back to the
    XLA-only intersect path (slower, but its compile avoids Mosaic). The
    persistent compile cache is shared, so any work a killed attempt
    finished is reused by the next one.
    """
    # budget ~580 s total (driver timeout): one full-speed attempt, then
    # the Mosaic-free fallback (measured cold: ~155 s, 5.4 Mrays/s vs
    # 12.0 for the Pallas path — same image mean, cross-validating both)
    attempts = [({}, 320), ({"PBRT_TPU_NO_PALLAS": "1"}, 225)]
    for env_extra, tmo in attempts:
        env = {**os.environ, **env_extra}
        try:
            p = subprocess.run([sys.executable, os.path.abspath(__file__),
                                "--worker"], timeout=tmo,
                               capture_output=True, text=True, env=env)
        except subprocess.TimeoutExpired:
            continue
        for line in reversed((p.stdout or "").splitlines()):
            if line.startswith("{"):
                print(line)
                return
    print(json.dumps({"metric": "Mrays/s/chip fwd+bwd (cornell portal "
                                "scene, 64spp)",
                      "value": None, "unit": "Mrays/s",
                      "vs_baseline": None,
                      "extra": {"error": "all attempts timed out "
                                         "(axon compile tunnel stall)"}}))


def worker():
    import jax

    # persistent compile cache: warm re-runs skip the remote TPU compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from pbrt_tpu.integrators.render import RenderConfig, render_pass
    from pbrt_tpu.scene import film as film_mod

    W = H = 256
    SPP = 64
    CHUNK = 32   # r3 scan: 8/16/32 -> 282/366/391 Mrays/s (bigger
                 # batches amortize per-op overhead; R = 2M lanes)
    MAX_DEPTH = 4          # bounces = max_depth + 1 loop iterations
    # build the scene on the host CPU backend: construction is many tiny
    # eager ops, and on the remote-TPU (axon) backend each one is a
    # round-trip remote compile (~80 s total); on CPU it is ~2 s
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        scene_cpu = ge._portal_scene()
        cam_cpu = ge._camera((W, H))
    dev = jax.devices()[0]
    scene = jax.device_put(scene_cpu, dev)
    cam = jax.device_put(cam_cpu, dev)
    filt = film_mod.make_filter("box")
    cfg = RenderConfig(integrator="path", max_depth=MAX_DEPTH)

    import dataclasses as dc

    def loss_fn(kd, emit, off):
        s = dc.replace(scene,
                       materials=dc.replace(scene.materials, kd=kd),
                       lights=dc.replace(scene.lights, emit=emit))
        return jnp.mean(render_pass(s, cam, filt, cfg, W, H, CHUNK, off))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    kd, emit = scene.materials.kd, scene.lights.emit
    # timing forces a host device_get each pass: on the remote (axon)
    # backend block_until_ready can return before execution completes,
    # silently under-measuring (caught in r3 against the on-chip
    # profiler's step timeline)
    t0 = time.perf_counter()
    v, g = grad_fn(kd, emit, jnp.asarray(0, jnp.uint32))
    jax.device_get((v, g))
    t_compile = time.perf_counter() - t0

    n_passes = SPP // CHUNK

    def run_chained(n):
        """n fwd+bwd passes with ONE host sync at the end. Each pass's
        loss accumulates on-device (data dependence keeps program order
        explicit); the compiled program computes grads every call whether
        or not the host fetches them."""
        acc = jnp.zeros(())
        for i in range(n):
            v, g = grad_fn(kd, emit, jnp.asarray(i * CHUNK, jnp.uint32))
            acc = acc + v
        return float(jax.device_get(acc))

    # r4 timing: the remote (axon) tunnel charges a ~60-190 ms fixed
    # sync/fetch cost per host round trip (measured via step-count
    # regression, KILLEROO_r04 methodology). A per-pass device_get loop
    # (r3) therefore over-reports per-pass time; the SLOPE between two
    # chained executions cancels the fixed cost while still forcing host
    # materialization of real results. r5: the fused-path pass is ~26 ms
    # (was 123), so the slope must span many more passes to stay above
    # the sync-cost session noise — 80 extra passes ≈ 2.1 s fused.
    # best-of-3 minima on both chain lengths: the tunnel sync cost is a
    # positive noise term, so minima estimate the fixed+linear costs
    # robustly (single-shot slopes ranged 0-32 ms/pass this session;
    # min-slopes reproduce to <1 ms)
    acc1 = run_chained(n_passes)
    extra = 80

    def best_of(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_chained(n)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_short = best_of(n_passes)
    t_long = best_of(n_passes + extra)
    t_pass = max(t_long - t_short, 1e-6) / extra
    t_fwdbwd = t_pass * n_passes       # time per full 64-spp fwd+bwd
    mean_acc = acc1

    bounces = MAX_DEPTH + 1
    # honest trace accounting (r5): with the fused path-bounce kernel
    # (ops/fused_path.py — dispatched automatically on this scene), each
    # sample×bounce traces TWO closest-hit sweeps (path extension + the
    # portal-NEE shadow/emission ray); the backward pass differentiates
    # the residual replay and re-traces NOTHING. The generic XLA path
    # traces 3 per bounce (its branchless estimator always evaluates the
    # BSDF-MIS half, contributing zero on portal scenes) and its VJP
    # re-traverses everything (×2). `value` counts rays actually traced;
    # `r4_formula_mrays` applies r4's ×3×2 accounting for cross-round
    # comparison of the same workload.
    from pbrt_tpu.ops import fused_path as _fp
    fused_on = _fp.eligible(scene, cfg)
    # r5 depth-convention fix: the FINAL iteration is emission-only
    # (pbrt's break-before-NEE). Fused kernel sweeps per sample:
    # mode 1 (portal, light-only NEE) = (md+1) extensions + md shadows;
    # mode 0 (area, 2-sample MIS) = (md+1) + 2·md. XLA path still
    # traces its (masked) NEE on the last iteration = 3·(md+1).
    fused_mode = scene.fused_profile[4] if fused_on else None
    if fused_on and fused_mode == 1:
        sweeps = (MAX_DEPTH + 1) + MAX_DEPTH
    elif fused_on:
        sweeps = (MAX_DEPTH + 1) + 2 * MAX_DEPTH
    else:
        sweeps = 3 * (MAX_DEPTH + 1)
    bwd_factor = 1 if fused_on else 2
    rays_traced = W * H * SPP * sweeps * bwd_factor
    mrays_fwdbwd = rays_traced / t_fwdbwd / 1e6
    r4_formula_mrays = W * H * SPP * bounces * 3 * 2 / t_fwdbwd / 1e6

    # honest live-lane accounting (VERDICT r2 Weak #1): a 1-spp stats
    # pass on the CPU backend (keeps the TPU run single-program — a
    # second remote compile would eat the attempt deadline) returns
    # per-bounce active-lane fractions; effective = live forward
    # path-extension rays only (no ×3 NEE, no ×2 backward)
    cfg_stats = dc.replace(cfg, collect_stats=True)
    had = os.environ.get("PBRT_TPU_NO_PALLAS")
    os.environ["PBRT_TPU_NO_PALLAS"] = "1"   # XLA intersect on CPU
    try:
        with jax.default_device(cpu):
            _, live = render_pass(scene_cpu, cam_cpu, filt, cfg_stats,
                                  W, H, 1, jnp.asarray(0, jnp.uint32))
            live = jax.device_get(live) / (W * H)  # live fraction/bounce
    finally:
        if had is None:
            del os.environ["PBRT_TPU_NO_PALLAS"]
        else:
            os.environ["PBRT_TPU_NO_PALLAS"] = had
    live_frac = float(live.mean())
    dead_lane_frac = 1.0 - live_frac
    effective_mrays = (W * H * SPP * bounces * live_frac
                       / t_fwdbwd / 1e6)

    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd (cornell portal scene, 64spp)",
        "value": round(mrays_fwdbwd, 3),
        "unit": "Mrays/s",
        "vs_baseline": None,
        "extra": {
            "t_fwdbwd_s": round(t_fwdbwd, 4),
            "t_compile_s": round(t_compile, 1),
            "fused_kernel": bool(fused_on),
            "sweeps_per_sample": sweeps,
            "bwd_retrace": bwd_factor == 2,
            "r4_formula_mrays": round(r4_formula_mrays, 1),
            "resolution": [W, H], "spp": SPP, "max_depth": MAX_DEPTH,
            "device": str(jax.devices()[0]),
            # loss is the mean filter-weighted radiance of a CHUNK-spp pass
            "image_mean": mean_acc / n_passes / CHUNK,
            # live forward path-extension rays / t_fwdbwd (no NEE ×3, no
            # backward ×2) — the pbrt-comparable figure
            "effective_mrays": round(effective_mrays, 3),
            "dead_lane_frac": round(dead_lane_frac, 4),
            "live_per_bounce": [round(float(x), 4) for x in live],
            "pallas": not bool(os.environ.get("PBRT_TPU_NO_PALLAS")),
        },
    }))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
