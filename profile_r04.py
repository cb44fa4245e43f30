"""On-chip profile of the bench program (VERDICT r3 item 1).

Captures a jax.profiler xplane trace of the steady-state fwd+bwd bench
iteration on the real TPU, aggregates per-op device time via
jax.profiler.ProfileData, and prints a per-category breakdown + achieved
FLOP/s from XLA's cost analysis. Output feeds PROFILE_r04.md.

Usage: python profile_r04.py [--out DIR]
"""

import collections
import json
import os
import sys
import time


def main(out_dir="/tmp/pbrt_profile_r04"):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from pbrt_tpu.integrators.render import RenderConfig, render_pass
    from pbrt_tpu.scene import film as film_mod

    W = H = 256
    CHUNK = 32
    MAX_DEPTH = 4
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        scene = ge._portal_scene()
        cam = ge._camera((W, H))
    dev = jax.devices()[0]
    scene = jax.device_put(scene, dev)
    cam = jax.device_put(cam, dev)
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
    t0 = time.perf_counter()
    lowered = grad_fn.lower(kd, emit, jnp.asarray(0, jnp.uint32))
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    ca = compiled.cost_analysis()
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)

    # warm up twice, then trace 2 steady-state iterations
    for i in range(2):
        v, g = compiled(kd, emit, jnp.asarray(i * CHUNK, jnp.uint32))
        jax.block_until_ready((v, g))
    t0 = time.perf_counter()
    v, g = compiled(kd, emit, jnp.asarray(0, jnp.uint32))
    jax.block_until_ready((v, g))
    t_iter = time.perf_counter() - t0

    jax.profiler.start_trace(out_dir)
    for i in range(2):
        v, g = compiled(kd, emit, jnp.asarray(i * CHUNK, jnp.uint32))
    jax.block_until_ready((v, g))
    jax.profiler.stop_trace()

    # locate the xplane file and aggregate device-plane op durations
    xplanes = []
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                xplanes.append(os.path.join(root, f))
    xplanes.sort(key=os.path.getmtime)
    print("xplane:", xplanes[-1] if xplanes else None, flush=True)
    report = {"t_iter_s": t_iter, "flops": flops, "bytes": bytes_acc,
              "flops_per_s": flops / t_iter if t_iter else None,
              "bytes_per_s": bytes_acc / t_iter if t_iter else None}
    if xplanes:
        pd = jax.profiler.ProfileData.from_file(xplanes[-1])
        planes = list(pd.planes)
        print("planes:", [p.name for p in planes], flush=True)
        for plane in planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                per_op = collections.Counter()
                n_ev = collections.Counter()
                total = 0.0
                for ev in line.events:
                    per_op[ev.name] += ev.duration_ns
                    n_ev[ev.name] += 1
                    total += ev.duration_ns
                if total <= 0:
                    continue
                key = f"{plane.name} :: {line.name}"
                report.setdefault("device_lines", {})[key] = {
                    "total_ns": total,
                    "top_ops": [(op, ns, n_ev[op])
                                for op, ns in per_op.most_common(60)],
                }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "device_lines"}, indent=1))
    for name, d in report.get("device_lines", {}).items():
        print(f"== {name}: total {d['total_ns']/1e6:.2f} ms")
        for op, ns, cnt in d["top_ops"][:45]:
            print(f"  {ns/1e6:9.2f} ms  {100*ns/d['total_ns']:5.1f}%  "
                  f"x{cnt:<5d} {op[:110]}")


if __name__ == "__main__":
    out = "/tmp/pbrt_profile_r04"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    main(out)
