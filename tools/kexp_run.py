"""Run one packet-kernel experiment on the TPU against /tmp/kexp.npz.

Usage: python tools/kexp_run.py <experiment> [args...]
Experiments:
  baseline           — time current bvh_traverse_pallas (primary + random)
  smem_probe <KB>    — try allocating an SMEM scratch of that size
Each run prints one JSON line. Wrap in `timeout` from the shell: the axon
compile tunnel intermittently stalls (see memory notes).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load():
    z = np.load("/tmp/kexp.npz")
    return {k: z[k] for k in z.files}


def timed(fn, *a, reps=2):
    import jax
    r = fn(*a)
    np.asarray(jax.device_get(r[0] if isinstance(r, tuple) else r))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*a)
        np.asarray(jax.device_get(r[0] if isinstance(r, tuple) else r))
    return (time.perf_counter() - t0) / reps, r


def agreement(t_k, i_k, t_x, i_x):
    t_k, i_k = np.asarray(t_k), np.asarray(i_k)
    same = i_k == i_x
    both = (i_k >= 0) & (i_x >= 0)
    dt = np.abs(np.where(both, t_k - t_x, 0.0))
    return {"prim_agreement": round(float(same.mean()), 6),
            "max_abs_dt": float(dt.max())}


def exp_baseline(z):
    import jax
    import jax.numpy as jnp

    from pbrt_tpu.ops import bvh_pallas as bp
    dev = jax.devices()[0]
    meta, nb, tri = [jax.device_put(jnp.asarray(z[k]), dev)
                     for k in ("pk_meta", "pk_nb", "pk_tri")]
    tmax = jax.device_put(jnp.asarray(z["tmax"]), dev)
    f = jax.jit(lambda o, d: bp._impl(meta, nb, tri, o, d, tmax,
                                      any_hit=False))
    out = {}
    t0 = time.perf_counter()
    o_p = jax.device_put(jnp.asarray(z["o_p"]), dev)
    d_p = jax.device_put(jnp.asarray(z["d_p"]), dev)
    dt, _ = timed(f, o_p, d_p)
    out["t_compile_s"] = round(time.perf_counter() - t0 - dt * 2, 1)
    out["primary_mrays"] = round(len(z["tmax"]) / dt / 1e6, 2)
    o_r = jax.device_put(jnp.asarray(z["o_r"]), dev)
    d_r = jax.device_put(jnp.asarray(z["d_r"]), dev)
    dt, _ = timed(f, o_r, d_r)
    out["random_mrays"] = round(len(z["tmax"]) / dt / 1e6, 3)
    # agreement on mixed rays
    n = len(z["t_x"])
    tm = jax.device_put(jnp.asarray(z["tmax"][:n]), dev)
    fk = jax.jit(lambda o, d: bp._impl(meta, nb, tri, o, d, tm,
                                       any_hit=False))
    t_k, i_k = fk(jax.device_put(jnp.asarray(z["o_mix"]), dev),
                  jax.device_put(jnp.asarray(z["d_mix"]), dev))
    out.update(agreement(t_k, i_k, z["t_x"], z["i_x"]))
    return out


def exp_smem_probe(z, kb):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(kb) * 256  # f32 count

    def kern(x_ref, o_ref, s_ref):
        s_ref[0] = x_ref[0, 0]
        s_ref[n - 1] = x_ref[0, 1]
        o_ref[:, :] = x_ref[:, :] + s_ref[n - 1]

    x = jnp.ones((8, 128), jnp.float32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((n,), jnp.float32)])
    r = np.asarray(jax.device_get(f(x)))
    return {"kb": int(kb), "ok": bool(np.isfinite(r).all())}


def slope_timer(make_loop):
    """On-chip per-call time via the slope between 1 and 9 chained calls
    inside one jitted program (cancels the ~58 ms axon sync/fetch fixed
    cost that poisons single-call timings)."""
    import jax
    f1, f9 = make_loop(1), make_loop(9)
    ts = {}
    for name, f in (("t1", f1), ("t9", f9)):
        r = f()
        np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        for _ in range(2):
            np.asarray(jax.device_get(f()))
        ts[name] = (time.perf_counter() - t0) / 2
    return (ts["t9"] - ts["t1"]) / 8, ts["t1"]


def exp_variant(z, variant, interpret=False, rows=8):
    import jax
    import jax.numpy as jnp
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    import tools.kexp_kernels as kk
    dev = jax.devices()[0]
    nw = z["pk_meta"].shape[1]
    nbs = kk.nb_to_smem(z["pk_nb"], nw)
    meta, nbs_d, tri = [jax.device_put(jnp.asarray(x), dev)
                        for x in (z["pk_meta"], nbs, z["pk_tri"])]
    out = {"variant": variant, "rows": rows}
    n = len(z["t_x"])
    tm = jax.device_put(jnp.asarray(z["tmax"][:n]), dev)
    fk = jax.jit(lambda o, d: kk.traverse(
        meta, nbs_d, tri, o, d, tm, any_hit=False, variant=variant,
        interpret=interpret, rows=rows))
    t_k, i_k = fk(jax.device_put(jnp.asarray(z["o_mix"]), dev),
                  jax.device_put(jnp.asarray(z["d_mix"]), dev))
    out.update(agreement(t_k, i_k, z["t_x"], z["i_x"]))
    if interpret:
        return out
    tmax = jax.device_put(jnp.asarray(z["tmax"]), dev)
    R = len(z["tmax"])
    sets = [("primary", "o_p", "d_p"), ("random", "o_r", "d_r")]
    if "o_rs" in z:
        sets.append(("sorted", "o_rs", "d_rs"))
    for name, ok, dk in sets:
        o = jax.device_put(jnp.asarray(z[ok]), dev)
        d = jax.device_put(jnp.asarray(z[dk]), dev)

        def make_loop(reps, o=o, d=d):
            import jax as _jax

            @_jax.jit
            def f():
                def step(j, acc):
                    t, _ = kk.traverse(
                        meta, nbs_d, tri, o, d,
                        tmax * (1.0 + j.astype(jnp.float32) * 1e-7),
                        any_hit=False, variant=variant, rows=rows)
                    return acc + t
                return _jax.lax.fori_loop(0, reps, step,
                                          jnp.zeros(R, jnp.float32))
            return f

        dt, t1 = slope_timer(make_loop)
        out[name + "_mrays"] = round(R / dt / 1e6, 2)
        out[name + "_t1_s"] = round(t1, 4)
    return out


def exp_count(z, variant):
    """Per-packet interior/leaf step counts (variant+10 kernel)."""
    import jax
    import jax.numpy as jnp

    import tools.kexp_kernels as kk
    dev = jax.devices()[0]
    nw = z["pk_meta"].shape[1]
    nbs = kk.nb_to_smem(z["pk_nb"], nw)
    meta, nbs_d, tri = [jax.device_put(jnp.asarray(x), dev)
                        for x in (z["pk_meta"], nbs, z["pk_tri"])]
    tmax = jax.device_put(jnp.asarray(z["tmax"]), dev)
    f = jax.jit(lambda o, d: kk.traverse(
        meta, nbs_d, tri, o, d, tmax, any_hit=False, variant=variant + 10))
    out = {"variant": variant}
    for name, ok, dk in (("primary", "o_p", "d_p"), ("random", "o_r", "d_r")):
        _, code = f(jax.device_put(jnp.asarray(z[ok]), dev),
                    jax.device_put(jnp.asarray(z[dk]), dev))
        code = np.asarray(jax.device_get(code)).reshape(-1, 1024)[:, 0]
        n_int = code >> 16
        n_leaf = code & 0xFFFF
        out[name] = {"packets": int(len(code)),
                     "int_steps_mean": round(float(n_int.mean()), 1),
                     "leaf_steps_mean": round(float(n_leaf.mean()), 1),
                     "int_steps_max": int(n_int.max()),
                     "leaf_steps_max": int(n_leaf.max())}
    return out


def exp_dual(z, rows=16, interpret=False):
    import jax
    import jax.numpy as jnp
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    import tools.kexp_kernels as kk
    meta, nbs, tris = kk.pack_dual_leaf(
        z["lo"], z["hi"], z["right"], z["count"], z["axis"],
        z["v0"], z["v1"], z["v2"])
    pp = tuple(sorted(dict(wide=4, leaf_max=16, cnt_bits=5, block_rows=2,
                           tris_per_row=12).items()))
    dev = jax.devices()[0]
    meta, nbs_d, tri = [jax.device_put(jnp.asarray(x), dev)
                        for x in (meta, nbs, tris)]
    out = {"exp_kind": "dual", "rows": rows, "tri_rows": int(tris.shape[0])}
    n = len(z["t_x"])
    tm = jax.device_put(jnp.asarray(z["tmax"][:n]), dev)
    fk = jax.jit(lambda o, d: kk.traverse(
        meta, nbs_d, tri, o, d, tm, any_hit=False, variant=5,
        rows=rows, pp=pp, interpret=interpret))
    t_k, i_k = fk(jax.device_put(jnp.asarray(z["o_mix"]), dev),
                  jax.device_put(jnp.asarray(z["d_mix"]), dev))
    out.update(agreement(t_k, i_k, z["t_x"], z["i_x"]))
    if interpret:
        return out
    tmax = jax.device_put(jnp.asarray(z["tmax"]), dev)
    R = len(z["tmax"])
    for name, ok, dk in (("primary", "o_p", "d_p"), ("random", "o_r", "d_r"),
                         ("sorted", "o_rs", "d_rs")):
        o = jax.device_put(jnp.asarray(z[ok]), dev)
        d = jax.device_put(jnp.asarray(z[dk]), dev)

        def make_loop(reps, o=o, d=d):
            import jax as _jax

            @_jax.jit
            def f():
                def step(j, acc):
                    t, _ = kk.traverse(
                        meta, nbs_d, tri, o, d,
                        tmax * (1.0 + j.astype(jnp.float32) * 1e-7),
                        any_hit=False, variant=5, rows=rows, pp=pp)
                    return acc + t
                return _jax.lax.fori_loop(0, reps, step,
                                          jnp.zeros(R, jnp.float32))
            return f

        dt, _ = slope_timer(make_loop)
        out[name + "_mrays"] = round(R / dt / 1e6, 2)
    return out


def exp_pack(z, wide, leaf_max, rows=16, interpret=False):
    import jax
    import jax.numpy as jnp
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    import tools.kexp_kernels as kk
    meta, nbs, tris, ppd = kk.pack_params(
        z["lo"], z["hi"], z["right"], z["count"], z["axis"],
        z["v0"], z["v1"], z["v2"], wide=wide, leaf_max=leaf_max)
    pp = tuple(sorted(ppd.items()))
    dev = jax.devices()[0]
    meta, nbs_d, tri = [jax.device_put(jnp.asarray(x), dev)
                        for x in (meta, nbs, tris)]
    out = {"wide": wide, "leaf_max": leaf_max, "rows": rows,
           "nw": int(meta.shape[1]), "n_leaf_blocks":
           int(tris.shape[0] // ppd["block_rows"])}
    n = len(z["t_x"])
    tm = jax.device_put(jnp.asarray(z["tmax"][:n]), dev)
    fk = jax.jit(lambda o, d: kk.traverse(
        meta, nbs_d, tri, o, d, tm, any_hit=False, variant=2,
        rows=rows, pp=pp, interpret=interpret))
    t_k, i_k = fk(jax.device_put(jnp.asarray(z["o_mix"]), dev),
                  jax.device_put(jnp.asarray(z["d_mix"]), dev))
    out.update(agreement(t_k, i_k, z["t_x"], z["i_x"]))
    if interpret:
        return out
    tmax = jax.device_put(jnp.asarray(z["tmax"]), dev)
    R = len(z["tmax"])
    sets = [("primary", "o_p", "d_p"), ("random", "o_r", "d_r"),
            ("sorted", "o_rs", "d_rs")]
    for name, ok, dk in sets:
        o = jax.device_put(jnp.asarray(z[ok]), dev)
        d = jax.device_put(jnp.asarray(z[dk]), dev)

        def make_loop(reps, o=o, d=d):
            import jax as _jax

            @_jax.jit
            def f():
                def step(j, acc):
                    t, _ = kk.traverse(
                        meta, nbs_d, tri, o, d,
                        tmax * (1.0 + j.astype(jnp.float32) * 1e-7),
                        any_hit=False, variant=2, rows=rows, pp=pp)
                    return acc + t
                return _jax.lax.fori_loop(0, reps, step,
                                          jnp.zeros(R, jnp.float32))
            return f

        dt, t1 = slope_timer(make_loop)
        out[name + "_mrays"] = round(R / dt / 1e6, 2)
    return out


def main():
    exp = sys.argv[1]
    z = load()
    t0 = time.perf_counter()
    if exp == "baseline":
        out = exp_baseline(z)
    elif exp == "smem_probe":
        out = exp_smem_probe(z, sys.argv[2])
    elif exp == "dual":
        out = exp_dual(z, rows=int(sys.argv[2]) if len(sys.argv) > 2 else 16,
                       interpret=bool(os.environ.get("KEXP_INTERP")))
    elif exp == "pack":
        out = exp_pack(z, wide=int(sys.argv[2]), leaf_max=int(sys.argv[3]),
                       rows=int(sys.argv[4]) if len(sys.argv) > 4 else 16,
                       interpret=bool(os.environ.get("KEXP_INTERP")))
    elif exp == "count":
        out = exp_count(z, int(sys.argv[2]))
    elif exp == "variant":
        rows = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        out = exp_variant(z, int(sys.argv[2]), rows=rows)
    elif exp == "variant_interp":
        out = exp_variant(z, int(sys.argv[2]), interpret=True)
    else:
        raise SystemExit(f"unknown experiment {exp}")
    out["exp"] = exp
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
