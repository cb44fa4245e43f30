"""TPU numerical-agreement artifact: Pallas kernels vs XLA CPU reference.

Run tools/tpu_validate_ref.py (CPU reference) then this on a TPU host;
writes TPU_VALIDATION_r{N}.json at the repo root."""
import json, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    import __graft_entry__ as ge
    scene = ge._portal_scene()
    cam = ge._camera((64, 64))
ref = np.load("/tmp/valid_ref.npz")
dev = jax.devices()[0]
out = {"device": str(dev), "checks": []}
from pbrt_tpu.ops import intersect_pallas as ip
from pbrt_tpu.core import vecmath
scene_t = jax.device_put(scene, dev)
o = jax.device_put(jnp.asarray(ref["o"]), dev)
d = jax.device_put(jnp.asarray(ref["d"]), dev)
tri, sph, pln = ip.pack_scene(scene_t)
R = ref["o"].shape[0]
t_tpu, p_tpu = jax.jit(lambda o, d: ip.intersect_brute_pallas(
    tri, sph, pln, o, d, jnp.full(R, vecmath.INF), scene_t.n_tri,
    scene_t.n_sph, scene_t.n_pln))(o, d)
t_tpu = np.asarray(t_tpu)
p_tpu = np.asarray(p_tpu)
hitm = ref["pid"] >= 0
agree = float((p_tpu == ref["pid"]).mean())
max_dt = float(np.abs(np.where(hitm, t_tpu - ref["t"], 0)).max())
out["checks"].append({"name": "pallas_brute_intersect_vs_xla_cpu",
                      "prim_agreement": agree, "max_abs_dt": max_dt,
                      "n_rays": int(R),
                      "pass": bool(agree > 0.999 and max_dt < 1e-3)})
log(f"intersect agree={agree} max_dt={max_dt}")

from pbrt_tpu.integrators.render import RenderConfig, render_pass
from pbrt_tpu.scene import film as film_mod
filt = film_mod.make_filter("box")
cfg = RenderConfig(integrator="path", max_depth=3)
cam_t = jax.device_put(cam, dev)
img_tpu = np.asarray(jax.jit(
    lambda off: render_pass(scene_t, cam_t, filt, cfg, 64, 64, 4, off))(
        jnp.asarray(0, jnp.uint32)))
img_cpu = ref["img"]
rel = float(abs(img_tpu.mean() - img_cpu.mean()) / max(img_cpu.mean(), 1e-9))
mad = float(np.abs(img_tpu - img_cpu).mean() / max(img_cpu.mean(), 1e-9))
# identical sample streams still diverge chaotically at geometric edge
# cases (a single float-ordering difference flips a bounce and the whole
# path), so the honest yardstick is the MC-noise floor: the difference
# between two *CPU* renders with disjoint sample blocks
noise = float(np.abs(ref["img"] - ref["img_b"]).mean()
              / max(img_cpu.mean(), 1e-9))
rel_noise = float(abs(ref["img"].mean() - ref["img_b"].mean())
                  / max(img_cpu.mean(), 1e-9))
out["checks"].append({"name": "render_pass_tpu_vs_cpu_same_samples",
                      "tpu_mean": float(img_tpu.mean()),
                      "cpu_mean": float(img_cpu.mean()),
                      "rel_mean_err": rel, "mean_abs_dev_rel": mad,
                      "cpu_noise_floor_mad": noise,
                      "cpu_noise_floor_rel": rel_noise,
                      "pass": bool(rel < max(3.0 * rel_noise, 1e-2)
                                   and mad < 2.0 * noise)})
log(f"render tpu={img_tpu.mean():.5f} cpu={img_cpu.mean():.5f} "
    f"rel={rel:.2e} mad={mad:.2e} noise=({rel_noise:.2e},{noise:.2e})")
out["all_pass"] = all(c["pass"] for c in out["checks"])
with open("/root/repo/TPU_VALIDATION_r02.json", "w") as f:
    json.dump(out, f, indent=1)
log(f"WROTE all_pass={out['all_pass']}")
