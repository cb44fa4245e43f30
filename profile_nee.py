"""Break down estimate_direct cost on TPU."""
import time, functools
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from pbrt_tpu.integrators.render import RenderConfig, _sample2
from pbrt_tpu.integrators import common
from pbrt_tpu.scene import camera as cam_mod, intersect as isect_mod
from pbrt_tpu.scene import lights as lights_mod, materials as mat_mod
from pbrt_tpu.scene import portals as portals_mod
from pbrt_tpu.core import vecmath
from pbrt_tpu.samplers import make_sampler

W = H = 256; CHUNK = 8
scene = ge._portal_scene()
cam = ge._camera((W, H))
n_pix = W*H
pid = jnp.tile(jnp.arange(n_pix, dtype=jnp.uint32), CHUNK)
sidx = jnp.repeat(jnp.arange(CHUNK, dtype=jnp.uint32), n_pix)
cfg = RenderConfig(integrator="path")
sfn = make_sampler(cfg.sampler)
px = (pid % W).astype(jnp.float32); py = (pid // W).astype(jnp.float32)
p_film = jnp.stack([px+0.5, py+0.5], -1)
u_lens = _sample2(sfn, pid, sidx, (2,3), cfg.seed)
u_time = sfn(pid, sidx, 4, cfg.seed)
rays = cam_mod.generate_rays(cam, p_film, u_lens, u_time)
o, d = rays.o, rays.d
R = o.shape[0]

def timed(name, fn, *args):
    out = jax.jit(fn)(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/3*1000:9.1f} ms")

u_sel = sfn(pid, sidx, 10, cfg.seed)
u_l = _sample2(sfn, pid, sidx, (11,12), cfg.seed)
u_ml = sfn(pid, sidx, 13, cfg.seed)
u_mu = _sample2(sfn, pid, sidx, (14,15), cfg.seed)

def setup(o, d):
    hit = isect_mod.intersect(scene, o, d, jnp.full(R, vecmath.INF))
    mp = mat_mod.gather_materials(scene.materials,
        scene.prim_mat[jnp.clip(hit.prim_id, 0, scene.n_prims-1)])
    return hit, mp

hit, mp = jax.jit(setup)(o, d)
jax.block_until_ready((hit, mp))

timed("full estimate_direct", lambda: common.estimate_direct(
    scene, hit, mp, -d, u_sel, u_l, u_mu, u_ml))
timed("ed no-bsdf-half", lambda: common.estimate_direct(
    scene, hit, mp, -d, u_sel, u_l, u_mu, u_ml, with_bsdf_half=False))
timed("sample_li", lambda: lights_mod.sample_li(
    scene, jnp.zeros(R, jnp.int32), hit.p, u_l)["li"])
g = lights_mod.gather_lights(scene.lights, jnp.zeros(R, jnp.int32))
timed("portals_in_front+select", lambda: portals_mod.select_visible_portal(
    portals_mod.portals_in_front(hit.p, g), u_sel)[0])
timed("sample_portal", lambda: portals_mod.sample_portal(
    g, jnp.zeros(R, jnp.int32), hit.p, u_l)[0])
ap = lights_mod.gather_area_prim(scene, g.prim_id)
timed("sample_projection", lambda: portals_mod.sample_projection(
    g, jnp.zeros(R, jnp.int32), ap.lo, ap.hi, ap.ax, hit.p, u_l)[0])
timed("trace_radiance", lambda: common.trace_radiance(
    scene, hit.p, hit.ns, d)[1])
timed("pdf_li", lambda: lights_mod.pdf_li(
    scene, jnp.zeros(R, jnp.int32), hit.p, d))
t1, t2 = common.make_frame(hit.ns)
wo = common.to_local(t1, t2, hit.ns, -d)
timed("bsdf_f+pdf", lambda: (mat_mod.bsdf_f(mp, wo, wo),
                              mat_mod.bsdf_pdf(mp, wo, wo)))
from pbrt_tpu.scene import textures as tex_mod
timed("resolve_kd", lambda: tex_mod.resolve_kd(scene, mp, hit))
