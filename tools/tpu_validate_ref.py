import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
import __graft_entry__ as ge
from pbrt_tpu.scene import intersect as isect_mod
from pbrt_tpu.core import vecmath
from pbrt_tpu.integrators.render import RenderConfig, render_pass
from pbrt_tpu.scene import film as film_mod

scene = ge._portal_scene()
cam = ge._camera((64, 64))
rng = np.random.RandomState(0)
R = 4096
o_np = rng.rand(R, 3).astype(np.float32) * 0.8 + 0.1
d_np = rng.randn(R, 3).astype(np.float32)
d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
hit = isect_mod._intersect_brute(scene, jnp.asarray(o_np),
                                 jnp.asarray(d_np), jnp.full(R, vecmath.INF))
filt = film_mod.make_filter("box")
cfg = RenderConfig(integrator="path", max_depth=3)
img = render_pass(scene, cam, filt, cfg, 64, 64, 4, jnp.asarray(0, jnp.uint32))
# second, disjoint sample block: calibrates the MC-noise floor the
# TPU-vs-CPU comparison is judged against
img_b = render_pass(scene, cam, filt, cfg, 64, 64, 4,
                    jnp.asarray(64, jnp.uint32))
np.savez("/tmp/valid_ref.npz", t=np.asarray(hit.t),
         pid=np.asarray(hit.prim_id), img=np.asarray(img),
         img_b=np.asarray(img_b), o=o_np, d=d_np)
print("cpu ref written", flush=True)
