"""Pallas intersection kernel parity (TPU only; skipped on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",), reason="needs TPU backend")


@requires_tpu
class TestPallasIntersect:
    def test_matches_jnp_path(self):
        import os
        import __graft_entry__ as ge
        from pbrt_tpu.scene import intersect as im
        scene = ge._portal_scene()
        rs = np.random.RandomState(0)
        R = 8192
        o = jnp.asarray(rs.uniform(0.1, 0.9, (R, 3)), jnp.float32)
        d = jnp.asarray(rs.randn(R, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tmax = jnp.full(R, jnp.inf)
        os.environ["PBRT_TPU_NO_PALLAS"] = "1"
        h1 = im.intersect(scene, o, d, tmax)
        del os.environ["PBRT_TPU_NO_PALLAS"]
        h2 = im.intersect(scene, o, d, tmax)
        np.testing.assert_array_equal(np.asarray(h1.valid),
                                      np.asarray(h2.valid))
        m = np.asarray(h1.valid)
        np.testing.assert_allclose(np.asarray(h1.t)[m],
                                   np.asarray(h2.t)[m], rtol=1e-4)
        assert (np.asarray(h1.prim_id)[m]
                == np.asarray(h2.prim_id)[m]).mean() > 0.999
