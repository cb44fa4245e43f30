"""Spatial light distribution (core/lightdistrib.cpp counterpart)."""

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.core import transform
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import lightdistrib
from pbrt_tpu.scene.types import SceneBuilder


def two_light_scene():
    """Two point lights at opposite ends of a long floor."""
    b = SceneBuilder(RGB)
    m = b.add_material(type=0, kd=0.6)
    b.add_mesh([(-10, 0, -2), (10, 0, -2), (10, 0, 2), (-10, 0, 2)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    b.add_light(type="point", I=10.0, pos=(-8, 1, 0))
    b.add_light(type="point", I=10.0, pos=(8, 1, 0))
    return b.build()


class TestSpatialDistribution:
    def test_voxels_prefer_near_light(self):
        scene = two_light_scene()
        d = lightdistrib.build_spatial_distribution(scene)
        # points near light 0 should pick it with high probability
        p_left = jnp.asarray([[-8.0, 0.1, 0.0]] * 1000)
        p_right = jnp.asarray([[8.0, 0.1, 0.0]] * 1000)
        from pbrt_tpu.core import rng
        u = rng.uniform(jnp.arange(1000, dtype=jnp.uint32), 0, 0)
        idx_l, pmf_l = lightdistrib.sample_spatial(d, scene, p_left, u)
        idx_r, pmf_r = lightdistrib.sample_spatial(d, scene, p_right, u)
        assert (np.asarray(idx_l) == 0).mean() > 0.8
        assert (np.asarray(idx_r) == 1).mean() > 0.8
        # pmf reported matches selection frequencies approximately
        assert np.asarray(pmf_l)[np.asarray(idx_l) == 0].mean() > 0.8

    def test_spatial_strategy_unbiased(self):
        """Render with spatial vs uniform light selection: same image."""
        scene = two_light_scene()
        cam = cam_mod.make_perspective(
            transform.look_at((0, 4, -6), (0, 0, 0), (0, 1, 0)), 50.0,
            (10, 10))
        img_u = np.asarray(render(scene, cam, spp=256, integrator="direct",
                                  light_strategy="uniform", seed=3))
        img_s = np.asarray(render(scene, cam, spp=256, integrator="direct",
                                  light_strategy="spatial", seed=3))
        np.testing.assert_allclose(img_s.mean(), img_u.mean(), rtol=0.05)
