"""MLT consistency: matches the path tracer on a diffuse box scene
(the same Path-vs-MLT pairing as tests/analytic_scenes.cpp)."""

import numpy as np

from pbrt_tpu.integrators import render
from pbrt_tpu.integrators.mlt import render_mlt
from test_bdpt_sppm import box_cam, box_scene


class TestMLT:
    def test_mlt_matches_path(self):
        scene = box_scene()
        cam = box_cam(res=(10, 10))
        ref = np.asarray(render(scene, cam, spp=256, integrator="path",
                                max_depth=3, seed=4))
        img = np.asarray(render_mlt(scene, cam, mutations_per_pixel=2048,
                                    n_chains=1024, n_bootstrap=8192,
                                    max_depth=3, seed=4))
        assert np.isfinite(img).all()
        assert img.mean() > 0
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.2, (img.mean(), ref.mean())
