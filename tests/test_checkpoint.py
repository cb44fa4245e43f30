"""Checkpoint/resume (utils/checkpoint.py — SURVEY §5 capability the
reference lacks): interrupted-and-resumed renders must equal
uninterrupted ones bit-for-bit (counter-based sample streams keyed on
absolute spp index)."""

import numpy as np

from pbrt_tpu.core import transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene.types import SceneBuilder
from pbrt_tpu.utils import checkpoint as ck


def _scene():
    b = SceneBuilder(RGB)
    m = b.add_material(type=0, kd=(0.6, 0.5, 0.4))
    b.add_mesh([(-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    b.add_light(type="point", I=10.0, pos=(0, 2, 0))
    return b.build()


def _cam():
    return cam_mod.make_perspective(
        transform.look_at((0, 1.5, -3), (0, 0, 0), (0, 1, 0)), 45.0,
        (8, 8))


def test_save_load_roundtrip(tmp_path):
    p = str(tmp_path / "ck.npz")
    film = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    ck.save_checkpoint(p, film, spp_done=24, seed=7,
                       meta={"spp_target": 64})
    z = ck.load_checkpoint(p)
    np.testing.assert_array_equal(z["film_sum"], film)
    assert z["spp_done"] == 24 and z["seed"] == 7
    assert int(z["meta"]["spp_target"]) == 64


def test_resume_equals_uninterrupted(tmp_path):
    scene, cam = _scene(), _cam()
    p = str(tmp_path / "render.npz")
    # uninterrupted
    full = ck.render_with_checkpoints(scene, cam, 16, None, every_spp=8,
                                      max_depth=2, seed=3)
    # interrupted: run 8 spp (writes the checkpoint), then "crash" and
    # resume for the remaining 8 from the file
    ck.render_with_checkpoints(scene, cam, 8, p, every_spp=8,
                               max_depth=2, seed=3)
    assert ck.load_checkpoint(p)["spp_done"] == 8
    resumed = ck.render_with_checkpoints(scene, cam, 16, p, every_spp=8,
                                         max_depth=2, seed=3)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))
    assert np.asarray(full).mean() > 1e-4
