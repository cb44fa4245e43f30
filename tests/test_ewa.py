"""EWA anisotropic texture filtering (core/mipmap.h:103-181).

The filter-level test builds an elongated (grazing-angle) uv footprint over
a high-frequency checker image and compares EWA and isotropic trilinear
against ground truth (dense supersampling of the footprint ellipse): EWA
must be strictly closer. An end-to-end render exercises the dpdv carry +
ComputeDifferentials-style Gram solve in resolve_kd."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import textures as tex_mod


def _checker_image(n=64, c=3):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    v = ((xx // 2 + yy // 2) % 2).astype(np.float32)
    return np.repeat(v[..., None], c, axis=-1)


def _table(filtering):
    img = _checker_image()
    rows = [dict(type=tex_mod.IMAGEMAP, v1=(1.0, 1.0, 1.0), img=0)]
    return tex_mod.make_texture_table(rows, [img], 3, spread=1e-3,
                                      filtering=filtering), img


def _ground_truth(img, uv, duv0, duv1, ns=64):
    """Average of the level-0 image over the parallelogram footprint
    spanned by ±duv0, ±duv1 (Gaussian weighted like EWA's kernel)."""
    h, w = img.shape[:2]
    rng = np.random.RandomState(0)
    acc = np.zeros(3)
    wsum = 0.0
    for _ in range(ns * ns):
        a, b = rng.randn(2)
        r2 = a * a + b * b
        if r2 > 1.0:
            continue
        wgt = np.exp(-2.0 * r2) - np.exp(-2.0)
        u = uv[0] + a * duv0[0] + b * duv1[0]
        v = uv[1] + a * duv0[1] + b * duv1[1]
        x = min(max(int(u * w - 0.5 + 0.5), 0), w - 1)
        y = min(max(int((1.0 - v) * h - 0.5 + 0.5), 0), h - 1)
        acc += img[y, x] * wgt
        wsum += wgt
    return acc / wsum


def test_ewa_beats_trilinear_on_grazing_footprint():
    tt_ewa, img = _table("ewa")
    tt_tri, _ = _table("trilinear")
    rng = np.random.RandomState(3)
    n_better = 0
    trials = 12
    for _ in range(trials):
        uv = rng.rand(2) * 0.6 + 0.2
        # elongated footprint: major axis ~6 texels, minor ~0.7 texels
        ang = rng.rand() * np.pi
        major = np.array([np.cos(ang), np.sin(ang)]) * (6.0 / 64)
        minor = np.array([-np.sin(ang), np.cos(ang)]) * (0.7 / 64)
        gt = _ground_truth(img, uv, major, minor)

        uvj = jnp.asarray(uv, jnp.float32)[None]
        d0 = jnp.asarray(major, jnp.float32)[None]
        d1 = jnp.asarray(minor, jnp.float32)[None]
        iid = jnp.zeros(1, jnp.int32)
        e = np.asarray(tex_mod._ewa_image(tt_ewa, iid, uvj, d0, d1))[0]
        # trilinear with the isotropic width the renderer would use
        width = jnp.asarray([np.linalg.norm(major)], jnp.float32)
        t = np.asarray(tex_mod._trilinear_image(tt_tri, iid, uvj, width))[0]
        if np.abs(e - gt).mean() < np.abs(t - gt).mean():
            n_better += 1
    # EWA must win on a clear majority of random grazing footprints
    assert n_better >= trials * 2 // 3, f"EWA better on {n_better}/{trials}"


def test_ewa_isotropic_matches_trilinear_regime():
    """With a circular footprint EWA reduces to an isotropic filter: its
    result stays close to trilinear (both ≈ local mean)."""
    tt_ewa, img = _table("ewa")
    uv = jnp.asarray([[0.43, 0.57]], jnp.float32)
    d0 = jnp.asarray([[2.0 / 64, 0.0]], jnp.float32)
    d1 = jnp.asarray([[0.0, 2.0 / 64]], jnp.float32)
    iid = jnp.zeros(1, jnp.int32)
    e = np.asarray(tex_mod._ewa_image(tt_ewa, iid, uv, d0, d1))[0]
    assert np.all(e >= 0.0) and np.all(e <= 1.0)
    assert abs(e.mean() - 0.5) < 0.25  # checker average under a wide kernel


def test_ewa_end_to_end_render():
    """Textured floor at a grazing angle renders finite with EWA enabled,
    exercising hit.dpdv + the Gram solve in resolve_kd."""
    import jax
    from pbrt_tpu.core import transform
    from pbrt_tpu.core.spectrum import RGB
    from pbrt_tpu.scene import camera as cam_mod
    from pbrt_tpu.scene.types import SceneBuilder
    from pbrt_tpu.integrators.render import render

    b = SceneBuilder(RGB)
    b.tex_filtering = "ewa"
    tex = b.add_texture(type=tex_mod.IMAGEMAP, v1=(1.0, 1.0, 1.0),
                        img=b.add_image(_checker_image()), uscale=4.0,
                        vscale=4.0)
    floor = b.add_material(type=0, kd=(0.5, 0.5, 0.5), kd_tex=tex)
    b.add_mesh([(-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20)],
               [(0, 1, 2), (0, 2, 3)],
               uvs=[(0, 0), (8, 0), (8, 8), (0, 8)], mat=floor)
    b.add_light(type="point", I=(30.0, 30.0, 30.0), pos=(0.0, 3.0, 0.0))
    scene = b.build()
    cam = cam_mod.make_perspective(
        transform.look_at((0.0, 0.25, -3.0), (0.0, 0.0, 4.0), (0, 1, 0)),
        50.0, (24, 24))
    img = np.asarray(render(scene, cam, spp=2, integrator="direct",
                            max_depth=1))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
