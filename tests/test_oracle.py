"""Image oracle: pbrt_tpu renders vs the reference pbrt binary's renders.

The reference images in tests/oracle/ were produced by the actual reference
binary (built by oracle/build.sh; see tests/oracle/README.md). Comparison
follows imgtool diff (src/tools/imgtool.cpp:392-430): relative delta of the
image means, plus a blockwise relative-L1 that tolerates per-pixel MC noise
(ours are low-spp renders; the oracle's are 128 spp).

The shipped `projection` portal strategy is NOT asserted here — the
reference's SampleProj drops the 1/d² falloff via an unnormalized wi
(aaportal.cpp:114-159; see tests/oracle/README.md) — the `portal` strategy
and plain diffuse-light configurations validate the portal light path
end-to-end instead.
"""

import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
ORACLE = os.path.join(HERE, "oracle")


def _load_ref(name):
    from pbrt_tpu.utils import imageio
    return np.asarray(imageio.read_pfm(os.path.join(ORACLE, name)))


def _render(scene_file, spp, spectral=False):
    from pbrt_tpu.core import spectrum as spec_mod
    from pbrt_tpu.frontend import load_pbrt
    from pbrt_tpu.integrators.render import render

    cfg = spec_mod.SAMPLED if spectral else spec_mod.RGB
    scene, cam, opts = load_pbrt(os.path.join(ORACLE, scene_file),
                                 spectrum_cfg=cfg)
    img = render(scene, cam, spp=spp, integrator=opts["integrator"],
                 sampler="halton", max_depth=min(opts["max_depth"], 8))
    img = np.asarray(img)
    if spectral:
        from pbrt_tpu.core.spectrum import spectrum_to_rgb
        img = np.asarray(spectrum_to_rgb(img))
    return img


def _block_rel_l1(a, b, k=8):
    """Blockwise relative L1: |mean_block(a)-mean_block(b)| summed, over
    sum(b). Absorbs per-pixel MC noise, catches structural/energy errors."""
    h, w = a.shape[0] // k * k, a.shape[1] // k * k
    da = a[:h, :w].reshape(h // k, k, w // k, k, -1).mean((1, 3))
    db = b[:h, :w].reshape(h // k, k, w // k, k, -1).mean((1, 3))
    return float(np.abs(da - db).sum() / max(db.sum(), 1e-9))


def _mean_delta(a, b):
    """imgtool diff's avgDelta (imgtool.cpp:418-420)."""
    ma, mb = float(a.mean()), float(b.mean())
    return abs(ma - mb) / max(min(ma, mb), 1e-9)


def test_lamp_diffuse_matches_reference_binary():
    """Plain diffuse area light in the lamp interior: exercises PLY meshes,
    matte + metal materials, BVH visibility, halton sampling, the
    directlighting integrator — against the reference binary's render."""
    ref = _load_ref("lamp_diffuse_ref.pfm")
    img = _render("lamp_diffuse.pbrt", spp=8)
    assert img.shape == ref.shape
    md = _mean_delta(img, ref)
    bl = _block_rel_l1(img, ref)
    assert md < 0.08, f"mean delta {md:.4f} vs reference binary"
    assert bl < 0.25, f"block rel-L1 {bl:.4f} vs reference binary"


def test_lamp_portal_strategy_matches_reference_binary():
    """Portal area light with the uniform-portal strategy (the reference's
    bug-free portal estimator): validates InFront portal selection, portal
    solid-angle sampling, and traced-emission radiance lookup."""
    ref = _load_ref("lamp_portalstrat_ref.pfm")
    img = _render("lamp_portalstrat.pbrt", spp=8)
    assert img.shape == ref.shape
    md = _mean_delta(img, ref)
    bl = _block_rel_l1(img, ref)
    assert md < 0.08, f"mean delta {md:.4f} vs reference binary"
    assert bl < 0.25, f"block rel-L1 {bl:.4f} vs reference binary"


def test_cornell_dielectric_hero_matches_reference_binary():
    """cornell_dielectric (SURVEY §7 step 6): HWSS hero_path_mis vs the
    SAMPLED_SPECTRUM reference build. Validates 60-bin spectra, hero
    wavelength rotation + MIS, dispersive glass, spectral→RGB conversion."""
    ref = _load_ref("cornell_dielectric_ref.pfm")
    img = _render("cornell_dielectric_oracle.pbrt", spp=8, spectral=True)
    assert img.shape == ref.shape
    # dielectric caustics at 8 spp are noisy; compare energy + structure
    md = _mean_delta(img, ref)
    bl = _block_rel_l1(img, ref, k=16)
    assert md < 0.15, f"mean delta {md:.4f} vs reference binary"
    assert bl < 0.35, f"block rel-L1 {bl:.4f} vs reference binary"
