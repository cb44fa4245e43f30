"""Beam-diffusion BSSRDF tables (scene/bssrdf.py).

The expected constants below were produced by compiling the REFERENCE
sources (core/bssrdf.cpp + interpolation.cpp) into a probe binary and
printing `BSSRDFTable(100, 64)` values for g=0, eta=1.33 — i.e. this file
pins bit-level-near agreement with `ComputeBeamDiffusionBSSRDF` and
`SubsurfaceFromDiffuse` (r4 session; probe source in the commit message).
"""

import numpy as np
import pytest

from pbrt_tpu.scene import bssrdf as b


@pytest.fixture(scope="module")
def table():
    return b.compute_table(0.0, 1.33)


class TestTableBuild:
    def test_rho_eff_matches_reference_probe(self, table):
        # reference probe: rhoEff[25]=0.249504 rhoEff[50]=0.592502
        #                  rhoEff[75]=0.848480 rhoEff[99]=1.019343
        got = [table["rho_eff"][i] for i in (25, 50, 75, 99)]
        np.testing.assert_allclose(
            got, [0.249504, 0.592502, 0.848480, 1.019343], rtol=2e-4)

    def test_profile_matches_reference_probe(self, table):
        got = [table["profile"][50, 20], table["profile"][50, 40],
               table["profile"][99, 30]]
        np.testing.assert_allclose(
            got, [0.27628857, 0.06900605, 0.18180068], rtol=2e-4)

    def test_rho_eff_monotone(self, table):
        assert np.all(np.diff(table["rho_eff"]) >= -1e-12)

    def test_profile_nonnegative(self, table):
        assert table["profile"].min() >= 0.0

    def test_subsurface_from_diffuse_matches_reference_probe(self):
        # reference probe for kd=(0.5,0.3,0.2), mfp=0.4:
        sa, ss = b.subsurface_from_diffuse([0.5, 0.3, 0.2], 0.4, 0.0,
                                           1.33)
        np.testing.assert_allclose(sa, [0.07617, 0.24349, 0.45437],
                                   atol=2e-4)
        np.testing.assert_allclose(ss, [2.42383, 2.25651, 2.04563],
                                   atol=2e-4)

    def test_subsurface_from_diffuse_roundtrip(self):
        """rho_eff(material_profiles(subsurface_from_diffuse(kd))) == kd"""
        kd = [0.5, 0.2, 0.8]
        sa, ss = b.subsurface_from_diffuse(kd, 1.0, 0.0, 1.33)
        p = b.material_profiles(sa, ss, 0.0, 1.33)
        np.testing.assert_allclose(p["rho_eff"], kd, atol=1e-5)


class TestDeviceSampling:
    @pytest.fixture(scope="class")
    def tabs(self):
        from pbrt_tpu.scene import materials as mat_mod
        rows = [dict(type=mat_mod.SUBSURFACE,
                     sss_sigma_a=(0.1, 0.3, 0.05),
                     sss_sigma_s=(1.0, 2.0, 0.5), eta=1.33)]
        return b.build_scene_tables(rows, 3)

    def test_sample_matches_cdf(self, tabs):
        """Empirical CDF of sample_sr matches the table CDF at knots."""
        import jax.numpy as jnp
        n = 100000
        u = jnp.asarray(np.random.RandomState(0).uniform(
            1e-6, 1 - 1e-6, n).astype(np.float32))
        r, ok = b.sample_sr(tabs, jnp.zeros(n, jnp.int32), u)
        r = np.asarray(r)
        assert bool(np.asarray(ok).all())
        radius = np.asarray(tabs.radius)
        cdf = np.asarray(tabs.cdf[0])
        st = float(tabs.sigma_t[0])
        for k in (10, 25, 40, 55):
            emp = (r <= radius[k] / st).mean()
            want = cdf[k] / cdf[-1]
            assert abs(emp - want) < 0.012, (k, emp, want)

    def test_pdf_normalizes_over_disk(self, tabs):
        """∫ (Sr/rho_eff) 2πr dr = 1 (Pdf_Sr is a density on the disk)."""
        import jax.numpy as jnp
        rg = np.linspace(1e-4, 25.0, 30000).astype(np.float32)
        sr, _, rhoeff = b.eval_profile(
            tabs, jnp.zeros(len(rg), jnp.int32), jnp.asarray(rg))
        integ = np.trapezoid(np.asarray(sr) * 2 * np.pi * rg, rg) \
            / float(rhoeff[0])
        assert abs(integ - 1.0) < 0.02

    def test_eval_multi_matches_single(self, tabs):
        import jax.numpy as jnp
        rr = jnp.asarray(np.random.RandomState(1).uniform(
            0.01, 3.0, 512).astype(np.float32))
        row = jnp.zeros(512, jnp.int32)
        single, _, _ = b.eval_profile(tabs, row, rr)
        (multi,), _, _ = b.eval_profile_multi(tabs, row, [rr])
        np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                                   rtol=1e-6)


def test_sphere_estimator_matches_quadrature():
    """The full Sample_Sp estimator (3 axes + chain + Pdf_Sp) on a unit
    sphere integrates ∫ Sr dA exactly (verified vs quadrature)."""
    import jax.numpy as jnp

    from pbrt_tpu.scene import materials as mat_mod
    sa, ss = b.subsurface_from_diffuse([0.5], 0.4, 0.0, 1.33)
    tabs = b.build_scene_tables(
        [dict(type=mat_mod.SUBSURFACE, sss_sigma_a=tuple(sa),
              sss_sigma_s=tuple(ss), eta=1.33)], 1)
    # quadrature ground truth, entry at the pole of a unit sphere
    th = np.linspace(0, np.pi, 2000)
    dist = np.maximum(2 * np.sin(th / 2), 1e-6)
    sr, _, _ = b.eval_profile(tabs, jnp.zeros(len(th), jnp.int32),
                              jnp.asarray(dist.astype(np.float32)))
    truth = np.trapezoid(np.asarray(sr) * 2 * np.pi * np.sin(th), th)

    # estimator emulation (normal axis only here — exact on the upper
    # sheet + chain covers the lower)
    n = 400000
    rng = np.random.RandomState(3)
    u_r = rng.uniform(1e-6, 1 - 1e-6, n).astype(np.float32)
    u_pick = rng.uniform(size=n)
    r, ok = b.sample_sr(tabs, jnp.zeros(n, jnp.int32), jnp.asarray(u_r))
    r = np.asarray(r)
    rmax = float(tabs.r_max[0])
    val = (r > 1e-6) & (r < rmax)
    # vertical probe line x=r through the unit sphere: two sheets at
    # y=±sqrt(1-r²) when r<1
    has = r < 1.0
    y = np.sqrt(np.maximum(1 - r * r, 0))
    nf = np.where(has, 2, 0)
    top = u_pick < 0.5
    ysel = np.where(top, y, -y)
    r_act = np.sqrt(r * r + (1 - ysel) ** 2).astype(np.float32)
    cos_exit = np.abs(ysel)
    sr_a, _, rhoeff = b.eval_profile(tabs, jnp.zeros(n, jnp.int32),
                                     jnp.asarray(r_act))
    pdf_r, _, _ = b.eval_profile(tabs, jnp.zeros(n, jnp.int32),
                                 jnp.asarray(np.maximum(r, 1e-6)))
    pdf = (np.asarray(pdf_r) / float(rhoeff[0])) * cos_exit \
        / np.maximum(nf, 1)
    w = np.where(val & has, np.asarray(sr_a) / np.maximum(pdf, 1e-12),
                 0.0)
    w = np.minimum(w, 1e4)
    assert abs(w.mean() - truth) / truth < 0.03
