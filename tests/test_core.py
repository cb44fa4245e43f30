"""Foundation tests: vecmath, rng, sampling, spectrum, transforms.

Mirrors the reference's deterministic/property test categories
(src/tests/{sampling,spectrum,bounds,fp_tests}.cpp — SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import rng, sampling, spectrum, transform, vecmath


class TestVecmath:
    def test_normalize(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
        n = vecmath.normalize(v)
        np.testing.assert_allclose(vecmath.length(n), [1.0, 1.0], atol=1e-6)

    def test_coordinate_system_orthonormal(self):
        key = np.random.RandomState(0)
        v1 = vecmath.normalize(jnp.asarray(key.randn(100, 3), jnp.float32))
        v2, v3 = vecmath.coordinate_system(v1)
        np.testing.assert_allclose(vecmath.dot(v1, v2), 0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(v1, v3), 0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(v2, v3), 0, atol=1e-5)
        np.testing.assert_allclose(vecmath.length(v2), 1, atol=1e-5)
        # right-handed: v1 x v2 == v3
        np.testing.assert_allclose(
            np.asarray(vecmath.cross(v1, v2)), np.asarray(v3), atol=1e-5)

    def test_reflect(self):
        wo = jnp.array([[0.0, 0.0, 1.0]])
        n = vecmath.normalize(jnp.array([[0.0, 0.0, 1.0]]))
        r = vecmath.reflect(wo, n)
        np.testing.assert_allclose(np.asarray(r), [[0, 0, 1]], atol=1e-6)

    def test_refract_tir(self):
        # grazing entry from dense medium: total internal reflection
        wi = vecmath.normalize(jnp.array([[0.99, 0.0, 0.14]]))
        n = jnp.array([[0.0, 0.0, 1.0]])
        _, valid = vecmath.refract(wi, n, jnp.array([1.5]))
        assert not bool(valid[0])

    def test_refract_snell(self):
        wi = vecmath.normalize(jnp.array([[0.5, 0.0, np.sqrt(0.75)]]))
        n = jnp.array([[0.0, 0.0, 1.0]])
        eta = jnp.array([1.0 / 1.5])
        wt, valid = vecmath.refract(wi, n, eta)
        assert bool(valid[0])
        sin_i = 0.5
        sin_t = float(vecmath.length(wt[..., :2])[0] /
                      vecmath.length(wt)[0])
        np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)

    def test_bounds_intersect(self):
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit = vecmath.bounds_intersect_p(
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
            o, 1.0 / d, jnp.array([jnp.inf]))
        assert bool(hit[0])
        miss = vecmath.bounds_intersect_p(
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
            o + jnp.array([3.0, 0, 0]), 1.0 / d, jnp.array([jnp.inf]))
        assert not bool(miss[0])


class TestRng:
    def test_uniform_range_and_determinism(self):
        pid = jnp.arange(10000, dtype=jnp.uint32)
        u1 = rng.uniform(pid, 3, 7)
        u2 = rng.uniform(pid, 3, 7)
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        assert float(u1.min()) >= 0.0 and float(u1.max()) < 1.0

    def test_uniform_mean_var(self):
        pid = jnp.arange(200000, dtype=jnp.uint32)
        u = np.asarray(rng.uniform(pid, 0, 0))
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.01

    def test_streams_decorrelated(self):
        pid = jnp.arange(100000, dtype=jnp.uint32)
        a = np.asarray(rng.uniform(pid, 0, 0))
        b = np.asarray(rng.uniform(pid, 0, 1))
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 0.01


class TestDistribution1D:
    def test_discrete_pmf(self):
        f = jnp.array([1.0, 2.0, 4.0, 1.0])
        d = sampling.make_distribution_1d(f)
        u = rng.uniform(jnp.arange(100000, dtype=jnp.uint32), 0, 0)
        idx, pmf = sampling.sample_distribution_1d_discrete(d, u)
        counts = np.bincount(np.asarray(idx), minlength=4) / 100000.0
        np.testing.assert_allclose(counts, [1 / 8, 2 / 8, 4 / 8, 1 / 8],
                                   atol=0.01)
        # reported pmf matches target
        np.testing.assert_allclose(
            np.asarray(pmf), np.asarray(
                sampling.distribution_1d_discrete_pdf(d, idx)), atol=1e-6)

    def test_continuous_integral(self):
        f = jnp.array([0.0, 1.0, 0.0, 3.0])
        d = sampling.make_distribution_1d(f)
        u = rng.uniform(jnp.arange(100000, dtype=jnp.uint32), 1, 0)
        x, pdf, _ = sampling.sample_distribution_1d_continuous(d, u)
        # E[g(x)/pdf(x)] = integral of g; take g = func itself
        fx = np.asarray(d.func)[np.clip((np.asarray(x) * 4).astype(int), 0, 3)]
        est = (fx / np.asarray(pdf)).mean()
        assert abs(est - 1.0) < 0.02  # integral of f over [0,1] = (1+3)/4

    def test_zero_distribution_uniform_fallback(self):
        d = sampling.make_distribution_1d(jnp.zeros(8))
        u = jnp.array([0.0, 0.3, 0.99])
        idx, pmf = sampling.sample_distribution_1d_discrete(d, u)
        np.testing.assert_allclose(np.asarray(pmf), 1 / 8, atol=1e-6)


class TestWarps:
    def test_concentric_disk_in_disk(self):
        u = np.random.RandomState(1).rand(10000, 2).astype(np.float32)
        d = np.asarray(sampling.concentric_sample_disk(jnp.asarray(u)))
        r2 = (d ** 2).sum(-1)
        assert r2.max() <= 1.0 + 1e-5
        # uniform: mean radius^2 = 1/2
        assert abs(r2.mean() - 0.5) < 0.02

    def test_cosine_hemisphere_mean_cos(self):
        u = np.random.RandomState(2).rand(20000, 2).astype(np.float32)
        d = np.asarray(sampling.cosine_sample_hemisphere(jnp.asarray(u)))
        # E[cos theta] under pdf cos/pi = 2/3
        assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01
        np.testing.assert_allclose((d ** 2).sum(-1), 1.0, atol=1e-4)

    def test_uniform_sphere(self):
        u = np.random.RandomState(3).rand(20000, 2).astype(np.float32)
        d = np.asarray(sampling.uniform_sample_sphere(jnp.asarray(u)))
        assert abs(d.mean()) < 0.02
        np.testing.assert_allclose((d ** 2).sum(-1), 1.0, atol=1e-4)

    def test_triangle_barycentrics(self):
        u = np.random.RandomState(4).rand(10000, 2).astype(np.float32)
        b = np.asarray(sampling.uniform_sample_triangle(jnp.asarray(u)))
        assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()

    def test_power_heuristic(self):
        w = sampling.power_heuristic(1, jnp.array(2.0), 1, jnp.array(1.0))
        np.testing.assert_allclose(float(w), 4.0 / 5.0, atol=1e-6)
        assert float(sampling.power_heuristic(
            1, jnp.array(0.0), 1, jnp.array(1.0))) == 0.0


class TestSpectrum:
    def test_cie_y_peak(self):
        # ybar peaks near 555nm at ~1
        lam = jnp.linspace(400, 700, 301)
        y = np.asarray(spectrum.cie_y(lam))
        assert abs(lam[y.argmax()] - 555) < 15
        assert abs(y.max() - 1.0) < 0.05

    def test_rgb_spectrum_round_trip(self):
        rgb = jnp.array([[0.2, 0.5, 0.8], [1.0, 0.0, 0.0], [0.7, 0.7, 0.7]])
        spec = spectrum.rgb_to_spectrum(rgb)
        back = spectrum.spectrum_to_rgb(spec)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                                   atol=1e-3)

    def test_white_spectrum_smooth(self):
        spec = np.asarray(spectrum.rgb_to_spectrum(jnp.array([1.0, 1.0, 1.0])))
        # smooth-ish and near-positive
        assert spec.min() > -0.2
        assert np.abs(np.diff(spec)).max() < 0.5

    def test_luminance_rgb(self):
        L = spectrum.luminance(jnp.array([1.0, 1.0, 1.0]), spectrum.RGB)
        np.testing.assert_allclose(float(L), 1.0, atol=1e-3)

    def test_index_from_wavelength(self):
        assert int(spectrum.index_from_wavelength(jnp.array(400.0))) == 0
        assert int(spectrum.index_from_wavelength(jnp.array(700.0))) == 59
        assert int(spectrum.index_from_wavelength(jnp.array(550.0))) == 30

    def test_zero_all_bins_but(self):
        s = jnp.ones((2, 60))
        idx = jnp.array([3, 10])
        z = np.asarray(spectrum.zero_all_bins_but(s, idx))
        assert z.sum() == 2.0
        assert z[0, 3] == 1.0 and z[1, 10] == 1.0

    def test_spectral_distribution_sampling(self):
        spec = jnp.zeros(60).at[30].set(1.0).at[10].set(1.0)
        d = spectrum.make_spectral_distribution(spec)
        u = rng.uniform(jnp.arange(10000, dtype=jnp.uint32), 0, 0)
        lam, pmf = spectrum.sample_wavelength(d, u)
        lam = np.asarray(lam)
        # only bins 10 and 30 → λ in [450,455) or [550,555)
        in_bin10 = (lam >= 450) & (lam < 455)
        in_bin30 = (lam >= 550) & (lam < 555)
        assert (in_bin10 | in_bin30).all()
        assert abs(in_bin10.mean() - 0.5) < 0.02
        np.testing.assert_allclose(np.asarray(pmf), 0.5, atol=1e-6)

    def test_blackbody_peak_wien(self):
        lam = jnp.linspace(200, 3000, 2801)
        b = np.asarray(spectrum.blackbody(lam, 5000.0))
        # Wien: peak at 2.898e6/5000 ≈ 580nm
        assert abs(float(lam[b.argmax()]) - 579.6) < 10

    def test_spd_from_pairs_rgb(self):
        # flat (equal-energy) SPD → near-grey RGB; equal-energy white sits
        # slightly red of D65 in sRGB so allow a loose tolerance
        rgb = spectrum.spd_from_pairs([400, 700], [1.0, 1.0], spectrum.RGB)
        assert abs(rgb[0] - rgb[1]) < 0.3 and abs(rgb[1] - rgb[2]) < 0.3
        assert rgb.min() > 0.5 and rgb.max() < 1.5


class TestTransform:
    def test_translate_point_vs_vector(self):
        t = transform.translate([1.0, 2.0, 3.0])
        p = t.apply_point(jnp.array([[0.0, 0.0, 0.0]]))
        v = t.apply_vector(jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(p), [[1, 2, 3]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), [[1, 0, 0]], atol=1e-6)

    def test_rotate_90z(self):
        r = transform.rotate_z(90.0)
        p = r.apply_point(jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(p), [[0, 1, 0]], atol=1e-6)

    def test_normal_transform_under_scale(self):
        s = transform.scale([2.0, 1.0, 1.0])
        # plane x+z=1 has normal (1,0,1)/sqrt2; after scaling x by 2 the
        # surface tangent (1,0,-1)→(2,0,-1) must stay perpendicular
        n = vecmath.normalize(s.apply_normal(
            vecmath.normalize(jnp.array([[1.0, 0.0, 1.0]]))))
        tangent = s.apply_vector(jnp.array([[1.0, 0.0, -1.0]]))
        np.testing.assert_allclose(float(vecmath.dot(n, tangent)[0]), 0.0,
                                   atol=1e-6)

    def test_look_at_maps_origin_to_eye(self):
        lw = transform.look_at([1, 2, 3], [0, 0, 0], [0, 1, 0])
        p = lw.apply_point(jnp.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(p), [[1, 2, 3]], atol=1e-5)

    def test_compose_inverse(self):
        t = (transform.translate([1, 0, 0]) @ transform.rotate_y(30.0)
             @ transform.scale(2.0))
        pts = jnp.asarray(np.random.RandomState(0).randn(10, 3), jnp.float32)
        back = t.inverse().apply_point(t.apply_point(pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-5)

    def test_animated_transform_endpoints(self):
        t0 = transform.translate([0, 0, 0])
        t1 = transform.translate([2, 0, 0]) @ transform.rotate_z(90.0)
        at = transform.make_animated(t0, t1)
        m_start = np.asarray(at.interpolate(jnp.array(0.0)))
        m_end = np.asarray(at.interpolate(jnp.array(1.0)))
        np.testing.assert_allclose(m_start, np.asarray(t0.m), atol=1e-4)
        np.testing.assert_allclose(m_end, np.asarray(t1.m), atol=1e-4)
