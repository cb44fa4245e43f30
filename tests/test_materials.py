"""BSDF sampling↔pdf consistency and energy checks (tests/bsdfs.cpp's
χ²-style validation, MC form) for all non-delta material families."""

import jax.numpy as jnp
import numpy as np
import pytest

from pbrt_tpu.core import rng
from pbrt_tpu.scene import materials as mat


def make_mp(N, **kw):
    rows = [dict(**kw)]
    table = mat.make_material_table(rows, 3)
    return mat.gather_materials(table, jnp.zeros(N, jnp.int32))


def estimate_rho(mp, wo, N):
    """MC hemispherical albedo: E[f·|cos|/pdf] (BxDF::rho)."""
    pid = jnp.arange(N, dtype=jnp.uint32)
    u = jnp.stack([rng.uniform(pid, 0, 0), rng.uniform(pid, 0, 1)], -1)
    ul = rng.uniform(pid, 0, 2)
    wi, f, pdf, _ = mat.bsdf_sample(mp, wo, ul, u)
    w = f * (jnp.abs(wi[..., 2]) / jnp.maximum(pdf, 1e-12))[..., None]
    w = jnp.where((pdf > 1e-9)[..., None], w, 0.0)
    return np.asarray(w.mean(0))


def check_sample_pdf_match(mp, wo, N=50000, label=""):
    """The pdf reported by bsdf_sample equals bsdf_pdf at the sampled
    direction (non-delta lobes)."""
    pid = jnp.arange(N, dtype=jnp.uint32)
    u = jnp.stack([rng.uniform(pid, 1, 0), rng.uniform(pid, 1, 1)], -1)
    ul = rng.uniform(pid, 1, 2)
    wi, f, pdf, flags = mat.bsdf_sample(mp, wo, ul, u)
    pdf_eval = mat.bsdf_pdf(mp, wo, wi)
    nonspec = (flags & mat.FLAG_SPECULAR) == 0
    sel = np.asarray(nonspec & (pdf > 1e-6))
    np.testing.assert_allclose(np.asarray(pdf)[sel],
                               np.asarray(pdf_eval)[sel], rtol=1e-3,
                               err_msg=label)


WO = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]])
              / np.linalg.norm([0.3, 0.1, 0.95]), (50000, 1))


class TestBsdfConsistency:
    @pytest.mark.parametrize("kw,label", [
        (dict(type=mat.MATTE, kd=0.8), "matte"),
        (dict(type=mat.MATTE, kd=0.8, sigma=20.0), "oren-nayar"),
        (dict(type=mat.PLASTIC, kd=0.5, ks=0.3, roughness=0.1), "plastic"),
        (dict(type=mat.METAL, roughness=0.2), "metal"),
        (dict(type=mat.SUBSTRATE, kd=0.5, ks=0.2, roughness=0.15),
         "substrate"),
        (dict(type=mat.DISNEY, kd=0.6, metallic=0.3, roughness=0.3,
              sheen=0.5, clearcoat=0.5), "disney"),
        (dict(type=mat.DISNEY, kd=0.6, roughness=0.4, spec_trans=0.8,
              eta=1.5), "disney-spectrans"),
        (dict(type=mat.DISNEY, kd=0.6, roughness=0.4, thin=1.0,
              flatness=0.5, diff_trans=0.7, spec_trans=0.3, eta=1.5),
         "disney-thin"),
        (dict(type=mat.DISNEY, kd=0.6, roughness=0.3, anisotropic=0.8,
              metallic=0.5), "disney-aniso"),
        (dict(type=mat.GLASS, kr=1.0, kt=1.0, eta=1.5, roughness=0.2),
         "rough-glass"),
    ])
    def test_sample_pdf_consistency(self, kw, label):
        mp = make_mp(50000, **kw)
        check_sample_pdf_match(mp, WO, label=label)

    @pytest.mark.parametrize("kw,label,max_rho", [
        (dict(type=mat.MATTE, kd=1.0), "matte", 1.01),
        (dict(type=mat.MATTE, kd=1.0, sigma=25.0), "oren-nayar", 1.02),
        (dict(type=mat.PLASTIC, kd=0.7, ks=0.3, roughness=0.1), "plastic",
         1.1),
        (dict(type=mat.METAL, roughness=0.3), "metal", 1.01),
        (dict(type=mat.DISNEY, kd=1.0, metallic=0.0, roughness=0.4),
         "disney", 1.15),
        (dict(type=mat.MIRROR, kr=1.0), "mirror", 1.001),
        (dict(type=mat.GLASS, kr=1.0, kt=1.0, eta=1.5), "glass", 1.01),
        (dict(type=mat.GLASS, kr=1.0, kt=1.0, eta=1.5, roughness=0.2),
         "rough-glass", 1.05),
    ])
    def test_energy_conservation(self, kw, label, max_rho):
        """White-furnace: hemispherical albedo ≤ 1 (hair.cpp's white
        furnace test generalized)."""
        mp = make_mp(100000, **kw)
        wo = jnp.tile(jnp.asarray([[0.2, 0.0, 0.98]])
                      / np.linalg.norm([0.2, 0.0, 0.98]), (100000, 1))
        rho = estimate_rho(mp, wo, 100000)
        assert (rho <= max_rho).all(), (label, rho)
        assert (rho > 0.05).all(), (label, rho)

    def test_matte_rho_exact(self):
        mp = make_mp(100000, type=mat.MATTE, kd=0.55)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (100000, 1))
        rho = estimate_rho(mp, wo, 100000)
        np.testing.assert_allclose(rho, 0.55, rtol=0.01)

    def test_fresnel_dielectric_normal_incidence(self):
        f = mat.fr_dielectric(jnp.asarray([1.0]), jnp.asarray([1.0]),
                              jnp.asarray([1.5]))
        np.testing.assert_allclose(float(f[0]), 0.04, atol=1e-3)

    def test_fresnel_conductor_reflective(self):
        eta = jnp.asarray([[0.2, 0.92, 1.1]])
        k = jnp.asarray([[3.9, 2.45, 2.14]])  # ~gold
        f = mat.fr_conductor(jnp.asarray([1.0]), eta, k)
        assert float(f[0, 0]) > 0.9  # red highly reflective for gold

    def test_disney_spectrans_estimator_agreement(self):
        """Transmissive Disney (disney.cpp:566-583): importance-sampled
        ∫f·|cosθ|dω over the FULL sphere agrees with uniform-sphere
        quadrature — validates the microfacet-transmission lobe's
        f/pdf/sample mutual consistency."""
        from pbrt_tpu.core.sampling import uniform_sample_hemisphere
        n = 200_000
        mp = make_mp(n, type=mat.DISNEY, kd=0.6, roughness=0.5,
                     spec_trans=0.9, eta=1.5)
        rngs = np.random.RandomState(3)
        wo = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]])
                      / np.linalg.norm([0.3, 0.1, 0.95]), (n, 1))
        ul = jnp.asarray(rngs.rand(n), jnp.float32)
        u = jnp.asarray(rngs.rand(n, 2), jnp.float32)
        wi, f, pdf, _ = mat.bsdf_sample(mp, wo, ul, u)
        ok = np.asarray(pdf) > 1e-9
        est_is = np.asarray(f).mean(-1) * np.abs(np.asarray(wi)[:, 2])
        est_is = np.where(ok, est_is / np.maximum(np.asarray(pdf), 1e-9),
                          0.0).mean()
        # uniform full-sphere quadrature
        u2 = jnp.asarray(rngs.rand(n, 2), jnp.float32)
        wi_u = uniform_sample_hemisphere(u2)
        flip = jnp.asarray(rngs.rand(n) < 0.5)
        wi_u = jnp.where(flip[:, None],
                         wi_u * jnp.asarray([1.0, 1.0, -1.0]), wi_u)
        f_u = mat.bsdf_f(mp, wo, wi_u)
        est_un = (np.asarray(f_u).mean(-1) * np.abs(np.asarray(wi_u)[:, 2])
                  * (4.0 * np.pi)).mean()
        assert est_un > 0.05      # transmission actually contributes
        np.testing.assert_allclose(est_is, est_un, rtol=0.05)

    def test_disney_thin_difftrans_splits_energy(self):
        """Thin surface: diff_trans=2 sends the diffuse energy to the
        transmitted side, diff_trans=0 keeps it reflected
        (disney.cpp:490-491, 508-512, 585-589)."""
        n = 8
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        wi_t = jnp.tile(jnp.asarray([[0.3, 0.0, -0.954]])
                        / np.linalg.norm([0.3, 0.0, -0.954]), (n, 1))
        wi_r = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]])
                        / np.linalg.norm([0.3, 0.0, 0.954]), (n, 1))
        mp_all_t = make_mp(n, type=mat.DISNEY, kd=0.8, roughness=0.3,
                           thin=1.0, diff_trans=2.0)
        mp_all_r = make_mp(n, type=mat.DISNEY, kd=0.8, roughness=0.3,
                           thin=1.0, diff_trans=0.0)
        f_t_allt = float(np.asarray(mat.bsdf_f(mp_all_t, wo, wi_t)).mean())
        f_t_allr = float(np.asarray(mat.bsdf_f(mp_all_r, wo, wi_t)).mean())
        f_r_allt = float(np.asarray(mat.bsdf_f(mp_all_t, wo, wi_r)).mean())
        f_r_allr = float(np.asarray(mat.bsdf_f(mp_all_r, wo, wi_r)).mean())
        assert f_t_allt > 0.1 and f_t_allr == 0.0
        assert f_r_allr > f_r_allt          # diffuse stays on refl side

    def test_disney_anisotropic_azimuth_dependence(self):
        """anisotropic>0 makes the specular highlight azimuth-dependent
        (ax≠ay, disney.cpp:541-545); anisotropic=0 stays rotationally
        symmetric."""
        n = 4
        th = 0.6
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        # off-specular wi: the half-vector tilts along x vs along y
        wi_x = jnp.tile(jnp.asarray([[np.sin(th), 0.0, np.cos(th)]]),
                        (n, 1))
        wi_y = jnp.tile(jnp.asarray([[0.0, np.sin(th), np.cos(th)]]),
                        (n, 1))
        mp_a = make_mp(n, type=mat.DISNEY, kd=0.5, metallic=1.0,
                       roughness=0.4, anisotropic=0.9)
        mp_i = make_mp(n, type=mat.DISNEY, kd=0.5, metallic=1.0,
                       roughness=0.4, anisotropic=0.0)
        fa_x = float(np.asarray(mat.bsdf_f(mp_a, wo, wi_x)).mean())
        fa_y = float(np.asarray(mat.bsdf_f(mp_a, wo, wi_y)).mean())
        fi_x = float(np.asarray(mat.bsdf_f(mp_i, wo, wi_x)).mean())
        fi_y = float(np.asarray(mat.bsdf_f(mp_i, wo, wi_y)).mean())
        assert abs(fa_x - fa_y) / max(fa_x, fa_y) > 0.2
        np.testing.assert_allclose(fi_x, fi_y, rtol=1e-4)

    def test_disney_roughness_alpha_is_squared(self):
        """Disney maps roughness→alpha as rough² (disney.cpp:542-543),
        not the RoughnessToAlpha log remap the other materials use."""
        ax, ay = mat._disney_alphas(
            make_mp(1, type=mat.DISNEY, roughness=0.5))
        np.testing.assert_allclose(float(ax[0]), 0.25, rtol=1e-5)
        np.testing.assert_allclose(float(ay[0]), 0.25, rtol=1e-5)

    def test_disney_metallic_kills_diffuse(self):
        mp_d = make_mp(4, type=mat.DISNEY, kd=0.8, metallic=0.0,
                       roughness=0.5)
        mp_m = make_mp(4, type=mat.DISNEY, kd=0.8, metallic=1.0,
                       roughness=0.5)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        wi = jnp.tile(jnp.asarray([[0.6, 0.0, 0.8]]), (4, 1))
        f_d = np.asarray(mat.bsdf_f(mp_d, wo, wi))
        f_m = np.asarray(mat.bsdf_f(mp_m, wo, wi))
        # metallic=1 removes the diffuse floor; off-specular direction
        # should be much darker
        assert f_m[0].mean() < f_d[0].mean()
