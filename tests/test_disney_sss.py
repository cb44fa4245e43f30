"""DisneyBSSRDF (materials/disney.cpp:365-470): the Burley normalized-
diffusion profile tabulated into the shared SSSTables machinery, entered
through the Disney lobe census's delta SpecularTransmission slot."""

import jax.numpy as jnp
import numpy as np

from pbrt_tpu.core import transform
from pbrt_tpu.core.spectrum import RGB
from pbrt_tpu.integrators import render
from pbrt_tpu.scene import bssrdf as bssrdf_mod
from pbrt_tpu.scene import camera as cam_mod
from pbrt_tpu.scene import materials as mat_mod
from pbrt_tpu.scene.types import SceneBuilder


def _burley_pdf(r, d):
    """Analytic normalized diffusion p(r; d) (disney.cpp:412-417 with
    R = 1): (e^{-r/d} + e^{-r/(3d)}) / (8 pi d r)."""
    return (np.exp(-r / d) + np.exp(-r / (3 * d))) / (8 * np.pi * d * r)


def _burley_cdf(r, d):
    """Closed-form polar CDF (disney.cpp:425-428):
    1 - e^{-r/d}/4 - (3/4) e^{-r/(3d)}."""
    return 1.0 - np.exp(-r / d) / 4.0 - 0.75 * np.exp(-r / (3 * d))


class TestDisneyProfile:
    def test_tables_match_analytic_profile(self):
        sd = np.array([1.0, 0.5, 0.25])
        rows = [dict(type=mat_mod.DISNEY, scatter_d=tuple(sd))]
        t = bssrdf_mod.build_scene_tables(rows, 3)
        assert t is not None
        # sigma_t = 1/(0.2 sd); rho_eff ~ 1 (normalized profile)
        np.testing.assert_allclose(np.asarray(t.sigma_t), [5, 10, 20],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(t.rho_eff), 1.0, atol=1e-3)
        for ch, d in [(0, 0.2), (1, 0.1), (2, 0.05)]:
            r = np.array([0.25, 1.0, 3.0]) * d
            sr, _, _ = bssrdf_mod.eval_profile(
                t, jnp.full(3, ch, jnp.int32), jnp.asarray(r, jnp.float32))
            np.testing.assert_allclose(np.asarray(sr), _burley_pdf(r, d),
                                       rtol=2e-3)

    def test_sample_sr_inverts_closed_form_cdf(self):
        """CDF inversion over the tabulated profile must reproduce the
        closed-form Burley CDF: F(Sample_Sr(u)) == u."""
        sd = np.array([0.8])
        t = bssrdf_mod.build_scene_tables(
            [dict(type=mat_mod.DISNEY, scatter_d=tuple(sd))], 1)
        u = jnp.linspace(0.02, 0.98, 25)
        r, valid = bssrdf_mod.sample_sr(t, jnp.zeros(25, jnp.int32), u)
        assert bool(jnp.all(valid))
        back = _burley_cdf(np.asarray(r), 0.2 * 0.8)
        np.testing.assert_allclose(back, np.asarray(u), atol=5e-3)

    def test_zero_channel_never_sampled(self):
        t = bssrdf_mod.build_scene_tables(
            [dict(type=mat_mod.DISNEY, scatter_d=(0.5, 0.0, 0.5))], 3)
        _, valid = bssrdf_mod.sample_sr(t, jnp.ones(4, jnp.int32) * 1,
                                        jnp.asarray([0.1, 0.3, 0.6, 0.9]))
        assert not bool(jnp.any(valid))


def _slab_scene(scatter_d=None, kd=0.8):
    b = SceneBuilder(RGB)
    kw = dict(type=mat_mod.DISNEY, kd=kd, roughness=0.5, eta=1.5)
    if scatter_d is not None:
        kw["scatter_d"] = scatter_d
    m = b.add_material(**kw)
    b.add_mesh([(-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5)],
               [(0, 2, 1), (0, 3, 2)], mat=m)
    b.add_mesh([(-5, -1, -5), (5, -1, -5), (5, -1, 5), (-5, -1, 5)],
               [(0, 1, 2), (0, 2, 3)], mat=m)
    b.add_light(type="point", I=20.0, pos=(0, 3, 0))
    return b.build()


def _cam():
    return cam_mod.make_perspective(
        transform.look_at((0, 2, -3), (0, 0, 0), (0, 1, 0)), 30.0, (10, 10))


class TestDisneySSSRender:
    def test_scene_flags(self):
        s = _slab_scene((0.3, 0.3, 0.3))
        assert s.has_sss and s.materials.has_disney_sss
        s0 = _slab_scene(None)
        assert not s0.has_sss and not s0.materials.has_disney_sss

    def test_energy_close_to_diffuse_disney(self):
        """A short-mfp DisneyBSSRDF converges to the diffuse look: its
        slab must land in a sane energy band around the sd=0 Disney slab
        (the BSSRDF swaps DisneyDiffuse's (1-F0/2)(1-Fi/2) shading for
        subsurface transport; same base color, same census size)."""
        i_sss = np.asarray(render(_slab_scene((0.2, 0.2, 0.2)), _cam(),
                                  spp=256, integrator="path", max_depth=4,
                                  seed=3)).mean()
        i_diff = np.asarray(render(_slab_scene(None), _cam(), spp=256,
                                   integrator="path", max_depth=4,
                                   seed=3)).mean()
        assert np.isfinite(i_sss) and i_sss > 1e-3
        assert 0.5 * i_diff < i_sss < 1.3 * i_diff

    def test_slab_reflectance_is_d_invariant(self):
        """The Burley profile is NORMALIZED: on a thick flat slab every
        sampled exit stays on the top face, so total reflectance is
        independent of scatterdistance — a strongly per-channel
        scatter_d on a white slab must still render near-gray (d only
        redistributes the exit point; tinting appears on curved/thin
        geometry, validated by the disney_sss oracle)."""
        img = np.asarray(render(_slab_scene((1.0, 0.3, 0.05), kd=0.9),
                                _cam(), spp=256, integrator="path",
                                max_depth=4, seed=5))
        r_m, b_m = img[..., 0].mean(), img[..., 2].mean()
        assert abs(r_m - b_m) < 0.12 * max(r_m, b_m)

    def test_parser_wires_scatterdistance(self):
        from pbrt_tpu.frontend.parser import parse_pbrt_string
        scene, _, _ = parse_pbrt_string("""
            WorldBegin
            Material "disney" "rgb color" [0.8 0.5 0.3]
              "rgb scatterdistance" [0.2 0.1 0.05]
            Shape "sphere" "float radius" [1]
            WorldEnd
        """)
        assert scene.has_sss and scene.materials.has_disney_sss
        sd = np.asarray(scene.materials.scatter_d)
        assert sd.max() > 0
        # thin surfaces ignore scatterdistance (disney.cpp:506-517)
        scene2, _, _ = parse_pbrt_string("""
            WorldBegin
            Material "disney" "bool thin" "true"
              "rgb scatterdistance" [0.2 0.1 0.05]
            Shape "sphere" "float radius" [1]
            WorldEnd
        """)
        assert not scene2.has_sss

    def test_census_drops_diffuse_lobe(self):
        """scatterdistance rows lose DisneyDiffuse from the cosine family
        and gain the delta entry lobe (disney.cpp:519-527)."""
        mt = mat_mod.make_material_table(
            [dict(type=mat_mod.DISNEY, scatter_d=(0.3, 0.3, 0.3)),
             dict(type=mat_mod.DISNEY)], 3)
        k_diff, _, _, _, n, n_en = mat_mod._disney_lobe_counts(mt)
        np.testing.assert_allclose(np.asarray(k_diff), [1.0, 2.0])
        np.testing.assert_allclose(np.asarray(n_en), [1.0, 0.0])
        np.testing.assert_allclose(np.asarray(n), [3.0, 3.0])
