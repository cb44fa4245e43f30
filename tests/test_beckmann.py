"""Beckmann–Spizzichino NDF (core/microfacet.h:48-105).

Mirrors the reference's tests/bsdfs.cpp strategy: NDF normalization by
quadrature, sample↔pdf consistency of the full-distribution sampler, and
estimator agreement between importance sampling and uniform-hemisphere
integration for a Beckmann metal."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import materials as mat


def test_beckmann_d_normalization():
    """∫ D(wh) cosθ dω = 1 over the hemisphere (projected-area identity)."""
    for alpha in (0.1, 0.3, 0.6):
        n = 256
        theta = (np.arange(n) + 0.5) / n * (np.pi / 2)
        phi_w = 2.0 * np.pi
        wh = jnp.asarray(np.stack([np.sin(theta), np.zeros(n),
                                   np.cos(theta)], -1), jnp.float32)
        d = np.asarray(mat.beck_d(wh, jnp.full(n, alpha)))
        integrand = d * np.cos(theta) * np.sin(theta)
        total = integrand.sum() * (np.pi / 2 / n) * phi_w
        assert abs(total - 1.0) < 2e-2, (alpha, total)


def test_beckmann_sample_pdf_consistency():
    """E[1/pdf weighted into cells] reproduces D·cosθ: chi²-lite — the
    histogram of sampled cosθh matches the analytic marginal."""
    alpha = 0.35
    n = 200_000
    rng = np.random.RandomState(7)
    u = jnp.asarray(rng.rand(n, 2), jnp.float32)
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.946]), (n, 3))
    wh = np.asarray(mat.beck_sample_wh(wo, u, jnp.full(n, alpha)))
    cost = wh[:, 2]
    # analytic marginal of cosθ under full-D sampling:
    # p(θ)dθ = D(θ) cosθ sinθ 2π dθ
    bins = np.linspace(np.cos(np.pi / 3), 1.0, 24)
    hist, _ = np.histogram(cost, bins=bins)
    centers = 0.5 * (bins[1:] + bins[:-1])
    theta_c = np.arccos(centers)
    whc = jnp.asarray(np.stack([np.sin(theta_c), np.zeros_like(theta_c),
                                centers], -1), jnp.float32)
    d = np.asarray(mat.beck_d(whc, jnp.full(len(centers), alpha)))
    # p(cosθ) = 2π D cosθ  (change of var dcosθ)
    p = 2 * np.pi * d * centers
    p_n = p / p.sum()
    h_n = hist / hist.sum()
    assert np.abs(p_n - h_n).max() < 0.02, np.abs(p_n - h_n).max()


def test_beckmann_metal_estimator_agreement():
    """Reflected radiance of a Beckmann metal under a constant incoming
    field: BSDF importance sampling agrees with uniform-hemisphere
    quadrature (the white-furnace pattern of tests/bsdfs.cpp)."""
    rows = [dict(type=mat.METAL, roughness=0.3, ndf=mat.NDF_BECKMANN,
                 metal_eta=0.2, metal_k=3.9)]
    table = mat.make_material_table(rows, 3)
    assert table.has_beckmann
    n = 120_000
    rng = np.random.RandomState(11)
    mp = mat.gather_materials(table, jnp.zeros(n, jnp.int32))
    wo = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.9165]), (n, 3))

    # importance-sampled estimate of ∫ f cosθ dω
    u_l = jnp.asarray(rng.rand(n), jnp.float32)
    u = jnp.asarray(rng.rand(n, 2), jnp.float32)
    wi, f, pdf, flags = mat.bsdf_sample(mp, wo, u_l, u)
    ok = np.asarray(pdf) > 1e-9
    est_is = np.asarray(f)[..., 0] * np.abs(np.asarray(wi)[:, 2])
    est_is = np.where(ok, est_is / np.maximum(np.asarray(pdf), 1e-9), 0.0)

    # uniform-hemisphere quadrature of the same integral
    u2 = jnp.asarray(rng.rand(n, 2), jnp.float32)
    from pbrt_tpu.core.sampling import uniform_sample_hemisphere
    wi_u = uniform_sample_hemisphere(u2)
    f_u = mat.bsdf_f(mp, wo, wi_u)
    est_un = np.asarray(f_u)[..., 0] * np.abs(np.asarray(wi_u)[:, 2]) \
        * 2 * np.pi
    assert abs(est_is.mean() - est_un.mean()) < 0.05 * max(
        est_un.mean(), 1e-3), (est_is.mean(), est_un.mean())


def test_parser_distribution_param(tmp_path):
    """'string distribution' 'beckmann' flows into the material row."""
    from pbrt_tpu.frontend.parser import parse_pbrt_string
    scene_txt = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path"
WorldBegin
Material "metal" "float roughness" [0.2] "string distribution" ["beckmann"]
Shape "trianglemesh" "integer indices" [0 1 2]
  "point P" [-1 -1 2  1 -1 2  0 1 2]
AttributeBegin
  LightSource "point" "rgb I" [10 10 10] "point from" [0 2 -1]
AttributeEnd
WorldEnd
"""
    scene, _cam, _opts = parse_pbrt_string(scene_txt,
                                           base_dir=str(tmp_path))
    assert scene.materials.has_beckmann
    ndf = np.asarray(scene.materials.ndf)
    mtype = np.asarray(scene.materials.mtype)
    assert (ndf[mtype == mat.METAL] == mat.NDF_BECKMANN).all()
