"""TabulatedBSSRDF photon-beam-diffusion tables + device-side profile
sampling.

Role of pbrt's BSSRDF machinery (core/bssrdf.{h,cpp}):
- the beam-diffusion table build `ComputeBeamDiffusionBSSRDF`
  (bssrdf.cpp:145-172) with its `BeamDiffusionMS` (:68-121, classical
  dipole with Grosjean's non-classical diffusion coefficient, extrapolated
  boundary via Fresnel moments) and `BeamDiffusionSS` (:122-144, single
  scattering) integrands — HOST-side numpy, cold path, vectorized over the
  (rho, radius, depth-sample) grid instead of pbrt's scalar ParallelFor;
- `SubsurfaceFromDiffuse` (bssrdf.cpp:174-184): kdsubsurface's
  (diffuse-albedo, mfp) → (sigma_a, sigma_s) inversion through the table;
- `TabulatedBSSRDF::{Sr,Sample_Sr,Pdf_Sr}` (bssrdf.cpp:198-231, 355-392):
  DEVICE-side, vectorized over rays. Because material scattering
  parameters are static scene data here, the rho-dimension Catmull-Rom
  interpolation (the `interpolate` lambda of SampleCatmullRom2D,
  interpolation.cpp:172-258) is folded at scene-build time into ONE
  per-(material,channel) radial profile/CDF over the shared optical-radius
  grid; the device only ever does 1-D spline work in radius. Sampling
  inverts the integrated spline exactly like `SampleCatmullRom`
  (interpolation.cpp:105-170): segment lookup by CDF comparison sums (no
  index gathers — ops/fastgather.py hazard), linear-interpolant initial
  guess, then fixed-count Newton/bisection in vectorized form.

The Catmull-Rom helpers (`_cr_weights`, `integrate_catmull_rom`,
`invert_catmull_rom`) are ports of the published pbrt spline algorithms
(interpolation.cpp:61-103, 260-330) — small numeric utilities restated in
numpy, labeled per COPYING policy like scene/fourier.py's.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = Any

N_RHO = 100        # BSSRDFTable(100, 64): materials/subsurface.cpp:137
N_RADIUS = 64


# ---------------------------------------------------------------------------
# host-side table build (numpy, cold path)
# ---------------------------------------------------------------------------

def fresnel_moment1(eta: float) -> float:
    """First Fresnel reflectance moment fit (bssrdf.cpp:43-53)."""
    e = np.asarray(eta, np.float64)
    e2, e3, e4, e5 = e * e, e**3, e**4, e**5
    lo = (0.45966 - 1.73965 * e + 3.37668 * e2 - 3.904945 * e3
          + 2.49277 * e4 - 0.68441 * e5)
    hi = (-4.61686 + 11.1136 * e - 10.4646 * e2 + 5.11455 * e3
          - 1.27198 * e4 + 0.12746 * e5)
    return float(np.where(e < 1, lo, hi))


def fresnel_moment2(eta: float) -> float:
    """Second Fresnel reflectance moment fit (bssrdf.cpp:54-66)."""
    e = np.asarray(eta, np.float64)
    e2, e3, e4, e5 = e * e, e**3, e**4, e**5
    lo = (0.27614 - 0.87350 * e + 1.12077 * e2 - 0.65095 * e3
          + 0.07883 * e4 + 0.04860 * e5)
    r = 1.0 / np.maximum(e, 1e-9)
    r2, r3 = r * r, r**3
    hi = (-547.033 + 45.3087 * r3 - 218.725 * r2 + 458.843 * r
          + 404.557 * e - 189.519 * e2 + 54.9327 * e3 - 9.00603 * e4
          + 0.63942 * e5)
    return float(np.where(e < 1, lo, hi))


def _fr_dielectric_np(cos_i, eta_i, eta_t):
    """Host FrDielectric (core/reflection.cpp:47-64 semantics)."""
    cos_i = np.clip(cos_i, -1.0, 1.0)
    swap = cos_i <= 0
    ei = np.where(swap, eta_t, eta_i)
    et = np.where(swap, eta_i, eta_t)
    ci = np.abs(cos_i)
    s_i = np.sqrt(np.maximum(0.0, 1.0 - ci * ci))
    s_t = ei / et * s_i
    tir = s_t >= 1
    ct = np.sqrt(np.maximum(0.0, 1.0 - s_t * s_t))
    r_par = (et * ci - ei * ct) / np.maximum(et * ci + ei * ct, 1e-12)
    r_per = (ei * ci - et * ct) / np.maximum(ei * ci + et * ct, 1e-12)
    fr = 0.5 * (r_par * r_par + r_per * r_per)
    return np.where(tir, 1.0, fr)


def beam_diffusion_ms(rho, sigma_a_unit, g, eta, r):
    """Multiple-scattering beam-diffusion term Ed(r) (bssrdf.cpp:68-121).
    rho/sigma_a_unit are unit-density coefficients (sigma_t=1); vectorized
    over broadcastable rho, r."""
    n = 100
    rho = np.asarray(rho, np.float64)
    r = np.asarray(r, np.float64)
    sigma_s = rho
    sigma_a = sigma_a_unit
    sigmap_s = sigma_s * (1 - g)
    sigmap_t = sigma_a + sigmap_s
    rhop = sigmap_s / np.maximum(sigmap_t, 1e-12)
    d_g = (2 * sigma_a + sigmap_s) / (3 * sigmap_t * sigmap_t)
    sigma_tr = np.sqrt(sigma_a / d_g)
    fm1, fm2 = fresnel_moment1(eta), fresnel_moment2(eta)
    ze = -2 * d_g * (1 + 3 * fm2) / (1 - 2 * fm1)
    c_phi = 0.25 * (1 - 2 * fm1)
    c_e = 0.5 * (1 - 3 * fm2)
    i = (np.arange(n) + 0.5) / n
    # depth samples: exponential in sigmap_t (importance samples the beam)
    zr = -np.log(1 - i)[..., :] / sigmap_t[..., None]
    rr = r[..., None]
    zv = -zr + 2 * ze[..., None]
    dr = np.sqrt(rr * rr + zr * zr)
    dv = np.sqrt(rr * rr + zv * zv)
    st = sigma_tr[..., None]
    inv4pi = 1.0 / (4 * np.pi)
    phi_d = inv4pi / d_g[..., None] * (np.exp(-st * dr) / dr
                                       - np.exp(-st * dv) / dv)
    edn = inv4pi * (zr * (1 + st * dr) * np.exp(-st * dr) / dr**3
                    - zv * (1 + st * dv) * np.exp(-st * dv) / dv**3)
    e = phi_d * c_phi + edn * c_e
    kappa = 1 - np.exp(-2 * sigmap_t[..., None] * (dr + zr))
    return (kappa * (rhop * rhop)[..., None] * e).mean(-1)


def beam_diffusion_ss(rho, sigma_a_unit, g, eta, r):
    """Single-scattering term Ess(r) (bssrdf.cpp:122-144)."""
    n = 100
    rho = np.asarray(rho, np.float64)
    r = np.asarray(r, np.float64)
    sigma_t = np.asarray(rho + sigma_a_unit)  # = 1 by construction
    t_crit = r * np.sqrt(max(eta * eta - 1.0, 0.0))
    i = (np.arange(n) + 0.5) / n
    ti = t_crit[..., None] - np.log(1 - i) / sigma_t[..., None]
    rr = r[..., None]
    d = np.sqrt(rr * rr + ti * ti)
    cos_o = ti / d
    # Henyey-Greenstein phase (core/medium.h PhaseHG)
    denom = 1 + g * g + 2 * g * cos_o
    phase = (1 - g * g) / (4 * np.pi * denom * np.sqrt(
        np.maximum(denom, 1e-12)))
    fr = _fr_dielectric_np(-cos_o, 1.0, eta)
    ess = (rho[..., None] * np.exp(-sigma_t[..., None]
                                   * (d + t_crit[..., None]))
           / (d * d) * phase * (1 - fr) * np.abs(cos_o))
    return ess.mean(-1)


def _cr_weights_np(nodes, x):
    """CatmullRomWeights (interpolation.cpp:61-103), scalar host form.
    Returns (ok, offset, w[4])."""
    n = len(nodes)
    if not (nodes[0] <= x <= nodes[n - 1]):
        return False, 0, np.zeros(4)
    idx = int(np.searchsorted(nodes, x, side="right") - 1)
    idx = min(max(idx, 0), n - 2)
    x0, x1 = nodes[idx], nodes[idx + 1]
    t = (x - x0) / (x1 - x0)
    t2, t3 = t * t, t * t * t
    w = np.zeros(4)
    w[1] = 2 * t3 - 3 * t2 + 1
    w[2] = -2 * t3 + 3 * t2
    if idx > 0:
        w0 = (t3 - 2 * t2 + t) * (x1 - x0) / (x1 - nodes[idx - 1])
        w[0] = -w0
        w[2] += w0
    else:
        w0 = t3 - 2 * t2 + t
        w[1] -= w0
        w[2] += w0
    if idx + 2 < n:
        w3 = (t3 - t2) * (x1 - x0) / (nodes[idx + 2] - x0)
        w[1] -= w3
        w[3] = w3
    else:
        w3 = t3 - t2
        w[1] -= w3
        w[2] += w3
    return True, idx - 1, w


def integrate_catmull_rom(x, values):
    """IntegrateCatmullRom (interpolation.cpp:260-287): spline integral +
    CDF, vectorized over leading dims of ``values`` (..., n)."""
    x = np.asarray(x, np.float64)
    v = np.asarray(values, np.float64)
    n = x.shape[-1]
    cdf = np.zeros(v.shape, np.float64)
    s = 0.0
    for i in range(n - 1):
        x0, x1 = x[i], x[i + 1]
        f0, f1 = v[..., i], v[..., i + 1]
        width = x1 - x0
        if i > 0:
            d0 = width * (f1 - v[..., i - 1]) / (x1 - x[i - 1])
        else:
            d0 = f1 - f0
        if i + 2 < n:
            d1 = width * (v[..., i + 2] - f0) / (x[i + 2] - x0)
        else:
            d1 = f1 - f0
        s = s + ((d0 - d1) / 12.0 + (f0 + f1) * 0.5) * width
        cdf[..., i + 1] = s
    return cdf[..., -1], cdf


def invert_catmull_rom(x, values, u):
    """InvertCatmullRom (interpolation.cpp:288-330): solve values(t)=u on
    the monotone spline; scalar host form."""
    x = np.asarray(x, np.float64)
    v = np.asarray(values, np.float64)
    n = len(x)
    if not u > v[0]:
        return float(x[0])
    if not u < v[n - 1]:
        return float(x[n - 1])
    i = int(np.searchsorted(v, u, side="right") - 1)
    i = min(max(i, 0), n - 2)
    x0, x1 = x[i], x[i + 1]
    f0, f1 = v[i], v[i + 1]
    width = x1 - x0
    d0 = width * (f1 - v[i - 1]) / (x1 - x[i - 1]) if i > 0 else f1 - f0
    d1 = width * (v[i + 2] - f0) / (x[i + 2] - x0) if i + 2 < n else f1 - f0
    a, b, t = 0.0, 1.0, 0.5
    for _ in range(32):
        if not (a < t < b):
            t = 0.5 * (a + b)
        t2, t3 = t * t, t * t * t
        fhat = ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
                + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
        dfhat = ((6 * t2 - 6 * t) * f0 + (-6 * t2 + 6 * t) * f1
                 + (3 * t2 - 4 * t + 1) * d0 + (3 * t2 - 2 * t) * d1)
        if abs(fhat - u) < 1e-6 * max(abs(u), 1e-6) or b - a < 1e-6:
            break
        if fhat - u < 0:
            a = t
        else:
            b = t
        t -= (fhat - u) / dfhat if dfhat != 0 else 0.0
    return float(x0 + width * t)


_TABLE_CACHE: dict = {}


def _radius_grid():
    """The 64-sample geometric optical-radius grid shared by every
    tabulated profile (bssrdf.cpp:152-155)."""
    radius = np.zeros(N_RADIUS)
    radius[1] = 2.5e-3
    for i in range(2, N_RADIUS):
        radius[i] = radius[i - 1] * 1.2
    return radius


def compute_table(g: float, eta: float):
    """ComputeBeamDiffusionBSSRDF (bssrdf.cpp:145-172): returns dict with
    rho (100,), radius (64,), profile (100,64), cdf (100,64), rho_eff
    (100,) — all float64 numpy. Cached by (g, eta)."""
    key = (round(float(g), 6), round(float(eta), 6))
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    radius = _radius_grid()
    rho = (1 - np.exp(-8 * np.arange(N_RHO) / (N_RHO - 1))) \
        / (1 - np.exp(-8))
    rg = rho[:, None] * np.ones(N_RADIUS)[None, :]
    rr = np.ones(N_RHO)[:, None] * radius[None, :]
    prof = 2 * np.pi * rr * (
        beam_diffusion_ss(rg, 1 - rg, g, eta, rr)
        + beam_diffusion_ms(rg, 1 - rg, g, eta, rr))
    rho_eff, cdf = integrate_catmull_rom(radius, prof)
    out = dict(rho=rho, radius=radius, profile=prof, cdf=cdf,
               rho_eff=rho_eff)
    _TABLE_CACHE[key] = out
    return out


def subsurface_from_diffuse(kd, mfp, g: float, eta: float):
    """SubsurfaceFromDiffuse (bssrdf.cpp:174-184): per-channel
    (sigma_a, sigma_s) whose beam-diffusion effective albedo equals kd."""
    t = compute_table(g, eta)
    kd = np.atleast_1d(np.asarray(kd, np.float64))
    mfp = np.broadcast_to(np.atleast_1d(np.asarray(mfp, np.float64)),
                          kd.shape)
    sigma_s = np.zeros_like(kd)
    sigma_a = np.zeros_like(kd)
    for c in range(kd.shape[0]):
        rho = invert_catmull_rom(t["rho"], t["rho_eff"], kd[c])
        sigma_s[c] = rho / mfp[c]
        sigma_a[c] = (1 - rho) / mfp[c]
    return sigma_a, sigma_s


def material_profiles(sigma_a, sigma_s, g: float, eta: float):
    """Fold the rho-dimension CR interpolation of TabulatedBSSRDF
    (bssrdf.cpp:198-231 'rhoWeights') into per-channel radial tables.

    Returns dict of numpy arrays: profile (C, 64), cdf (C, 64) (un-
    normalized, cdf[...,-1] = rho_eff), rho_eff (C,), sigma_t (C,),
    r_max_world (C,) (= Sample_Sr(ch, 0.999), bssrdf.cpp:373-378 rMax)."""
    t = compute_table(g, eta)
    sigma_a = np.atleast_1d(np.asarray(sigma_a, np.float64))
    sigma_s = np.atleast_1d(np.asarray(sigma_s, np.float64))
    sigma_t = sigma_a + sigma_s
    rho = np.where(sigma_t > 0, sigma_s / np.maximum(sigma_t, 1e-12), 0.0)
    C = rho.shape[0]
    prof = np.zeros((C, N_RADIUS))
    cdf = np.zeros((C, N_RADIUS))
    rho_eff = np.zeros(C)
    rmax = np.zeros(C)
    for c in range(C):
        ok, off, w = _cr_weights_np(t["rho"], rho[c])
        if not ok:
            continue
        for i in range(4):
            if w[i] == 0:
                continue
            j = min(max(off + i, 0), N_RHO - 1)
            prof[c] += w[i] * t["profile"][j]
            cdf[c] += w[i] * t["cdf"][j]
            rho_eff[c] += w[i] * t["rho_eff"][j]
        # negative CR overshoot would break CDF inversion monotonicity
        prof[c] = np.maximum(prof[c], 0.0)
        if cdf[c, -1] > 0 and sigma_t[c] > 0:
            r_opt = invert_catmull_rom(t["radius"], cdf[c],
                                       0.999 * cdf[c, -1])
            rmax[c] = r_opt / sigma_t[c]
    return dict(profile=prof, cdf=cdf, rho_eff=rho_eff,
                sigma_t=sigma_t, r_max=rmax, radius=t["radius"])


def disney_profiles(sd):
    """DisneyBSSRDF radial tables (materials/disney.cpp:365-470).

    Burley's normalized diffusion Sr(r) = R·(e^{-r/d}+e^{-r/(3d)})/(8π d r)
    with d = 0.2·scatterdistance (the empirical 0.2 of disney.cpp:371-372)
    factors as R·p(r; d) where p is a normalized polar pdf. In optical
    units x = r·sigma_t with sigma_t = 1/d, the tabulated integrand
    2π·r·Sr/R becomes (e^{-x} + e^{-x/3})/4, whose integral over x is
    exactly 1 — so these rows slot straight into the TabulatedBSSRDF
    machinery (sample_sr / eval_profile) with rho_eff = cdf[-1] ≈ 1, and
    the (possibly textured) R = diffuseWeight·color multiplies at eval
    time in subsurface_transport. CDF inversion over the tabulated
    profile is statistically equivalent to pbrt's two-exponential MIS
    shortcut (disney.cpp:419-459): both sample the same normalized
    density. Channels with scatterdistance 0 get sigma_t = 0 (never
    sampled, zero contribution)."""
    sd = np.atleast_1d(np.asarray(sd, np.float64))
    C = sd.shape[0]
    radius = _radius_grid()
    prof = np.zeros((C, N_RADIUS))
    cdf = np.zeros((C, N_RADIUS))
    rho_eff = np.zeros(C)
    sigma_t = np.zeros(C)
    rmax = np.zeros(C)
    shape = (np.exp(-radius) + np.exp(-radius / 3.0)) / 4.0
    total, cdf_row = integrate_catmull_rom(radius, shape[None, :])
    r_opt_999 = invert_catmull_rom(radius, cdf_row[0], 0.999 * total[0])
    for c in range(C):
        d = 0.2 * sd[c]
        if d <= 0:
            continue
        sigma_t[c] = 1.0 / d
        prof[c] = shape
        cdf[c] = cdf_row[0]
        rho_eff[c] = total[0]
        rmax[c] = r_opt_999 * d
    return dict(profile=prof, cdf=cdf, rho_eff=rho_eff,
                sigma_t=sigma_t, r_max=rmax, radius=radius)


# ---------------------------------------------------------------------------
# scene-level table container
# ---------------------------------------------------------------------------

import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SSSTables:
    """Per-(material,channel) flattened radial tables, device-resident.
    Kept OUT of MaterialTable so gather_materials never gathers (R,C,64)
    blocks; subsurface_transport gathers single (mat,ch) rows on demand."""
    radius: Array      # (64,) shared optical-radius grid
    profile: Array     # (M*C, 64)
    cdf: Array         # (M*C, 64) unnormalized; [..., -1] = rho_eff
    rho_eff: Array     # (M*C,)
    sigma_t: Array     # (M*C,)
    r_max: Array       # (M*C,) world-space 0.999-quantile radius


def row_is_disney_sss(r: dict) -> bool:
    """Material row builds a DisneyBSSRDF: disney type, non-black
    scatterdistance, not thin (disney.cpp:506-527 takes the thin branch
    before the BSSRDF one)."""
    from pbrt_tpu.scene import materials as mat_mod
    return (r.get("type") == mat_mod.DISNEY
            and float(np.max(np.asarray(r.get("scatter_d", 0.0)))) > 0
            and not r.get("thin", 0.0))


def build_scene_tables(rows, n_channels: int) -> SSSTables | None:
    """Build SSSTables for a SceneBuilder material-row list (cold path).
    Covers both TabulatedBSSRDF rows (SUBSURFACE material) and
    DisneyBSSRDF rows (disney material with scatterdistance)."""
    from pbrt_tpu.scene import materials as mat_mod
    if not any(r.get("type") == mat_mod.SUBSURFACE or row_is_disney_sss(r)
               for r in rows):
        return None
    m = len(rows)
    C = n_channels
    prof = np.zeros((m, C, N_RADIUS), np.float32)
    cdf = np.zeros((m, C, N_RADIUS), np.float32)
    rho_eff = np.zeros((m, C), np.float32)
    sigma_t = np.zeros((m, C), np.float32)
    r_max = np.zeros((m, C), np.float32)
    radius = _radius_grid()
    for i, r in enumerate(rows):
        if row_is_disney_sss(r):
            sd = np.broadcast_to(np.asarray(r.get("scatter_d", 0.0),
                                            np.float64), (C,))
            p = disney_profiles(sd)
        elif r.get("type") == mat_mod.SUBSURFACE:
            sa = np.broadcast_to(np.asarray(r.get("sss_sigma_a", 0.01),
                                            np.float64), (C,))
            ss = np.broadcast_to(np.asarray(r.get("sss_sigma_s", 1.0),
                                            np.float64), (C,))
            p = material_profiles(sa, ss, float(r.get("sss_g", 0.0)),
                                  float(r.get("eta", 1.33)))
        else:
            continue
        prof[i] = p["profile"]
        cdf[i] = p["cdf"]
        rho_eff[i] = p["rho_eff"]
        sigma_t[i] = p["sigma_t"]
        r_max[i] = p["r_max"]
        radius = p["radius"]
    return SSSTables(
        radius=jnp.asarray(radius, jnp.float32),
        profile=jnp.asarray(prof.reshape(m * C, N_RADIUS)),
        cdf=jnp.asarray(cdf.reshape(m * C, N_RADIUS)),
        rho_eff=jnp.asarray(rho_eff.reshape(-1)),
        sigma_t=jnp.asarray(sigma_t.reshape(-1)),
        r_max=jnp.asarray(r_max.reshape(-1)))


# ---------------------------------------------------------------------------
# device-side sampling / evaluation (vectorized over rays)
# ---------------------------------------------------------------------------

def _segment_lookup(cdf_rows: Array, u_abs: Array):
    """FindInterval over the radius axis by comparison sum (gather-free):
    largest i with cdf[i] <= u, clamped to [0, n-2]."""
    n = cdf_rows.shape[-1]
    idx = jnp.sum((cdf_rows <= u_abs[:, None]).astype(jnp.int32),
                  axis=-1) - 1
    return jnp.clip(idx, 0, n - 2)


def _tap(rows: Array, idx: Array) -> Array:
    """rows[r, idx[r]] via one-hot dot (radius axis is 64-wide)."""
    from pbrt_tpu.ops import fastgather
    return fastgather.select_along_last(rows, idx)


def _spline_coeffs(x_grid: Array, rows: Array, idx: Array):
    """Segment endpoints + finite-difference derivatives of the CR
    interpolant (the d0/d1 scheme of interpolation.cpp:105-170)."""
    n = rows.shape[-1]
    x0 = x_grid[idx]
    x1 = x_grid[jnp.minimum(idx + 1, n - 1)]
    # x_grid is a host-constant (64,): indexing it with a traced idx is a
    # tiny gather; replace with one-hot against the broadcast grid
    grid = jnp.broadcast_to(x_grid[None, :], rows.shape)
    x0 = _tap(grid, idx)
    x1 = _tap(grid, jnp.minimum(idx + 1, n - 1))
    f0 = _tap(rows, idx)
    f1 = _tap(rows, jnp.minimum(idx + 1, n - 1))
    fm1 = _tap(rows, jnp.maximum(idx - 1, 0))
    fp2 = _tap(rows, jnp.minimum(idx + 2, n - 1))
    xm1 = _tap(grid, jnp.maximum(idx - 1, 0))
    xp2 = _tap(grid, jnp.minimum(idx + 2, n - 1))
    width = x1 - x0
    d0 = jnp.where(idx > 0,
                   width * (f1 - fm1) / jnp.maximum(x1 - xm1, 1e-20),
                   f1 - f0)
    d1 = jnp.where(idx + 2 < n,
                   width * (fp2 - f0) / jnp.maximum(xp2 - x0, 1e-20),
                   f1 - f0)
    return x0, x1, width, f0, f1, d0, d1


def sample_sr(tables: SSSTables, row_id: Array, u: Array):
    """TabulatedBSSRDF::Sample_Sr (bssrdf.cpp:355-362 →
    SampleCatmullRom2D, interpolation.cpp:172-258) vectorized: returns
    (r_world, valid). row_id = mat*C + ch into the flattened tables."""
    from pbrt_tpu.ops import fastgather
    R = row_id.shape[0]
    g_prof = fastgather.make_row_gather(tables.profile.shape[0], row_id)
    prof = g_prof(tables.profile)        # (R, 64)
    cdf = g_prof(tables.cdf)
    s_t = g_prof(tables.sigma_t)
    total = cdf[:, -1]
    valid = (s_t > 0) & (total > 0)
    u_abs = u * total
    idx = _segment_lookup(cdf, u_abs)
    x0, x1, width, f0, f1, d0, d1 = _spline_coeffs(tables.radius, prof,
                                                   idx)
    cdf0 = _tap(cdf, idx)
    up = (u_abs - cdf0) / jnp.maximum(width, 1e-20)
    # linear-interpolant initial guess, then Newton/bisection (8 fixed
    # iterations; pbrt iterates to 1e-6 — 8 steps reach that for this
    # smooth monotone integrand)
    disc = jnp.maximum(f0 * f0 + 2.0 * up * (f1 - f0), 0.0)
    t = jnp.where(jnp.abs(f0 - f1) > 1e-20,
                  (f0 - jnp.sqrt(disc)) / (f0 - f1),
                  up / jnp.maximum(f0, 1e-20))
    a = jnp.zeros(R)
    b = jnp.ones(R)
    for _ in range(8):
        t = jnp.where((t >= a) & (t <= b), t, 0.5 * (a + b))
        fhat_i = t * (f0 + t * (0.5 * d0 + t * (
            (1.0 / 3.0) * (-2 * d0 - d1) + f1 - f0
            + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1)))))
        fhat = f0 + t * (d0 + t * (-2 * d0 - d1 + 3 * (f1 - f0)
                                   + t * (d0 + d1 + 2 * (f0 - f1))))
        below = fhat_i - up < 0
        a = jnp.where(below, t, a)
        b = jnp.where(below, b, t)
        t = t - (fhat_i - up) / jnp.where(jnp.abs(fhat) > 1e-20, fhat, 1.0)
    t = jnp.clip(t, 0.0, 1.0)
    r_opt = x0 + width * t
    r_world = r_opt / jnp.maximum(s_t, 1e-20)
    return jnp.where(valid, r_world, -1.0), valid


def eval_profile_multi(tables: SSSTables, row_id: Array, radii):
    """eval_profile at several world radii sharing ONE row gather.
    Returns (list of sr_hat per radius, sigma_t, rho_eff)."""
    from pbrt_tpu.ops import fastgather
    g_prof = fastgather.make_row_gather(tables.profile.shape[0], row_id)
    prof = g_prof(tables.profile)
    s_t = g_prof(tables.sigma_t)
    rho_eff = g_prof(tables.rho_eff)
    n = prof.shape[-1]
    grid = jnp.broadcast_to(tables.radius[None, :], prof.shape)
    outs = []
    for r_world in radii:
        r_opt = r_world * s_t
        idx = jnp.sum((grid <= r_opt[:, None]).astype(jnp.int32),
                      axis=-1) - 1
        idx = jnp.clip(idx, 0, n - 2)
        x0, x1, width, f0, f1, d0, d1 = _spline_coeffs(
            tables.radius, prof, idx)
        t = jnp.clip((r_opt - x0) / jnp.maximum(width, 1e-20), 0.0, 1.0)
        t2 = t * t
        t3 = t2 * t
        val = ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
               + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
        in_range = (r_opt >= tables.radius[0]) \
            & (r_opt <= tables.radius[-1])
        val = jnp.where(in_range, jnp.maximum(val, 0.0), 0.0)
        outs.append(val / jnp.maximum(2.0 * jnp.pi * r_opt, 1e-12)
                    * s_t * s_t)
    return outs, s_t, rho_eff


def eval_profile(tables: SSSTables, row_id: Array, r_world: Array):
    """CR-interpolated profile value at optical radius (the inner sum of
    TabulatedBSSRDF::Sr / Pdf_Sr, bssrdf.cpp:198-231, 364-392), plus the
    per-row (sigma_t, rho_eff). Returns (sr_hat, sigma_t, rho_eff) where
    sr_hat = profile(r_opt) / (2π r_opt) · sigma_t² (≥ 0)."""
    from pbrt_tpu.ops import fastgather
    g_prof = fastgather.make_row_gather(tables.profile.shape[0], row_id)
    prof = g_prof(tables.profile)
    s_t = g_prof(tables.sigma_t)
    rho_eff = g_prof(tables.rho_eff)
    r_opt = r_world * s_t
    n = prof.shape[-1]
    grid = jnp.broadcast_to(tables.radius[None, :], prof.shape)
    idx = jnp.sum((grid <= r_opt[:, None]).astype(jnp.int32), axis=-1) - 1
    idx = jnp.clip(idx, 0, n - 2)
    x0, x1, width, f0, f1, d0, d1 = _spline_coeffs(tables.radius, prof,
                                                   idx)
    t = jnp.clip((r_opt - x0) / jnp.maximum(width, 1e-20), 0.0, 1.0)
    t2 = t * t
    t3 = t2 * t
    val = ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
           + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
    in_range = (r_opt >= tables.radius[0]) & (r_opt <= tables.radius[-1])
    val = jnp.where(in_range, jnp.maximum(val, 0.0), 0.0)
    sr_hat = val / jnp.maximum(2.0 * jnp.pi * r_opt, 1e-12) * s_t * s_t
    return sr_hat, s_t, rho_eff
