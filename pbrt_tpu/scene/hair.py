"""Hair BSDF (Marschner/Chiang model).

TPU-native counterpart of ``materials/hair.{h,cpp}``: longitudinal lobes Mp
(von-Mises-like, hair.cpp:51-61 with the I0/LogI0 Bessel evaluation
:63-83), azimuthal lobes Np via trimmed logistics (:105-129), attenuation
terms Ap for p = R, TT, TRT, and the residual lobe (:85-103), hair-scale
tilt 2^k·alpha rotations (:255-262, :291-312).

Convention (hair.cpp:265-273): the local frame has **x along the fiber**;
sinTheta = w.x, phi = atan2(w.z, w.y). ``h`` ∈ [-1,1] is the azimuthal
offset across the curve width (from the ribbon's v coordinate).

Everything is batched over shading points; evaluation + cosine-hemisphere
sampling pdf (exact importance sampling of Mp/Np lands with the curve-heavy
scenes in a later round; MIS stays consistent because sample and pdf use
the same cosine fallback).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from pbrt_tpu.scene.materials import fr_dielectric

Array = Any

P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069


def _sqr(x):
    return x * x


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def i0(x: Array) -> Array:
    """Modified Bessel I0 via the 10-term series (hair.cpp:63-76)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * ifact * ifact)
        x2i = x2i * x * x
        i4 *= 4.0
    return val


def log_i0(x: Array) -> Array:
    big = x + 0.5 * (-math.log(2 * math.pi) + jnp.log(
        1.0 / jnp.maximum(x, 1e-9)) + 1.0 / (8.0 * jnp.maximum(x, 1e-9)))
    return jnp.where(x > 12.0, big, jnp.log(jnp.maximum(i0(x), 1e-30)))


def mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering lobe (hair.cpp:51-61)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small_v = jnp.exp(log_i0(a) - b - 1.0 / v + 0.6931
                      + jnp.log(1.0 / (2.0 * v)))
    big_v = jnp.exp(-b) * i0(a) / (jnp.sinh(1.0 / v) * 2.0 * v)
    return jnp.where(v <= 0.1, small_v, big_v)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * _sqr(1.0 + e))


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _phi_fn(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * math.pi


def np_lobe(phi, p, s, gamma_o, gamma_t):
    dphi = phi - _phi_fn(p, gamma_o, gamma_t)
    dphi = jnp.mod(dphi + math.pi, 2.0 * math.pi) - math.pi
    return trimmed_logistic(dphi, s, -math.pi, math.pi)


def _variances(beta_m):
    v0 = _sqr(0.726 * beta_m + 0.812 * _sqr(beta_m) + 3.7 * beta_m ** 20)
    return [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]


def _azimuthal_s(beta_n):
    return SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * _sqr(beta_n)
                             + 5.372 * beta_n ** 22)


def _alpha_terms(alpha_deg):
    s0 = math.sin(math.radians(alpha_deg))
    c0 = math.sqrt(max(0.0, 1.0 - s0 * s0))
    sin2k = [s0]
    cos2k = [c0]
    for _ in range(2):
        sin2k.append(2 * cos2k[-1] * sin2k[-1])
        cos2k.append(_sqr(cos2k[-1]) - _sqr(sin2k[-1]))
    return sin2k, cos2k


def hair_f(wo: Array, wi: Array, h: Array, sigma_a: Array,
           beta_m: float = 0.3, beta_n: float = 0.3, alpha: float = 2.0,
           eta: float = 1.55) -> Array:
    """HairBSDF::f (hair.cpp:264-324) batched. wo, wi: (R,3) local (x along
    fiber); h: (R,); sigma_a: (R,C) absorption. Returns (R,C)."""
    sin_to = wo[..., 0]
    cos_to = _safe_sqrt(1.0 - _sqr(sin_to))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = wi[..., 0]
    cos_ti = _safe_sqrt(1.0 - _sqr(sin_ti))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])

    sin_tt = sin_to / eta
    cos_tt = _safe_sqrt(1.0 - _sqr(sin_tt))
    etap = jnp.sqrt(jnp.maximum(eta * eta - _sqr(sin_to), 1e-9)) \
        / jnp.maximum(cos_to, 1e-6)
    sin_gt = h / etap
    cos_gt = _safe_sqrt(1.0 - _sqr(sin_gt))
    gamma_t = jnp.arcsin(jnp.clip(sin_gt, -1.0, 1.0))
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))

    T = jnp.exp(-sigma_a * (2.0 * cos_gt
                            / jnp.maximum(cos_tt, 1e-6))[..., None])

    # attenuation terms (hair.cpp:85-103)
    cos_go = _safe_sqrt(1.0 - _sqr(h))
    f0 = fr_dielectric(cos_to * cos_go, jnp.ones_like(cos_to),
                       jnp.full_like(cos_to, eta))
    ap = [f0[..., None] * jnp.ones_like(T)]
    ap.append(_sqr(1.0 - f0)[..., None] * T)
    for p in range(2, P_MAX):
        ap.append(ap[-1] * T * f0[..., None])
    ap.append(ap[P_MAX - 1] * f0[..., None] * T
              / jnp.maximum(1.0 - T * f0[..., None], 1e-4))

    v = _variances(beta_m)
    s = _azimuthal_s(beta_n)
    sin2k, cos2k = _alpha_terms(alpha)
    phi = phi_i - phi_o

    fsum = jnp.zeros_like(T)
    for p in range(P_MAX):
        if p == 0:
            sin_top = sin_to * cos2k[1] - cos_to * sin2k[1]
            cos_top = cos_to * cos2k[1] + sin_to * sin2k[1]
        elif p == 1:
            sin_top = sin_to * cos2k[0] + cos_to * sin2k[0]
            cos_top = cos_to * cos2k[0] - sin_to * sin2k[0]
        else:
            sin_top = sin_to * cos2k[2] + cos_to * sin2k[2]
            cos_top = cos_to * cos2k[2] - sin_to * sin2k[2]
        cos_top = jnp.abs(cos_top)
        fsum = fsum + (mp(cos_ti, cos_top, sin_ti, sin_top, v[p])
                       * np_lobe(phi, p, s, gamma_o, gamma_t))[..., None] \
            * ap[p]
    fsum = fsum + (mp(cos_ti, cos_to, sin_ti, sin_to, v[P_MAX])
                   / (2.0 * math.pi))[..., None] * ap[P_MAX]
    abs_cos_wi = jnp.abs(wi[..., 2])
    return fsum / jnp.maximum(abs_cos_wi, 1e-6)[..., None]


def sigma_a_from_concentration(ce: float, cp: float) -> jnp.ndarray:
    """HairBSDF::SigmaAFromConcentration (hair.cpp): eumelanin/pheomelanin
    concentrations → RGB absorption."""
    eumelanin = jnp.asarray([0.419, 0.697, 1.37])
    pheomelanin = jnp.asarray([0.187, 0.4, 1.05])
    return ce * eumelanin + cp * pheomelanin


def sigma_a_from_reflectance(c: Array, beta_n: float) -> Array:
    """HairBSDF::SigmaAFromReflectance (hair.cpp)."""
    denom = (5.969 - 0.215 * beta_n + 2.532 * _sqr(beta_n)
             - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
             + 0.245 * beta_n ** 5)
    return _sqr(jnp.log(jnp.maximum(c, 1e-4)) / denom)
