"""imgtool: assemble / cat / convert / diff / info.

TPU-native counterpart of ``src/tools/imgtool.cpp:32-36`` — `diff` with
--difftol (imgtool.cpp:67-71) is the image-comparison oracle used by
regression tests.

Usage: python -m pbrt_tpu.tools.imgtool <cmd> [args]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from pbrt_tpu.utils import imageio


def cmd_info(args):
    img = imageio.read_image(args.image)
    print(f"{args.image}: {img.shape[1]} x {img.shape[0]}")
    print(f"  min: {img.min(axis=(0, 1))}")
    print(f"  max: {img.max(axis=(0, 1))}")
    print(f"  avg: {img.mean(axis=(0, 1))}")
    ok = np.isfinite(img)
    if not ok.all():
        print(f"  WARNING: {np.size(img) - ok.sum()} non-finite values")
    return 0


def cmd_diff(args):
    a = imageio.read_image(args.image1)
    b = imageio.read_image(args.image2)
    if a.shape != b.shape:
        print(f"images differ in resolution: {a.shape} vs {b.shape}")
        return 1
    d = np.abs(a - b)
    denom = np.abs(a) + np.abs(b)
    rel = 2.0 * d / np.where(denom > 0, denom, 1.0)
    n_diff = (rel > args.difftol).sum()
    mse = float((d * d).mean())
    print(f"images differ: {n_diff} pixels above tol {args.difftol}, "
          f"MSE {mse:.6g}, avg abs diff {float(d.mean()):.6g}")
    if args.outfile:
        imageio.write_image(args.outfile, d)
    return 1 if n_diff > 0 else 0


def cmd_convert(args):
    img = imageio.read_image(args.infile)
    img = img * args.scale
    if args.tonemap:
        img = img / (1.0 + img)
    if args.gamma != 1.0:
        img = np.power(np.clip(img, 0, None), 1.0 / args.gamma)
    if args.despike < float("inf"):
        # clamp fireflies (imgtool.cpp despike)
        img = np.minimum(img, args.despike)
    imageio.write_image(args.outfile, img)
    return 0


def cmd_cat(args):
    img = imageio.read_image(args.image)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            print(f"({x}, {y}): ({img[y, x, 0]:.6g}, {img[y, x, 1]:.6g}, "
                  f"{img[y, x, 2]:.6g})")
    return 0


def cmd_assemble(args):
    """Merge non-overlapping crops into one image (imgtool assemble)."""
    imgs = [imageio.read_image(p) for p in args.images]
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    out = np.zeros((h, w, 3), np.float32)
    cnt = np.zeros((h, w, 1), np.float32)
    for i in imgs:
        out[:i.shape[0], :i.shape[1]] += i
        cnt[:i.shape[0], :i.shape[1]] += 1
    out = out / np.maximum(cnt, 1)
    imageio.write_image(args.outfile, out)
    return 0


def cmd_makesky(args):
    """Analytic clear-sky environment map (imgtool makesky's role,
    tools/imgtool.cpp + ext/ArHosekSkyModel.c). The reference uses the
    Hošek–Wilkie dataset; here the Preetham et al. 1999 analytic model
    (Perez functions + zenith chromaticity fits) generates the lat-long
    map — same usage, no multi-megabyte coefficient tables."""
    T = args.turbidity
    elev = np.radians(args.elevation)
    res = args.resolution
    theta_s = np.pi / 2 - elev

    # lat-long grid (z-up): rows θ ∈ [0, π] from zenith, columns
    # φ ∈ [0, 2π); below-horizon rows are written black
    H, W = res, 2 * res
    v, u = np.meshgrid((np.arange(H) + 0.5) / H,
                       (np.arange(W) + 0.5) / W, indexing="ij")
    theta = v * np.pi              # polar from zenith
    phi = u * 2 * np.pi
    d = np.stack([np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi),
                  np.cos(theta)], -1)
    sun = np.asarray([np.cos(elev), 0.0, np.sin(elev)])
    cos_g = np.clip(d @ sun, -1.0, 1.0)
    gamma = np.arccos(cos_g)
    cos_t = np.clip(np.cos(theta), 1e-3, 1.0)

    def perez(A, B, C, D, E, th_cos, g, g_cos):
        return ((1 + A * np.exp(B / th_cos))
                * (1 + C * np.exp(D * g) + E * g_cos * g_cos))

    # Preetham coefficient fits (turbidity-linear)
    cY = (0.1787 * T - 1.4630, -0.3554 * T + 0.4275,
          -0.0227 * T + 5.3251, 0.1206 * T - 2.5771,
          -0.0670 * T + 0.3703)
    cx = (-0.0193 * T - 0.2592, -0.0665 * T + 0.0008,
          -0.0004 * T + 0.2125, -0.0641 * T - 0.8989,
          -0.0033 * T + 0.0452)
    cy = (-0.0167 * T - 0.2608, -0.0950 * T + 0.0092,
          -0.0079 * T + 0.2102, -0.0441 * T - 1.6537,
          -0.0109 * T + 0.0529)

    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2 * theta_s)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192
    tv = np.asarray([T * T, T, 1.0])
    sv = np.asarray([theta_s ** 3, theta_s ** 2, theta_s, 1.0])
    Mx = np.asarray([[0.00166, -0.00375, 0.00209, 0.0],
                     [-0.02903, 0.06377, -0.03202, 0.00394],
                     [0.11693, -0.21196, 0.06052, 0.25886]])
    My = np.asarray([[0.00275, -0.00610, 0.00317, 0.0],
                     [-0.04214, 0.08970, -0.04153, 0.00516],
                     [0.15346, -0.26756, 0.06670, 0.26688]])
    xz = tv @ Mx @ sv
    yz = tv @ My @ sv

    def ratio(c, zen):
        num = perez(*c, cos_t, gamma, cos_g)
        den = perez(*c, 1.0, theta_s, np.cos(theta_s))
        return zen * num / np.maximum(den, 1e-9)

    Y = ratio(cY, max(Yz, 0.0))
    x = ratio(cx, xz)
    y = ratio(cy, yz)
    # xyY → XYZ → linear sRGB
    y_s = np.maximum(y, 1e-5)
    X = x / y_s * Y
    Z = (1 - x - y) / y_s * Y
    M = np.asarray([[3.2406, -1.5372, -0.4986],
                    [-0.9689, 1.8758, 0.0415],
                    [0.0557, -0.2040, 1.0570]])
    rgb = np.einsum("ij,hwj->hwi", M, np.stack([X, Y, Z], -1))
    rgb = np.clip(rgb, 0.0, None) * args.scale
    rgb[theta > np.pi / 2 - 1e-3] = 0.0   # below horizon
    imageio.write_image(args.outfile, rgb.astype(np.float32))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    p.add_argument("image")

    p = sub.add_parser("diff")
    p.add_argument("image1")
    p.add_argument("image2")
    p.add_argument("--difftol", type=float, default=0.0)
    p.add_argument("--outfile", default=None)

    p = sub.add_parser("convert")
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--tonemap", action="store_true")
    p.add_argument("--despike", type=float, default=float("inf"))

    p = sub.add_parser("cat")
    p.add_argument("image")

    p = sub.add_parser("assemble")
    p.add_argument("outfile")
    p.add_argument("images", nargs="+")

    p = sub.add_parser("makesky")
    p.add_argument("outfile")
    p.add_argument("--turbidity", type=float, default=3.0)
    p.add_argument("--elevation", type=float, default=30.0,
                   help="sun elevation in degrees")
    p.add_argument("--resolution", type=int, default=256,
                   help="rows; the lat-long map is 2x as wide")
    p.add_argument("--scale", type=float, default=1.0)

    args = ap.parse_args(argv)
    return {"info": cmd_info, "diff": cmd_diff, "convert": cmd_convert,
            "cat": cmd_cat, "assemble": cmd_assemble,
            "makesky": cmd_makesky}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
