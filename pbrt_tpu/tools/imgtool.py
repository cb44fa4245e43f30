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
    """Analytic clear-sky environment map — the Hošek–Wilkie spectral
    model (tools/hosek.py), matching the reference's `imgtool makesky`
    (tools/imgtool.cpp:87-186 + ext/ArHosekSkyModel.c) to float
    precision: lat-long dome, 9 wavelengths averaged 3-per-RGB-channel,
    solar disc with limb darkening, below-horizon rows black."""
    from pbrt_tpu.tools.hosek import makesky_image
    rgb = makesky_image(np.radians(args.elevation), args.turbidity,
                        args.albedo, args.resolution)
    imageio.write_image(args.outfile, rgb * args.scale)
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
    p.add_argument("--albedo", type=float, default=0.5)
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
