"""Extract the Hošek–Wilkie spectral sky-model dataset into hosek_data.npz.

The coefficients are the published supplementary dataset of Hošek &
Wilkie, "An Analytic Model for Full Spectral Sky-Dome Radiance"
(SIGGRAPH 2012) — constant data (category-b unavoidable similarity),
read from the reference checkout's ext/ArHosekSkyModelData_Spectral.h.

Layout (11 wavelength bands, 320..720 nm step 40):
- datasets:       (11, 1080)  9 coeffs × 6 elevation-Bézier ctrl pts ×
                              10 turbidities × 2 albedos
- datasets_rad:   (11, 120)   1 radiance × 6 × 10 × 2
- solar_datasets: (11, 1800)  order(4) × pieces(45) × 10 turbidities
- limb_darkening: (11, 6)     5th-order polynomial in the disc cosine

Usage: python -m pbrt_tpu.tools.gen_hosek_data [header_path [out_npz]]
"""

import re
import sys

import numpy as np

DEFAULT_HDR = "/root/reference/src/ext/ArHosekSkyModelData_Spectral.h"


def extract(header_path: str):
    src = open(header_path).read()
    arrays = {}
    for m in re.finditer(
            r"double\s+(\w+)\[\]\s*=\s*\{(.*?)\};", src, re.S):
        name, body = m.group(1), m.group(2)
        body = re.sub(r"//[^\n]*", "", body)   # strip comment lines
        vals = [float(x) for x in re.findall(
            r"[-+]?[\d.]+(?:[eE][-+]?\d+)?", body)]
        arrays[name] = np.asarray(vals, np.float64)
    out = {}
    for list_name, key in (("datasets", "datasets"),
                           ("datasetsRad", "datasets_rad"),
                           ("solarDatasets", "solar_datasets"),
                           ("limbDarkeningDatasets", "limb_darkening")):
        m = re.search(r"double\s*\*\s*" + list_name
                      + r"\[\]\s*=\s*\{(.*?)\};", src, re.S)
        names = re.findall(r"\w+", m.group(1))
        out[key] = np.stack([arrays[n] for n in names])
    assert out["datasets"].shape == (11, 1080), out["datasets"].shape
    assert out["datasets_rad"].shape == (11, 120)
    assert out["solar_datasets"].shape == (11, 1800)
    assert out["limb_darkening"].shape == (11, 6)
    return out


if __name__ == "__main__":
    hdr = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_HDR
    import os
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "hosek_data.npz")
    np.savez_compressed(out_path, **extract(hdr))
    print("wrote", out_path)
