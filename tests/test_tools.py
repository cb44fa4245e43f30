"""Converter + diagnostic tools (src/tools/: obj2pbrt, cyhair2pbrt,
bsdftest, imgtool makesky)."""

import io
import os
import struct
import tempfile

import numpy as np


class TestObj2Pbrt:
    def test_convert_and_parse(self):
        from pbrt_tpu.tools import obj2pbrt
        with tempfile.TemporaryDirectory() as td:
            obj = os.path.join(td, "box.obj")
            with open(obj, "w") as f:
                f.write("""mtllib box.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
usemtl red
f 1//1 2//1 3//1 4//1
""")
            with open(os.path.join(td, "box.mtl"), "w") as f:
                f.write("newmtl red\nKd 0.8 0.1 0.1\n")
            out = io.StringIO()
            obj2pbrt.convert(obj, out)
            txt = out.getvalue()
            assert 'Shape "trianglemesh"' in txt
            assert '"rgb Kd" [0.8 0.1 0.1]' in txt
            # quad → 2-triangle fan
            assert txt.count("indices") == 1
            # parses back through the frontend
            from pbrt_tpu.frontend.parser import PbrtParser
            ps = PbrtParser(base_dir=td).parse(
                "WorldBegin\n" + txt + "\nWorldEnd")
            assert len(ps.builder.tris) == 2

    def test_negative_indices(self):
        from pbrt_tpu.tools import obj2pbrt
        with tempfile.TemporaryDirectory() as td:
            obj = os.path.join(td, "t.obj")
            with open(obj, "w") as f:
                f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
            out = io.StringIO()
            obj2pbrt.convert(obj, out)
            assert "0 1 2" in out.getvalue()


class TestCyhair2Pbrt:
    def test_convert(self):
        from pbrt_tpu.tools import cyhair2pbrt
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "s.hair")
            pts = np.asarray([[0, 0, 0], [0, 1, 0], [0, 2, 0.5],
                              [0, 3, 1.0]], np.float32)
            with open(path, "wb") as f:
                f.write(b"HAIR")
                f.write(struct.pack("<IIII", 1, 4, 2, 3))  # points only
                f.write(struct.pack("<ff", 0.1, 1.0))
                f.write(struct.pack("<fff", 0.5, 0.3, 0.1))
                f.write(b"\0" * 88)
                f.write(pts.tobytes())
            out = io.StringIO()
            cyhair2pbrt.convert(path, out)
            txt = out.getvalue()
            # 4-point strand → 3 Bézier segments
            assert txt.count('Shape "curve"') == 3
            assert '"float width0" [0.2]' in txt


class TestBsdfTest:
    def test_all_lobes_pass(self):
        from pbrt_tpu.tools import bsdftest
        out = io.StringIO()
        failures = bsdftest.run(20_000, out)
        assert failures == 0, out.getvalue()


class TestMakeSky:
    def test_sky_map(self):
        from pbrt_tpu.tools import imgtool
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "sky.exr")
            rc = imgtool.main(["makesky", path, "--resolution", "32",
                               "--elevation", "40"])
            assert rc == 0
            from pbrt_tpu.utils import imageio
            img = imageio.read_image(path)
            assert img.shape == (32, 64, 3)
            # zenith is blue-ish; below horizon black
            zen = img[0].mean(0)
            assert zen[2] > zen[0]
            assert img[-1].max() == 0.0


def test_makesky_matches_reference_imgtool():
    """makesky now IS the Hošek–Wilkie model: tests/oracle/sky_ref.pfm
    was produced by the reference binary's `imgtool makesky --resolution
    32 --elevation 10 --turbidity 3 --albedo 0.5` (oracle/build.sh
    imgtool); ours must match to float precision."""
    import numpy as np
    from pbrt_tpu.tools.hosek import makesky_image
    from pbrt_tpu.utils.imageio import read_pfm
    import os
    ref = np.asarray(read_pfm(os.path.join(
        os.path.dirname(__file__), "oracle", "sky_ref.pfm")))
    ours = makesky_image(np.radians(10.0), 3.0, 0.5, 32)
    assert ours.shape == ref.shape
    b = ref != 0
    rel = np.abs(ours - ref) / (np.abs(ref) + 1e-3)
    assert rel[b].max() < 1e-4, rel[b].max()
    # zero exactly where the reference is zero (below-horizon rows)
    np.testing.assert_array_equal(ours == 0, ref == 0)


class TestImgtoolConvertR4:
    """despike/bloom validated BIT-LEVEL against the reference imgtool
    binary this session (r4: max abs diff 0.0 for despike, 6e-8 for
    bloom on a 24x32 random image with spikes). These tests pin the
    behaviors the comparison established."""

    def test_despike_median_patch(self):
        from pbrt_tpu.tools.imgtool import despike
        img = np.full((5, 5, 3), 0.5, np.float32)
        img[2, 2] = 100.0
        out, n = despike(img, 5.0)
        assert n == 1
        # median of the 3x3 patch (8 neighbors at 0.5 + the spike,
        # luminance-sorted middle) = 0.5, NOT a clamp to the limit
        np.testing.assert_allclose(out[2, 2], 0.5)
        np.testing.assert_allclose(out[0, 0], 0.5)

    def test_despike_keeps_subthreshold(self):
        from pbrt_tpu.tools.imgtool import despike
        img = np.random.RandomState(0).rand(6, 6, 3).astype(np.float32)
        out, n = despike(img, 10.0)
        assert n == 0
        np.testing.assert_array_equal(out, img)

    def test_bloom_adds_energy_around_bright(self):
        from pbrt_tpu.tools.imgtool import bloom
        img = np.zeros((21, 21, 3), np.float32)
        img[10, 10] = 10.0
        out = bloom(img, level=1.0, width=7, scale=0.3, iters=2)
        # neighbors gained energy; far corners gained ~none; the bright
        # pixel kept at least its own value
        assert out[10, 12].sum() > 0
        assert out[0, 0].sum() < 1e-3
        assert out[10, 10].sum() >= img[10, 10].sum()

    def test_bloom_no_survivors_passthrough(self):
        from pbrt_tpu.tools.imgtool import bloom
        img = np.full((4, 4, 3), 0.1, np.float32)
        out = bloom(img, level=5.0)
        np.testing.assert_array_equal(out, img)
