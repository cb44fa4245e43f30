"""Frontend tests: tokenizer/params, s-expressions, PLY, and parsing the
reference repo's actual shipped scenes (parity check for parser coverage —
core/parser.cpp / core/api.cpp semantics)."""

import os

import numpy as np
import pytest

from pbrt_tpu.frontend.parser import parse_pbrt_string, load_pbrt
from pbrt_tpu.frontend.sexpr import parse_portal_data
from pbrt_tpu.scene import lights as lights_mod

REF = "/root/reference/scenes"


class TestSexpr:
    def test_lamp_portal_data(self):
        s = ("((AA -1.2877 -1.26043 6.11473 1.2877 1.26043 6.11473 2 -) "
             "(AA -0.793266 -0.776447 8.32176 0.776447 0.776447 8.32176 "
             "2 +))")
        portals = parse_portal_data(s)
        assert len(portals) == 2
        lo, hi, ax, fw = portals[0]
        np.testing.assert_allclose(lo, (-1.2877, -1.26043, 6.11473))
        assert ax == 2 and fw is False
        assert portals[1][3] is True


class TestParserBasics:
    def test_simple_scene(self):
        scene, cam, opts = parse_pbrt_string("""
            Film "image" "integer xresolution" [32] "integer yresolution" [24]
            Sampler "halton" "integer pixelsamples" [7]
            Integrator "directlighting"
            LookAt 0 0 -3  0 0 0  0 1 0
            Camera "perspective" "float fov" [45]
            WorldBegin
            AttributeBegin
              Material "matte" "color Kd" [0.6 0.5 0.4]
              Shape "trianglemesh" "integer indices" [0 1 2]
                "point P" [-1 0 0  1 0 0  0 1 0]
            AttributeEnd
            LightSource "point" "rgb I" [5 5 5] "point from" [0 3 0]
            WorldEnd
        """)
        assert scene.n_tri == 1
        assert opts["integrator"] == "direct"
        assert opts["spp"] == 7
        assert tuple(np.asarray(cam.resolution)) == (32, 24)
        assert int(scene.lights.ltype[0]) == lights_mod.POINT
        np.testing.assert_allclose(np.asarray(scene.lights.pos[0]),
                                   (0, 3, 0), atol=1e-5)

    def test_transform_stack(self):
        scene, _, _ = parse_pbrt_string("""
            WorldBegin
            AttributeBegin
              Translate 1 2 3
              AttributeBegin
                Scale 2 2 2
                Shape "sphere" "float radius" [1]
              AttributeEnd
              Shape "sphere" "float radius" [1]
            AttributeEnd
            Shape "sphere" "float radius" [1]
            WorldEnd
        """)
        c = np.asarray(scene.geom.sph_center)
        r = np.asarray(scene.geom.sph_radius)
        np.testing.assert_allclose(c[0], (1, 2, 3), atol=1e-5)
        np.testing.assert_allclose(r[0], 2.0, atol=1e-5)
        np.testing.assert_allclose(c[1], (1, 2, 3), atol=1e-5)
        np.testing.assert_allclose(r[1], 1.0, atol=1e-5)
        np.testing.assert_allclose(c[2], (0, 0, 0), atol=1e-5)

    def test_spd_spectrum_param(self):
        scene, _, _ = parse_pbrt_string("""
            WorldBegin
            AttributeBegin
              AreaLightSource "diffuse"
                "spectrum L" [400.0 0.0 500.0 8.0 600.0 15.6 700.0 18.4]
              Shape "trianglemesh" "integer indices" [0 1 2]
                "point P" [-1 0 0  1 0 0  0 1 0]
            AttributeEnd
            WorldEnd
        """)
        emit = np.asarray(scene.lights.emit[0])
        assert emit.shape == (3,)
        # reddish SPD (rising toward 700nm) → R > B
        assert emit[0] > emit[2]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
class TestReferenceScenes:
    def test_cornell_dielectric(self):
        scene, cam, opts = load_pbrt(
            os.path.join(REF, "cornell_dielectric.pbrt"))
        assert opts["integrator"] == "hero_path_mis"
        assert opts["spp"] == 256
        assert tuple(np.asarray(cam.resolution)) == (512, 512)
        # cornell box walls + light + 2 dispersive-glass blocks (meshes)
        assert scene.n_tri > 10
        from pbrt_tpu.scene import materials as mat_mod
        mtypes = np.asarray(scene.materials.mtype)
        assert (mtypes == mat_mod.DISPERSIVE_GLASS).sum() == 2
        # one infinite + per-triangle area lights
        lt = np.asarray(scene.lights.ltype)
        assert (lt == lights_mod.INFINITE).sum() == 1
        assert (lt == lights_mod.AREA).sum() >= 2

    def test_lamp_portal_scene(self):
        scene, cam, opts = load_pbrt(
            os.path.join(REF, "blender/lamp/out/lamp.pbrt"))
        assert opts["integrator"] == "direct"
        lt = scene.lights
        area_rows = np.asarray(lt.ltype) == lights_mod.AREA
        assert area_rows.sum() == 1
        i = int(np.argmax(area_rows))
        assert int(lt.n_portals[i]) == 2
        assert int(lt.strategy[i]) == lights_mod.STRAT_PROJECTION
        assert bool(lt.two_sided[i])
        # portal geometry from the s-expression
        np.testing.assert_allclose(np.asarray(lt.portal_lo[i, 0]),
                                   (-1.2877, -1.26043, 6.11473), atol=1e-4)
        # plymesh rooms loaded
        assert scene.n_tri > 100
        assert scene.n_pln == 1  # the aaplane light

    def test_killeroo_simple(self):
        scene, cam, opts = load_pbrt(
            os.path.join(REF, "killeroo-simple.pbrt"))
        assert opts["integrator"] == "mypath"
        assert opts["max_depth"] == 3
        # killeroo mesh has ~10k+ triangles via Include
        assert scene.n_tri > 5000
        assert scene.bvh is not None


class TestSpdFiles:
    def test_spectrum_from_float_file(self):
        """"spectrum Kd" "file.spd" resolves via the float-file reader
        (core/floatfile.cpp ReadFloatFile + paramset spectrum params)."""
        import os
        import tempfile

        from pbrt_tpu.frontend.parser import PbrtParser
        with tempfile.TemporaryDirectory() as td:
            with open(os.path.join(td, "white.spd"), "w") as f:
                f.write("# comment\n400 1.0\n550 1.0\n700 1.0\n")
            txt = ('WorldBegin\n'
                   'Material "matte" "spectrum Kd" "white.spd"\n'
                   'Shape "sphere" "float radius" [1]\nWorldEnd')
            ps = PbrtParser(base_dir=td).parse(txt)
            kd = np.asarray(ps.builder.materials[-1]["kd"])
            assert kd.shape == (3,)
            assert (kd > 0.5).all()          # flat SPD ≈ white


def test_cli_debug_nans_flag(tmp_path):
    """--debug-nans (numeric sanitizer, r4): enables jax_debug_nans for
    the render; a well-formed scene must still complete and write."""
    import jax

    from pbrt_tpu.utils import cli
    out = tmp_path / "dn.png"
    rc = cli.main(["scenes/cornell_portal.pbrt", "--cpu", "--debug-nans",
                   "--spp", "1", "--quiet", "-o", str(out)])
    assert rc in (0, None) and out.exists()
    # restore for the rest of the suite
    jax.config.update("jax_debug_nans", False)


def test_parser_nested_texture_operands(tmp_path):
    """Texture directives with TEXTURE-typed tex1/tex2/amount params
    (scale.cpp:44-48 GetSpectrumTexture) instantiate operand rows and
    evaluate through the nested DAG (r4)."""
    scene_file = tmp_path / "nested.pbrt"
    scene_file.write_text("""
LookAt 0 2 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path" "integer maxdepth" 2
WorldBegin
Texture "checks" "spectrum" "checkerboard"
  "rgb tex1" [1 1 1] "rgb tex2" [0 0 0] "float uscale" [4] "float vscale" [4]
Texture "dimmed" "spectrum" "scale"
  "texture tex1" "checks" "rgb tex2" [0.5 0.5 0.5]
Texture "mixed" "spectrum" "mix"
  "rgb tex1" [0.1 0.1 0.1] "rgb tex2" [0.9 0.9 0.9] "texture amount" "checks"
Material "matte" "texture Kd" "dimmed"
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-2 0 -2  2 0 -2  2 0 2  -2 0 2]
  "float uv" [0 0  1 0  1 1  0 1]
AttributeBegin
Material "matte" "texture Kd" "mixed"
Translate 0 0 3
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-2 0 0  2 0 0  2 4 0  -2 4 0]
  "float uv" [0 0  1 0  1 1  0 1]
AttributeEnd
AreaLightSource "area" "rgb L" [8 8 8]
Translate 0 4 -2
Shape "sphere" "float radius" [0.4]
WorldEnd
""")
    from pbrt_tpu.frontend import load_pbrt
    from pbrt_tpu.integrators.render import render
    scene, cam, opts = load_pbrt(str(scene_file))
    assert scene.textures is not None
    assert scene.textures.nest_depth >= 1
    img = np.asarray(render(scene, cam, spp=16, integrator="path",
                            max_depth=2, seed=1))
    assert np.isfinite(img).all() and img.mean() > 1e-4
