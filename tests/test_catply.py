"""--cat / --toply scene reformatting (main/pbrt.cpp:66-73 +
api.cpp:469-520 printing paths): the reformatted output must re-parse to
the same scene, and --toply must round-trip big meshes through PLY."""

import io
import os

import numpy as np


def test_cat_output_reparses_to_same_scene(tmp_path):
    from pbrt_tpu.frontend import load_pbrt
    from pbrt_tpu.frontend.catply import reformat
    from pbrt_tpu.frontend.parser import parse_pbrt_string

    src = "tests/oracle/whitted_oracle.pbrt"
    buf = io.StringIO()
    reformat(src, out=buf)
    text = buf.getvalue()
    assert "WorldBegin" in text and 'Shape "sphere"' in text

    s1, cam1, o1 = load_pbrt(src)
    s2, cam2, o2 = parse_pbrt_string(text, base_dir="tests/oracle")
    assert s1.n_tri == s2.n_tri
    assert s1.n_sph == s2.n_sph
    assert o1["integrator"] == o2["integrator"]
    np.testing.assert_allclose(np.asarray(cam1.resolution),
                               np.asarray(cam2.resolution))


def test_toply_extracts_large_mesh(tmp_path, monkeypatch):
    from pbrt_tpu.frontend.catply import reformat
    from pbrt_tpu.frontend.parser import parse_pbrt_string

    # 250 triangles = 750 indices >= the 500-entry threshold
    n = 250
    tris = []
    pts = []
    for i in range(n):
        x = float(i)
        pts += [(x, 0, 0), (x + 1, 0, 0), (x, 1, 0)]
        tris += [3 * i, 3 * i + 1, 3 * i + 2]
    scene = tmp_path / "big.pbrt"
    scene.write_text(
        'Camera "perspective"\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "WorldBegin\n"
        'Material "matte"\n'
        'Shape "trianglemesh" "integer indices" ['
        + " ".join(str(i) for i in tris) + '] "point P" ['
        + " ".join(f"{c}" for p in pts for c in p) + "]\n"
        'LightSource "point" "rgb I" [1 1 1]\n'
        "WorldEnd\n")
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    reformat(str(scene), to_ply=True, out=buf)
    text = buf.getvalue()
    assert '"plymesh"' in text and '"trianglemesh"' not in text
    assert os.path.exists(tmp_path / "mesh_00001.ply")
    # the emitted scene re-parses and the PLY loader recovers the mesh
    s2, _, _ = parse_pbrt_string(text, base_dir=str(tmp_path))
    assert s2.n_tri == n
