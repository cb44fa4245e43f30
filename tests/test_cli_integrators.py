"""CLI smoke test: every scene-file Integrator keyword renders an image.

The reference registers every integrator behind the scene keyword
(core/api.cpp:1789-1812) and main/pbrt.cpp runs whichever one the file
names — including the non-tile-based bdpt/mlt/sppm, whose Render()
overrides (bdpt.cpp:302, mlt.cpp:165, sppm.cpp:63) the driver must route
to explicitly. Round-4 verdict reproduced a `KeyError: 'mlt'` here; this
file is the regression gate: one tiny 16x16 end-to-end render per keyword
through `pbrt_tpu.utils.cli.main`.
"""

import numpy as np
import pytest

SCENE_TMPL = """
LookAt 0 1.2 -3.2  0 0.5 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
  "string filename" "out.pfm"
Sampler "halton" "integer pixelsamples" [2]
{integrator_line}
WorldBegin
AttributeBegin
Material "matte" "rgb Kd" [0.6 0.5 0.4]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3]
AttributeEnd
AttributeBegin
Material "mirror"
Translate -0.6 0.5 0.3
Shape "sphere" "float radius" [0.5]
AttributeEnd
AttributeBegin
AreaLightSource "diffuse" "rgb L" [8 8 8]
Translate 0 2.5 0
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-0.5 0 -0.5  0.5 0 -0.5  0.5 0 0.5  -0.5 0 0.5]
AttributeEnd
LightSource "point" "rgb I" [4 4 4] "point from" [1.5 2.5 -1.5]
WorldEnd
"""

# every Integrator keyword the reference's MakeIntegrator switch accepts
# (api.cpp:1789-1812), with small-enough params for a CPU smoke render
INTEGRATOR_LINES = {
    "whitted": 'Integrator "whitted" "integer maxdepth" 3',
    "directlighting": 'Integrator "directlighting"',
    "path": 'Integrator "path" "integer maxdepth" 3',
    "volpath": 'Integrator "volpath" "integer maxdepth" 3',
    "bdpt": 'Integrator "bdpt" "integer maxdepth" 3',
    "mlt": ('Integrator "mlt" "integer maxdepth" 3 '
            '"integer mutationsperpixel" 4 "integer chains" 64 '
            '"integer bootstrapsamples" 256'),
    "sppm": ('Integrator "sppm" "integer maxdepth" 3 '
             '"integer iterations" 2 "integer photonsperiteration" 256 '
             '"float radius" 0.5'),
    "ambientocclusion": 'Integrator "ambientocclusion"',
    "mypath": 'Integrator "mypath" "integer maxdepth" 3',
    "hero_path": 'Integrator "hero_path" "integer maxdepth" 3',
    "hero_path_mis": 'Integrator "hero_path_mis" "integer maxdepth" 3',
}


@pytest.mark.parametrize("keyword", sorted(INTEGRATOR_LINES))
def test_cli_renders_every_integrator_keyword(tmp_path, keyword):
    from pbrt_tpu.utils import cli
    from pbrt_tpu.utils import imageio

    scene = tmp_path / f"{keyword}.pbrt"
    scene.write_text(
        SCENE_TMPL.format(integrator_line=INTEGRATOR_LINES[keyword]))
    out = tmp_path / f"{keyword}.pfm"
    rc = cli.main([str(scene), "--cpu", "--quiet", "-o", str(out)])
    assert rc in (0, None)
    assert out.exists(), f"{keyword}: no image written"
    img = np.asarray(imageio.read_image(str(out)))
    assert img.shape[:2] == (16, 16)
    assert np.isfinite(img).all(), f"{keyword}: non-finite pixels"
    # ao measures occlusion of the sky, everything else sees the lights;
    # either way a correct render of this scene is not all-black
    assert img.max() > 0, f"{keyword}: all-black image"


def test_render_dispatch_params_reach_sppm(monkeypatch):
    """The scene file's Integrator ParamSet must parameterize the sppm
    driver (radius/iterations/photonsperiteration, sppm.cpp:509-514)."""
    import importlib
    # `pbrt_tpu.integrators` re-exports render() the function, which
    # shadows the submodule under plain `import ... as`
    render_mod = importlib.import_module("pbrt_tpu.integrators.render")

    seen = {}

    def fake_sppm(scene, cam, n_iterations, photons_per_iter,
                  initial_radius, max_depth, seed):
        seen.update(n_iterations=n_iterations,
                    photons_per_iter=photons_per_iter,
                    initial_radius=initial_radius)
        import jax.numpy as jnp
        return jnp.zeros((4, 4, 3))

    import pbrt_tpu.integrators.sppm as sppm_mod
    monkeypatch.setattr(sppm_mod, "render_sppm", fake_sppm)

    class Cam:
        resolution = np.asarray([4, 4])

    render_mod.render(None, Cam(), integrator="sppm",
                      integrator_params={"iterations": 3,
                                         "photonsperiteration": 128,
                                         "radius": 0.25})
    assert seen == dict(n_iterations=3, photons_per_iter=128,
                        initial_radius=0.25)


MEDIA_SCENE = """
LookAt 0 1.2 -3.2  0 0.5 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
  "string filename" "out.pfm"
Sampler "halton" "integer pixelsamples" [2]
Integrator "volpath" "integer maxdepth" 3
MakeNamedMedium "fog" "string type" "homogeneous"
  "rgb sigma_a" [0.1 0.1 0.1] "rgb sigma_s" [0.3 0.3 0.3] "float g" [0.1]
WorldBegin
AttributeBegin
Material "matte" "rgb Kd" [0.6 0.5 0.4]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3]
AttributeEnd
AttributeBegin
Material ""
MediumInterface "fog" ""
Translate 0 0.7 0
Shape "sphere" "float radius" [0.6]
AttributeEnd
AttributeBegin
AreaLightSource "diffuse" "rgb L" [8 8 8]
Translate 0 2.5 0
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-0.5 0 -0.5  0.5 0 -0.5  0.5 0 0.5  -0.5 0 0.5]
AttributeEnd
WorldEnd
"""


def test_cli_volpath_with_media_and_ld_sampler(tmp_path):
    """volpath's REAL loop (media present — the media-free scene above
    falls back to li_path) through the CLI with a low-discrepancy
    sampler. r5 regression gate: the NEE scatter-half seed was a traced
    jnp scalar, crashing every scene-file volpath render whose sampler
    needs a concrete seed (halton/sobol ConcretizationTypeError)."""
    from pbrt_tpu.utils import cli
    from pbrt_tpu.utils import imageio

    scene = tmp_path / "volpath_media.pbrt"
    scene.write_text(MEDIA_SCENE)
    out = tmp_path / "volpath_media.pfm"
    rc = cli.main([str(scene), "--cpu", "--quiet", "-o", str(out)])
    assert rc in (0, None)
    assert out.exists()
    img = np.asarray(imageio.read_image(str(out)))
    assert np.isfinite(img).all() and img.max() > 0
