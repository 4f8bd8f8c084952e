"""Camera extraction from .blend files (scene/blend.py).

The reference authors scenes in Blender with compound-eye markup as camera
custom properties ("compound-eye"/"compound-projection"/"compound-structure",
"panoramic") and exports to glTF, whose `extras` MulticamScene.cpp:241-319
consumes.  load_blend_scene reads the same markup straight from the .blend
(IDProperties on the Camera datablock), so the ground truth here is the
reference's own shipped exports: a .blend load must produce the same cameras
as its glTF export.
"""

import numpy as np
import pytest

from compound_ray_tpu.scene.blend import load_blend_cameras, load_blend_scene
from compound_ray_tpu.scene.flat import load_scene

BLEND_DIR = "/root/reference/data/blend-files"
STANDIN_BLEND = f"{BLEND_DIR}/standin-sky.blend"
STANDIN_GLTF = "/root/reference/data/natural-standin-sky.gltf"
TEST_BLEND = f"{BLEND_DIR}/test-scene.blend"
TEST_GLTF = "/root/reference/data/test-scene/test-scene.gltf"
OFSTAD_BLEND = f"{BLEND_DIR}/ofstad.blend"


def _by_name(cams):
    return {c.name: c for c in cams}


def test_idproperties_match_gltf_extras():
    """The raw custom-property dicts equal the glTF exporter's extras."""
    cams = _read = {c["name"]: c for c in load_blend_cameras(STANDIN_BLEND)}
    assert set(cams) == {
        "regular-panoramic", "insect-eye-fast-vector",
        "insect-eye-spherical-projector",
        "insect-eye-spherical-projector-ids",
    }
    assert cams["regular-panoramic"]["extras"] == {"panoramic": "true"}
    fv = cams["insect-eye-fast-vector"]["extras"]
    assert fv == {
        "compound-eye": "true",
        "compound-projection": "single_dimension_fast",
        "compound-structure": "1000-horizontallyAcute-variableDegree.eye",
    }


def test_standin_cameras_match_gltf_export():
    """Pose + type + eye data agree with the shipped glTF export for the
    cameras the glTF build resolves (two of its four eye paths lack the
    eyes/ prefix, so the glTF skips them — reference path semantics)."""
    b = _by_name(load_blend_scene(STANDIN_BLEND).cameras)
    g = load_scene(STANDIN_GLTF)
    assert len(b) == 4  # blend-side fallback resolves all four
    checked = 0
    for c in g.cameras:
        bb = b[c.name]
        assert type(bb).__name__ == type(c).__name__
        np.testing.assert_allclose(
            np.asarray(bb.position), np.asarray(c.position), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bb.local_space), np.asarray(c.local_space), atol=1e-6)
        if hasattr(c, "projection"):
            assert bb.projection == c.projection
            assert len(bb.ommatidia) == len(c.ommatidia)
            np.testing.assert_allclose(
                np.asarray(bb.ommatidia), np.asarray(c.ommatidia))
        checked += 1
    assert checked >= 2


def test_test_scene_cameras_match_gltf_export():
    """All four non-compound camera kinds: pose AND projection parameters
    (perspective scale bakes yfov; ortho scale is the 2.8-era exporter's
    verbatim ortho_scale)."""
    b = _by_name(load_blend_scene(TEST_BLEND).cameras)
    g = load_scene(TEST_GLTF)
    kinds = set()
    for c in g.cameras:
        if c.name not in b:  # compound cams: markup absent in this .blend
            assert hasattr(c, "projection")
            continue
        bb = b[c.name]
        assert type(bb).__name__ == type(c).__name__
        np.testing.assert_allclose(
            np.asarray(bb.position), np.asarray(c.position), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bb.local_space), np.asarray(c.local_space), atol=1e-6)
        if getattr(c, "scale", None) is not None:
            np.testing.assert_allclose(
                np.asarray(bb.scale, np.float64),
                np.asarray(c.scale, np.float64), rtol=1e-5)
        kinds.add(type(c).__name__)
    assert kinds == {
        "PerspectiveCamera", "OrthographicCamera", "PanoramicCamera"}


def test_ofstad_compound_camera_resolves_relative_eye():
    """ofstad.blend's compound camera references ../eyes/test1000-avgRadius-
    0.1.eye relative to blend-files/ — the loader resolves and reads it."""
    scene = load_blend_scene(OFSTAD_BLEND)
    comp = [c for c in scene.cameras if hasattr(c, "projection")]
    assert len(comp) == 1
    assert comp[0].projection == "spherical_orientationwise"
    assert len(comp[0].ommatidia) == 1000
    assert scene.eye_data_path.endswith("test1000-avgRadius-0.1.eye")


def test_unresolvable_eye_path_skips_camera_not_scene():
    """ofstad-acceptance-angle.blend's compound cameras carry authoring-
    machine absolute eye paths that don't exist here: the cameras are
    skipped (MulticamScene.cpp:310-319 semantics) but geometry + the other
    cameras still load."""
    scene = load_blend_scene(f"{BLEND_DIR}/ofstad-acceptance-angle.blend")
    assert scene.num_triangles > 0
    names = [c.name for c in scene.cameras]
    assert "panoramic" in names
    assert not any(hasattr(c, "projection") for c in scene.cameras)


def test_renderer_loads_blend_with_cameras():
    """End-to-end through the public API: loading a .blend immediately
    yields a usable compound camera (no manual camera injection)."""
    from compound_ray_tpu.api.renderer import EyeRenderer

    r = EyeRenderer()
    r.load_gltf_scene(OFSTAD_BLEND)
    assert len(r.scene.cameras) >= 1
    found = False
    for _ in range(len(r.scene.cameras)):
        if r.is_compound_eye_active():
            found = True
            break
        r.next_camera()
    assert found
    assert r.get_current_eye_ommatidial_count() == 1000


@pytest.mark.parametrize("blend,expected_compound", [
    ("ofstad-variable-acceptance-angles.blend", 4),
    ("ofstad-speed-test.blend", 1),
])
def test_multi_camera_blends(blend, expected_compound):
    scene = load_blend_scene(f"{BLEND_DIR}/{blend}")
    comp = [c for c in scene.cameras if hasattr(c, "projection")]
    assert len(comp) == expected_compound


def test_garbage_file_raises_cleanly(tmp_path):
    p = tmp_path / "junk.blend"
    p.write_bytes(b"definitely not a blender file" * 10)
    with pytest.raises(ValueError, match="not a .blend"):
        load_blend_scene(str(p))


def test_truncated_blend_raises_cleanly(tmp_path):
    whole = open(STANDIN_BLEND, "rb").read()
    p = tmp_path / "trunc.blend"
    p.write_bytes(whole[: 16 * 1024])  # header + some blocks, no DNA1
    with pytest.raises(ValueError, match="DNA1|no mesh"):
        load_blend_scene(str(p))


def test_gzipped_blend_loads(tmp_path):
    """Blender 'compress' saves gzip the whole file; the loader inflates."""
    import gzip

    p = tmp_path / "gz.blend"
    p.write_bytes(gzip.compress(open(STANDIN_BLEND, "rb").read()))
    scene = load_blend_scene(str(p))
    assert scene.num_triangles > 0
    # compound cameras skip (the .eye paths don't resolve from tmp_path —
    # reference skip semantics); the panoramic one needs no external file
    assert [type(c).__name__ for c in scene.cameras] == ["PanoramicCamera"]


def _fake_cd(**over):
    cd = {
        "name": "p", "obmat": np.eye(4), "extras": {}, "aspect": 16 / 9,
        "lens": 50.0, "sensor_x": 36.0, "sensor_y": 24.0,
        "ortho_scale": 6.0, "type": 0, "sensor_fit": 0,
    }
    cd.update(over)
    return cd


class _CamScene:
    def __init__(self):
        self.cameras = []


@pytest.mark.parametrize("fit,aspect,sensor,div_aspect", [
    (2, 16 / 9, 24.0, False),   # VERTICAL: sensor_y vertical, any aspect
    (2, 9 / 16, 24.0, False),
    (0, 9 / 16, 36.0, False),   # AUTO portrait: sensor_x IS the vertical
    (0, 16 / 9, 36.0, True),    # AUTO landscape: sensor_x horizontal
    (1, 16 / 9, 36.0, True),    # HORIZONTAL: always horizontal
    (1, 9 / 16, 36.0, True),
])
def test_perspective_yfov_sensor_fit(fit, aspect, sensor, div_aspect):
    """yfov per Blender's BKE_camera_sensor_size: the sensor dimension the
    fit mode puts on the vertical axis (AUTO fits sensor_x to the LARGER
    render dimension) — the value the 2.8-era glTF exporter bakes."""
    from compound_ray_tpu.scene.blend import _append_blend_camera

    scene = _CamScene()
    _append_blend_camera(
        scene, _fake_cd(sensor_fit=fit, aspect=aspect), "/tmp", True)
    (cam,) = scene.cameras
    denom = 2.0 * 50.0 * (aspect if div_aspect else 1.0)
    # set_y_fov bakes tan(yfov/2)*scale_z into scale[1] (types.py:116)
    expect = (sensor / denom) * cam.scale[2]
    np.testing.assert_allclose(cam.scale[1], expect, rtol=1e-6)


def test_bad_camera_markup_skips_only_that_camera(tmp_path, monkeypatch, capsys):
    """One camera whose .eye file is corrupt must not sink the extraction
    of the remaining cameras (MulticamScene.cpp:310-319 skip semantics)."""
    import compound_ray_tpu.scene.blend as B

    bad_eye = tmp_path / "bad.eye"
    bad_eye.write_text("not an eye file at all\n")
    cds = [
        _fake_cd(name="broken", extras={
            "compound-eye": "true",
            "compound-projection": "spherical_orientationwise",
            "compound-structure": str(bad_eye)}),
        _fake_cd(name="survivor"),
    ]
    monkeypatch.setattr(B, "load_blend_cameras", lambda path: cds)
    scene = _CamScene()
    B._build_blend_cameras(scene, str(tmp_path / "x.blend"), True)
    assert [c.name for c in scene.cameras] == ["survivor"]
    assert "skipping .blend camera 'broken'" in capsys.readouterr().out


def test_untextured_blend_routes_colors_through_materials():
    """Double-gamma regression: an untextured .blend load must carry its
    material colours RAW in mat_base_color (like a glTF baseColorFactor),
    never as vertex colours — trace/shade.py pow-2.2s vertex colours, so
    the old vertex-colour fallback double-darkened every untextured load
    (0.8 gray rendered as 0.8^2.2 = 0.61)."""
    import numpy as np

    scene = load_blend_scene(OFSTAD_BLEND, cameras=False)  # no textures
    assert not scene.has_color.any()
    assert scene.mat_base_color.shape[1] == 4
    # the arena walls carry a non-default material colour, raw
    assert scene.mat_base_color[:, :3].max() <= 1.0
    assert scene.mat_id.shape[0] == scene.num_triangles
    assert np.all(scene.mat_tex == -1)
