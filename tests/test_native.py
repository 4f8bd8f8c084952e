"""Native C++ runtime vs Python fallbacks (native/compoundray_native.cpp)."""

import numpy as np
import pytest

from compound_ray_tpu import native_ext
from compound_ray_tpu.testing import box_mesh, make_big_scene

needs_native = pytest.mark.skipif(
    native_ext.get_lib() is None, reason="native library unavailable"
)


@needs_native
def test_parse_eye_file(tmp_path):
    p = tmp_path / "t.eye"
    p.write_text("1 2 3 0 0 1 0.5 0.1\n-1 0 0 0 1 0 0.2 0.0\n")
    arr = native_ext.parse_eye_file(str(p))
    assert arr.shape == (2, 8)
    np.testing.assert_allclose(arr[0], [1, 2, 3, 0, 0, 1, 0.5, 0.1])
    np.testing.assert_allclose(arr[1], [-1, 0, 0, 0, 1, 0, 0.2, 0.0])


def _legacy_eye_cases(tmp_path):
    """Fixture files for the legacy 7-field format and garbage handling."""
    legacy = tmp_path / "legacy.eye"
    # the reference's own eyeGenerator still writes 7-field rows
    # (eyeGenerator/main.cpp:78, data/eyes/old-eye-specification/)
    legacy.write_text(
        "0.1 0.2 0.3 0 0 1 0.045378561\n"
        "\n"
        "-0.1 0 0 0 1 0 0.045378561\n"
    )
    garbage = tmp_path / "garbage.eye"
    garbage.write_text("0.1 0.2 0.3 0 0 1 0.5 0.0\nnot an eye row\n")
    empty = tmp_path / "empty.eye"
    empty.write_text("\n\n")
    return str(legacy), str(garbage), str(empty)


def test_legacy_eye_python_fallback(tmp_path, monkeypatch):
    import compound_ray_tpu.scene.eye_io as eye_io

    legacy, garbage, empty = _legacy_eye_cases(tmp_path)
    # force the pure-Python path
    monkeypatch.setattr(
        "compound_ray_tpu.native_ext.parse_eye_file", lambda p: None
    )
    omms = eye_io.read_eye_file(legacy)
    assert len(omms) == 2
    assert omms[0].acceptance_angle == pytest.approx(0.045378561)
    assert omms[0].focal_point_offset == 0.0
    with pytest.raises(ValueError, match="line 2"):
        eye_io.read_eye_file(garbage)
    with pytest.raises(ValueError, match="no ommatidia"):
        eye_io.read_eye_file(empty)


@needs_native
def test_legacy_eye_native_matches_python(tmp_path):
    from compound_ray_tpu.scene.eye_io import ommatidia_to_array, read_eye_file

    legacy, garbage, empty = _legacy_eye_cases(tmp_path)
    arr = native_ext.parse_eye_file(legacy)
    assert arr.shape == (2, 8)
    np.testing.assert_allclose(
        arr[0], [0.1, 0.2, 0.3, 0, 0, 1, 0.045378561, 0.0], atol=1e-7
    )
    # read_eye_file (native-first) agrees with the pure-Python rows
    np.testing.assert_allclose(
        ommatidia_to_array(read_eye_file(legacy)), arr, atol=1e-7
    )
    with pytest.raises(ValueError, match="line 2"):
        native_ext.parse_eye_file(garbage)
    with pytest.raises(ValueError, match="no ommatidia"):
        native_ext.parse_eye_file(empty)


@needs_native
def test_reference_legacy_eye_files():
    import os

    path = "/root/reference/data/eyes/old-eye-specification/test100-avgRadius-0.1.eye"
    if not os.path.isfile(path):
        pytest.skip("reference legacy eye data not available")
    from compound_ray_tpu.scene.eye_io import read_eye_file

    omms = read_eye_file(path)
    assert len(omms) == 100
    assert all(o.focal_point_offset == 0.0 for o in omms)


@needs_native
def test_parse_eye_matches_python(tmp_path):
    from compound_ray_tpu.scene.eye_io import (
        ommatidia_to_array,
        read_eye_file,
        write_eye_file,
    )
    from compound_ray_tpu.testing import make_sphere_eye

    omms = make_sphere_eye(50)
    p = str(tmp_path / "x.eye")
    write_eye_file(p, omms)
    got = ommatidia_to_array(read_eye_file(p))  # native path
    expect = ommatidia_to_array(omms)
    np.testing.assert_allclose(got, expect, atol=1e-6)


@needs_native
def test_build_clusters_native():
    scene = make_big_scene(n_boxes=40)
    tris9 = np.concatenate([scene.v0, scene.e1, scene.e2], axis=1)
    order, sizes = native_ext.build_cluster_order(tris9, 16)
    assert sorted(order.tolist()) == list(range(scene.num_triangles))
    assert sum(sizes) == scene.num_triangles
    assert max(sizes) <= 16


@needs_native
def test_point_in_mesh_native_matches_python():
    verts, faces = box_mesh((0.0, 0.0, 0.0), (2.0, 2.0, 2.0))
    tris = verts[faces]  # (12,3,3)
    # NOTE: points exactly on a quad's triangulation diagonal double-count in
    # the parity test (both triangles claim the shared edge) — a quirk the
    # reference's algorithm shares — so use generic positions here.
    for pt, expect in [
        ((0.3, 0.15, -0.42), True),
        ((0.9, -0.7, 0.23), True),
        ((1.1, 0.05, 0.1), False),
        ((-3.0, 0.2, 0.1), False),
        ((0.1, 0.2, 1.5), False),
    ]:
        got = native_ext.point_in_mesh(
            tris, np.asarray(pt, np.float32), float(verts[:, 0].min())
        )
        assert got == expect, pt


@needs_native
def test_write_ppm(tmp_path):
    frame = np.zeros((2, 3, 4), np.uint8)
    frame[0, 0] = [255, 0, 0, 255]  # bottom-left red
    p = str(tmp_path / "o.ppm")
    assert native_ext.write_ppm(p, frame)
    blob = (tmp_path / "o.ppm").read_bytes()
    assert blob.startswith(b"P6\n3 2\n255\n")
    body = blob.split(b"255\n", 1)[1]
    # bottom row written last: red pixel at start of the second (last) row
    assert body[9:12] == b"\xff\x00\x00"


def test_hitbox_contains_consistency():
    # HitboxMesh.contains must agree whether or not the native path is used
    from compound_ray_tpu.scene.flat import HitboxMesh

    verts, faces = box_mesh((1.0, 2.0, 3.0), (2.0, 2.0, 2.0))
    hb = HitboxMesh(
        name="b",
        transform=np.eye(4),
        triangles=verts[faces],
        object_aabb_min=verts.min(axis=0),
        object_aabb_max=verts.max(axis=0),
    )
    assert hb.contains((1.2, 2.1, 3.3))
    assert not hb.contains((4.0, 2.2, 3.1))
    # with a transform: world point maps into object space
    hb2 = HitboxMesh(
        name="b2",
        transform=np.diag([2.0, 1.0, 1.0, 1.0]),
        triangles=verts[faces],
        object_aabb_min=verts.min(axis=0),
        object_aabb_max=verts.max(axis=0),
    )
    assert hb2.contains((2.3, 2.1, 3.2))  # obj (1.15, 2.1, 3.2): inside
    assert not hb2.contains((6.5, 2.1, 3.2))  # obj (3.25, ...): outside


def test_eye_parser_native_and_fallback_agree_on_strtof_rows(tmp_path):
    """The pure-Python fallback promises 'identical behaviour' to the
    native strtof parser — including numeric-PREFIX tokens ('0.5x' parses
    as 0.5 and ends the row; '8.0mm' as focal 8.0)."""
    import numpy as np
    import pytest

    from compound_ray_tpu.scene import eye_io

    p = tmp_path / "tricky.eye"
    p.write_text(
        "1 2 3 4 5 6 0.5x\n"          # prefix on the acceptance field
        "1 2 3 4 5 6 0.7 8.0mm\n"     # prefix on the focal field
        "1 2 3 4 5 6 0.7 0.1 junk\n"  # trailing junk after valid fields
    )
    try:
        from compound_ray_tpu import native_ext
        native = native_ext.parse_eye_file(str(p))
    except Exception:
        native = None
    # force the fallback by parsing with the native module masked
    import unittest.mock as mock

    with mock.patch.dict("sys.modules",
                         {"compound_ray_tpu.native_ext": None}):
        fb = eye_io.read_eye_file(str(p))
    assert len(fb) == 3
    assert fb[0].acceptance_angle == pytest.approx(0.5)
    assert fb[0].focal_point_offset == 0.0
    assert fb[1].focal_point_offset == pytest.approx(8.0)
    assert fb[2].focal_point_offset == pytest.approx(0.1)
    if native is not None:
        got = np.asarray(
            eye_io.ommatidia_to_array(eye_io.array_to_ommatidia(native)))
        want = np.asarray(eye_io.ommatidia_to_array(fb))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_shim_set_ommatidia_numpy_honors_count():
    import ctypes

    import numpy as np

    from compound_ray_tpu.api import shim
    from compound_ray_tpu.api.renderer import EyeRenderer
    from compound_ray_tpu.cameras.types import CompoundEyeCamera
    from compound_ray_tpu.testing import make_box_scene, make_sphere_eye

    r = EyeRenderer(verbose=False)
    lib = shim.EyeRendererShim(r)
    r.scene = make_box_scene()
    cam = CompoundEyeCamera("eye", "single_dimension_fast",
                            make_sphere_eye(8))
    r.scene.cameras.append(cam)
    buf = np.zeros((16, 8), np.float32)  # oversized reuse buffer
    buf[:5, 3] = 1.0  # live rows have a valid direction
    buf[:5, 6] = 0.1
    lib.setOmmatidia(buf, ctypes.c_size_t(5))
    assert r.current_camera().ommatidia.shape[0] == 5
