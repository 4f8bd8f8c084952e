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
