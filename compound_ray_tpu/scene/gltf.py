"""Minimal glTF 2.0 reader (pure Python + numpy).

Replaces the reference's vendored tinygltf (support/tinygltf/tiny_gltf.h) with
an in-repo parser producing numpy arrays directly — no intermediate C++ data
model.  Supports the subset CompoundRay scenes use (see reference
libEyeRenderer3/MulticamScene.cpp:665-904): JSON .gltf and binary .glb,
embedded base64 buffers, external .bin files, byte-strided buffer views,
normalized integer accessors, embedded PNG/JPEG images, cameras with extras.
"""

from __future__ import annotations

import base64
import io
import json
import os
import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

# glTF componentType -> (numpy dtype, size in bytes)
_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}

_TYPE_COUNTS = {
    "SCALAR": 1,
    "VEC2": 2,
    "VEC3": 3,
    "VEC4": 4,
    "MAT2": 4,
    "MAT3": 9,
    "MAT4": 16,
}

# Normalization divisors for `normalized: true` accessors (glTF 2.0 spec 3.6.2.2)
_NORMALIZE_DIVISORS = {
    np.dtype(np.int8): 127.0,
    np.dtype(np.uint8): 255.0,
    np.dtype(np.int16): 32767.0,
    np.dtype(np.uint16): 65535.0,
}


@dataclass
class GLTFImage:
    """Decoded image: (H, W, 4) uint8 RGBA."""

    data: np.ndarray
    name: str = ""


@dataclass
class GLTFDocument:
    """Parsed glTF with decoded buffers; accessor access via :meth:`accessor`."""

    json: Dict[str, Any]
    buffers: List[bytes]
    base_dir: str
    _images: Dict[int, GLTFImage] = field(default_factory=dict)

    # ---- raw JSON conveniences -------------------------------------------------
    @property
    def nodes(self) -> List[dict]:
        return self.json.get("nodes", [])

    @property
    def meshes(self) -> List[dict]:
        return self.json.get("meshes", [])

    @property
    def cameras(self) -> List[dict]:
        return self.json.get("cameras", [])

    @property
    def materials(self) -> List[dict]:
        return self.json.get("materials", [])

    @property
    def scenes(self) -> List[dict]:
        return self.json.get("scenes", [])

    @property
    def default_scene(self) -> dict:
        scenes = self.scenes
        if not scenes:
            return {"nodes": list(range(len(self.nodes)))}
        return scenes[self.json.get("scene", 0)]

    # ---- binary decode ---------------------------------------------------------
    def buffer_view_bytes(self, view_idx: int) -> bytes:
        view = self.json["bufferViews"][view_idx]
        buf = self.buffers[view.get("buffer", 0)]
        off = view.get("byteOffset", 0)
        length = view["byteLength"]
        return buf[off : off + length]

    def accessor(self, accessor_idx: int) -> np.ndarray:
        """Decode accessor -> (count, ncomp) float-preserving numpy array.

        Integer `normalized` accessors are scaled to [0, 1] float32 exactly as
        the device decode in the reference does for vertex colours
        (cuda/LocalGeometry.h:106-171: /255, /65535).
        """
        acc = self.json["accessors"][accessor_idx]
        dtype = np.dtype(_COMPONENT_DTYPES[acc["componentType"]])
        ncomp = _TYPE_COUNTS[acc["type"]]
        count = acc["count"]
        if "bufferView" not in acc:
            arr = np.zeros((count, ncomp), dtype=dtype)
        else:
            view = self.json["bufferViews"][acc["bufferView"]]
            raw = self.buffers[view.get("buffer", 0)]
            base = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = view.get("byteStride") or dtype.itemsize * ncomp
            if stride == dtype.itemsize * ncomp:
                arr = np.frombuffer(raw, dtype=dtype, count=count * ncomp,
                                    offset=base)
                arr = arr.reshape(count, ncomp)
            else:
                # strided: gather row by row via as_strided on a copy-safe view
                arr = np.lib.stride_tricks.as_strided(
                    np.frombuffer(raw, dtype=np.uint8, offset=base,
                                  count=stride * (count - 1) + dtype.itemsize * ncomp),
                    shape=(count, dtype.itemsize * ncomp),
                    strides=(stride, 1),
                )
                arr = arr.copy().view(dtype).reshape(count, ncomp)
        if "sparse" in acc:
            # sparse overlay (glTF 2.0 §3.6.2.4): substitute `count` rows of
            # tightly-packed `values` at `indices` into the dense base
            # (zeros when the accessor has no bufferView) BEFORE any
            # normalization.  The reference's vendored tinygltf decodes
            # these the same way (base-then-patch).
            sp = acc["sparse"]
            scount = sp["count"]
            ids = self._packed_rows(
                sp["indices"],
                np.dtype(_COMPONENT_DTYPES[sp["indices"]["componentType"]]),
                scount, 1).ravel().astype(np.int64)
            vals = self._packed_rows(sp["values"], dtype, scount, ncomp)
            arr = arr.copy()
            arr[ids] = vals
        if acc.get("normalized") and arr.dtype in _NORMALIZE_DIVISORS:
            div = _NORMALIZE_DIVISORS[arr.dtype]
            arr = np.maximum(arr.astype(np.float32) / div, -1.0)
        return arr

    def _packed_rows(self, ref: dict, dtype: np.dtype, count: int,
                     ncomp: int) -> np.ndarray:
        """Tightly-packed (count, ncomp) rows from a {bufferView,
        byteOffset?} reference (sparse indices/values blocks have no
        byteStride by spec)."""
        view = self.json["bufferViews"][ref["bufferView"]]
        raw = self.buffers[view.get("buffer", 0)]
        base = view.get("byteOffset", 0) + ref.get("byteOffset", 0)
        arr = np.frombuffer(raw, dtype=dtype, count=count * ncomp,
                            offset=base)
        return arr.reshape(count, ncomp)

    def image(self, image_idx: int) -> GLTFImage:
        """Decode image `image_idx` to RGBA uint8 (cached)."""
        if image_idx in self._images:
            return self._images[image_idx]
        from PIL import Image as PILImage

        img_json = self.json["images"][image_idx]
        if "bufferView" in img_json:
            blob = self.buffer_view_bytes(img_json["bufferView"])
        else:
            uri = img_json["uri"]
            if uri.startswith("data:"):
                blob = base64.b64decode(uri.split(",", 1)[1])
            else:
                with open(os.path.join(self.base_dir, uri), "rb") as f:
                    blob = f.read()
        pil = PILImage.open(io.BytesIO(blob)).convert("RGBA")
        img = GLTFImage(data=np.asarray(pil, dtype=np.uint8), name=img_json.get("name", ""))
        self._images[image_idx] = img
        return img


def _decode_buffer(buffer_json: dict, base_dir: str, glb_bin: Optional[bytes]) -> bytes:
    uri = buffer_json.get("uri")
    if uri is None:
        if glb_bin is None:
            raise ValueError("buffer without uri outside of GLB container")
        return glb_bin
    if uri.startswith("data:"):
        return base64.b64decode(uri.split(",", 1)[1])
    with open(os.path.join(base_dir, uri), "rb") as f:
        return f.read()


def load_gltf(path: str) -> GLTFDocument:
    """Load a .gltf (JSON) or .glb (binary) file."""
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "rb") as f:
        head = f.read(4)
        f.seek(0)
        if head == b"glTF":
            # the b"glTF" sniff above IS the magic check (0x46546C67 LE)
            _magic, version, _length = struct.unpack("<III", f.read(12))
            doc_json = None
            glb_bin = None
            data = f.read()
            off = 0
            while off + 8 <= len(data):
                chunk_len, chunk_type = struct.unpack_from("<II", data, off)
                chunk = data[off + 8 : off + 8 + chunk_len]
                if chunk_type == 0x4E4F534A:  # JSON
                    doc_json = json.loads(chunk.decode("utf-8"))
                elif chunk_type == 0x004E4942:  # BIN
                    glb_bin = bytes(chunk)
                off += 8 + chunk_len + (-chunk_len) % 4
            if doc_json is None:
                raise ValueError(f"no JSON chunk in glb: {path}")
        else:
            doc_json = json.load(io.TextIOWrapper(f, encoding="utf-8"))
            glb_bin = None
    buffers = [_decode_buffer(b, base_dir, glb_bin) for b in doc_json.get("buffers", [])]
    return GLTFDocument(json=doc_json, buffers=buffers, base_dir=base_dir)


def node_local_matrix(node: dict) -> np.ndarray:
    """Local transform: matrix or T*R*S composition (MulticamScene.cpp:207-239)."""
    if "matrix" in node and node["matrix"]:
        return np.array(node["matrix"], dtype=np.float64).reshape(4, 4, order="F")
    m = np.eye(4, dtype=np.float64)
    if node.get("scale"):
        m = _scale_matrix(node["scale"]) @ m
    if node.get("rotation"):
        m = _quat_matrix(node["rotation"]) @ m
    if node.get("translation"):
        m = _translate_matrix(node["translation"]) @ m
    return m


def _translate_matrix(t) -> np.ndarray:
    m = np.eye(4)
    m[:3, 3] = t
    return m


def _scale_matrix(s) -> np.ndarray:
    m = np.eye(4)
    m[0, 0], m[1, 1], m[2, 2] = s
    return m


def _quat_matrix(q) -> np.ndarray:
    """glTF quaternion [x, y, z, w] -> 4x4 rotation matrix."""
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    if n > 0:
        x, y, z, w = x / n, y / n, z / n, w / n
    m = np.eye(4)
    m[:3, :3] = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    return m


def extra_is_true(extras: Optional[dict], key: str) -> bool:
    """Mirror of isObjectsExtraValueTrue: accepts bool true, "true", or nonzero."""
    if not extras or key not in extras:
        return False
    v = extras[key]
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        return v.strip().lower() == "true"
    if isinstance(v, (int, float)):
        return v != 0
    return False
