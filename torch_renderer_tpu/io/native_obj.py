"""Adapter between io/obj.py's native hook and the C++ parser (io/native.py).

load_obj() calls parse_obj(path) and expects ObjData-shaped kwargs (or None
to fall back to the pure-Python parser).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

from .native import parse_obj_bytes

_MTLLIB_RE = re.compile(rb"^[ \t]*mtllib[ \t]+(\S+)", re.MULTILINE)


def parse_obj(path: str) -> Optional[Dict]:
    with open(path, "rb") as f:
        data = f.read()
    parsed = parse_obj_bytes(data)
    if parsed is None:
        return None

    m = _MTLLIB_RE.search(data)
    mtl_path = (
        os.path.join(os.path.dirname(path), m.group(1).decode(errors="ignore"))
        if m else None
    )
    uvs = parsed["uvs"]
    faces_uv = parsed["faces_uv"]
    has_uv = uvs.shape[0] > 0 and (faces_uv >= 0).all() and faces_uv.shape[0] > 0
    normals = parsed["normals"]
    return {
        "verts": parsed["verts"],
        "faces": np.ascontiguousarray(parsed["faces"]),
        "verts_uvs": uvs if has_uv else None,
        "faces_uvs": np.ascontiguousarray(faces_uv) if has_uv else None,
        "normals": normals if normals.shape[0] > 0 else None,
        "mtl_path": mtl_path,
    }
