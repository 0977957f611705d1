"""Wavefront OBJ / MTL load & save (host side, numpy).

Replaces pytorch3d.io load_obj / load_objs_as_meshes / save_obj (reference
mesh_deformer.py:12, camera_pose_optimizer.py:87, deform_mesh_with_color.py:460)
including MTL + UV texture-map ingestion for meshes like data/cow_mesh/cow.obj.

A C-accelerated parser (csrc/objloader) is used when its shared library has
been built; this module is the always-available numpy fallback and the single
public API either way.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

from ..structures.meshes import Meshes
from ..structures.textures import TexturesUV, TexturesVertex

try:  # optional native fast path, see torch_renderer_tpu/csrc
    from . import native_obj as _native
except Exception:  # pragma: no cover - native lib not built
    _native = None


@dataclasses.dataclass
class ObjData:
    verts: np.ndarray                       # (V, 3) float32
    faces: np.ndarray                       # (F, 3) int32 vertex indices
    verts_uvs: Optional[np.ndarray] = None  # (VT, 2) float32
    faces_uvs: Optional[np.ndarray] = None  # (F, 3) int32 into verts_uvs
    normals: Optional[np.ndarray] = None    # (VN, 3)
    texture_image: Optional[np.ndarray] = None  # (Hm, Wm, 3) float32 in [0,1]
    mtl_path: Optional[str] = None


def _parse_mtl_texture(mtl_path: str) -> Optional[str]:
    """Return the map_Kd path from an MTL file, if any."""
    if not os.path.exists(mtl_path):
        return None
    with open(mtl_path, "r", errors="ignore") as f:
        for line in f:
            tok = line.strip().split()
            if len(tok) >= 2 and tok[0].lower() == "map_kd":
                return os.path.join(os.path.dirname(mtl_path), tok[-1])
    return None


def _load_image(path: str) -> Optional[np.ndarray]:
    try:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
        return img
    except Exception:
        return None


def _triangulate(idx: List[int]) -> List[Tuple[int, int, int]]:
    """Fan-triangulate a polygon's index list."""
    return [(idx[0], idx[i], idx[i + 1]) for i in range(1, len(idx) - 1)]


def load_obj(path: str, load_textures: bool = True) -> ObjData:
    """Parse an OBJ file (v / vt / vn / f with v, v/t, v/t/n, v//n forms)."""
    if _native is not None:
        parsed = _native.parse_obj(path)
        if parsed is not None:
            data = ObjData(**parsed)
            return _attach_texture(data, path, load_textures)

    verts, uvs, normals = [], [], []
    faces_v, faces_t = [], []
    mtl_file = None
    with open(path, "r", errors="ignore") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            tok = line.split()
            if not tok:
                continue
            key = tok[0]
            if key == "v":
                verts.append([float(x) for x in tok[1:4]])
            elif key == "vt":
                uvs.append([float(x) for x in tok[1:3]])
            elif key == "vn":
                normals.append([float(x) for x in tok[1:4]])
            elif key == "f":
                vi, ti = [], []
                for part in tok[1:]:
                    comp = part.split("/")
                    vi.append(int(comp[0]) - 1 if int(comp[0]) > 0 else len(verts) + int(comp[0]))
                    if len(comp) > 1 and comp[1]:
                        ti.append(int(comp[1]) - 1)
                for tri in _triangulate(vi):
                    faces_v.append(tri)
                if len(ti) == len(vi) and len(ti) >= 3:
                    for tri in _triangulate(ti):
                        faces_t.append(tri)
            elif key == "mtllib":
                mtl_file = os.path.join(os.path.dirname(path), tok[1])

    data = ObjData(
        verts=np.asarray(verts, np.float32),
        faces=np.asarray(faces_v, np.int32),
        verts_uvs=np.asarray(uvs, np.float32) if uvs else None,
        faces_uvs=np.asarray(faces_t, np.int32) if len(faces_t) == len(faces_v) and faces_t else None,
        normals=np.asarray(normals, np.float32) if normals else None,
        mtl_path=mtl_file,
    )
    return _attach_texture(data, path, load_textures)


def _attach_texture(data: ObjData, obj_path: str, load_textures: bool) -> ObjData:
    if not load_textures:
        return data
    mtl = data.mtl_path
    if mtl is None:
        guess = os.path.splitext(obj_path)[0] + ".mtl"
        mtl = guess if os.path.exists(guess) else None
    if mtl is not None:
        tex_path = _parse_mtl_texture(mtl)
        if tex_path is not None and os.path.exists(tex_path):
            data.texture_image = _load_image(tex_path)
            data.mtl_path = mtl
    return data


def load_objs_as_meshes(paths: List[str], load_textures: bool = True) -> Meshes:
    """pytorch3d load_objs_as_meshes parity: batch OBJs into one padded Meshes
    with UV textures when present (else white vertex colors)."""
    objs = [load_obj(p, load_textures) for p in paths]
    verts_list = [o.verts for o in objs]
    faces_list = [o.faces for o in objs]

    textures = None
    if load_textures and all(
        o.texture_image is not None and o.faces_uvs is not None for o in objs
    ):
        import jax.numpy as jnp

        Hm = max(o.texture_image.shape[0] for o in objs)
        Wm = max(o.texture_image.shape[1] for o in objs)
        VT = max(o.verts_uvs.shape[0] for o in objs)
        F = max(o.faces.shape[0] for o in objs)

        def pad2(a, n):
            out = np.zeros((n,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        maps = np.zeros((len(objs), Hm, Wm, 3), np.float32)
        for i, o in enumerate(objs):
            maps[i, : o.texture_image.shape[0], : o.texture_image.shape[1]] = o.texture_image
        textures = TexturesUV(
            maps=jnp.asarray(maps),
            faces_uvs=jnp.asarray(np.stack([pad2(o.faces_uvs, F) for o in objs])),
            verts_uvs=jnp.asarray(np.stack([pad2(o.verts_uvs, VT) for o in objs])),
        )
    else:
        import jax.numpy as jnp

        V = max(v.shape[0] for v in verts_list)
        feats = np.ones((len(objs), V, 3), np.float32)
        textures = TexturesVertex(verts_features=jnp.asarray(feats))

    return Meshes.from_lists(verts_list, faces_list, textures=textures)


def save_obj(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    verts_uvs: Optional[np.ndarray] = None,
    faces_uvs: Optional[np.ndarray] = None,
    texture_image: Optional[np.ndarray] = None,
    verts_rgb: Optional[np.ndarray] = None,
) -> None:
    """Save a mesh as OBJ (+MTL/PNG when a texture map is given; per-vertex
    colors are written as xyzrgb `v` lines, the common extension)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    mtl_name = None
    if texture_image is not None:
        base = os.path.splitext(path)[0]
        mtl_name = os.path.basename(base) + ".mtl"
        png_name = os.path.basename(base) + ".png"
        from PIL import Image

        Image.fromarray(
            (np.clip(texture_image, 0, 1) * 255).astype(np.uint8)
        ).save(base + ".png")
        with open(base + ".mtl", "w") as f:
            f.write("newmtl material_0\nmap_Kd {}\n".format(png_name))

    with open(path, "w") as f:
        if mtl_name:
            f.write(f"mtllib {mtl_name}\nusemtl material_0\n")
        for i, v in enumerate(verts):
            if verts_rgb is not None:
                c = verts_rgb[i]
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
            else:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if verts_uvs is not None:
            for uv in verts_uvs:
                f.write(f"vt {uv[0]:.6f} {uv[1]:.6f}\n")
        if faces_uvs is not None and verts_uvs is not None:
            for fv, ft in zip(faces, faces_uvs):
                f.write(
                    "f {}/{} {}/{} {}/{}\n".format(
                        fv[0] + 1, ft[0] + 1, fv[1] + 1, ft[1] + 1, fv[2] + 1, ft[2] + 1
                    )
                )
        else:
            for fv in faces:
                f.write(f"f {fv[0] + 1} {fv[1] + 1} {fv[2] + 1}\n")
