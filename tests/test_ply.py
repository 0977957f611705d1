"""PLY IO round-trip tests."""

import numpy as np
import pytest

from torch_renderer_tpu.io.ply import load_ply, save_ply
from torch_renderer_tpu.ops.icosphere import icosphere


@pytest.mark.parametrize("binary", [True, False])
def test_mesh_roundtrip(tmp_path, binary):
    verts, faces = icosphere(1)
    colors = np.clip(0.5 + 0.5 * verts, 0, 1).astype(np.float32)
    path = str(tmp_path / f"mesh_{binary}.ply")
    save_ply(path, verts, faces=faces, colors=colors, binary=binary)
    out = load_ply(path)
    np.testing.assert_allclose(out["verts"], verts, atol=1e-5)
    np.testing.assert_array_equal(out["faces"], faces)
    np.testing.assert_allclose(out["colors"], colors, atol=1.0 / 255)


@pytest.mark.parametrize("binary", [True, False])
def test_pointcloud_roundtrip(tmp_path, binary):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    path = str(tmp_path / f"pcd_{binary}.ply")
    save_ply(path, pts, normals=normals, binary=binary)
    out = load_ply(path)
    np.testing.assert_allclose(out["verts"], pts, atol=1e-5)
    np.testing.assert_allclose(out["normals"], normals, atol=1e-5)
    assert out["faces"] is None


def test_quad_faces_triangulated(tmp_path):
    path = str(tmp_path / "quad.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n"
        )
    out = load_ply(path)
    assert out["faces"].shape == (2, 3)  # fan triangulation
