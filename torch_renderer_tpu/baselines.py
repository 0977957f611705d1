"""Optional external-oracle renderers (pyrender / open3d), import-gated.

The reference keeps pyrender and Open3D as validation baselines
(visualizer.py VisPyrender :8-63 / VisOpen3D :66-103; ICP CPU path at
pytorch3d_icp_registeration.py:191-238). They are comparison oracles, not
capabilities to port (SURVEY.md §2c) — this module exposes the same
`quick_depth_render` / `registration_icp` surfaces when those libraries are
installed, and raises a clear error when they are not (neither ships in this
image; our own numpy oracles in tests/ and opt/registration.icp_cpu_reference
fill the fidelity-gating role).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def pyrender_available() -> bool:
    try:
        import pyrender  # noqa: F401

        return True
    except Exception:
        return False


def open3d_available() -> bool:
    try:
        import open3d  # noqa: F401

        return True
    except Exception:
        return False


class VisPyrender:
    """Offscreen pyrender depth oracle (reference visualizer.py:8-63).

    quick_depth_render(verts, faces, K, extrinsic) -> (H, W) depth. The
    OpenCV->OpenGL pose flip (negate rows 1-2 of the camera pose, reference
    :38-42) happens here so callers speak OpenCV like the rest of the
    framework.
    """

    def __init__(self, image_size: Tuple[int, int]):
        if not pyrender_available():
            raise ImportError(
                "pyrender is not installed; use the framework's own streaming "
                "rasterizer oracle (rasterize.soft.soft_silhouette_streaming / "
                "tests' numpy references) for fidelity gating instead"
            )
        import pyrender

        self._pyrender = pyrender
        H, W = image_size
        self.renderer = pyrender.OffscreenRenderer(W, H)
        self.scene = pyrender.Scene()

    def quick_depth_render(self, verts, faces, K, extrinsic) -> np.ndarray:
        pyrender = self._pyrender
        import trimesh

        self.scene.clear()
        mesh = pyrender.Mesh.from_trimesh(
            trimesh.Trimesh(np.asarray(verts), np.asarray(faces)), smooth=False
        )
        self.scene.add(mesh)
        K = np.asarray(K)
        cam = pyrender.IntrinsicsCamera(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        pose = np.linalg.inv(np.asarray(extrinsic))
        flip = np.diag([1.0, -1.0, -1.0, 1.0])  # OpenCV -> OpenGL camera
        self.scene.add(cam, pose=pose @ flip)
        return self.renderer.render(
            self.scene, flags=pyrender.RenderFlags.DEPTH_ONLY
        )


def open3d_registration_icp(
    source: np.ndarray, target: np.ndarray,
    max_correspondence_distance: float = 0.5,
    init: Optional[np.ndarray] = None,
    max_iterations: int = 100,
):
    """Open3D point-to-point ICP oracle (reference :221-223). Returns
    (R (3,3), t (3,), rmse)."""
    if not open3d_available():
        raise ImportError(
            "open3d is not installed; use opt.registration.icp_cpu_reference "
            "(numpy) as the CPU oracle instead"
        )
    import open3d as o3d

    src = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(np.asarray(source, np.float64)))
    tgt = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(np.asarray(target, np.float64)))
    result = o3d.pipelines.registration.registration_icp(
        src, tgt, max_correspondence_distance,
        np.eye(4) if init is None else np.asarray(init, np.float64),
        o3d.pipelines.registration.TransformationEstimationPointToPoint(),
        o3d.pipelines.registration.ICPConvergenceCriteria(max_iteration=max_iterations),
    )
    T = np.asarray(result.transformation)
    return T[:3, :3], T[:3, 3], float(result.inlier_rmse)
