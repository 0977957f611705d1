"""torch_renderer_tpu — a TPU-native differentiable rendering and
analysis-by-synthesis framework (JAX / XLA / Pallas).

Built from scratch with the capabilities of the reference repo
YufengJin/torch_renderer (a PyTorch3D-based research toolkit): differentiable
mesh rasterization with hard and SoftRas-style soft shading, OpenCV-convention
perspective cameras, mesh/point-cloud structures and IO, chamfer/ICP/geometry
ops, and fully on-device optimization loops — sharded over TPU meshes.
"""

from .cameras.look_at import (
    camera_position_from_spherical_angles,
    look_at_opencv,
    look_at_rotation_opencv,
    look_at_view_transform,
)
from .cameras.perspective import (
    PerspectiveCamera,
    pose_opencv_to_pytorch3d,
    pose_pytorch3d_to_opencv,
)
from .rasterize.fragments import Fragments, interpolate_face_attributes
from .rasterize.raster import RasterizationSettings, rasterize_meshes
from .rasterize.points import (
    PointFragments,
    PointsRasterizationSettings,
    rasterize_points,
)
from .renderer import (
    AlphaPointRender,
    ColorRender,
    DepthPointRender,
    DepthRender,
    MeshRenderer,
    NormPointRender,
    PointsRenderer,
    PulsarPointRender,
    PulsarRenderer,
    RenderOutputs,
    SilhouetteRender,
)
from .shading.blending import BlendParams, sigmoid_alpha, softmax_rgb_blend
from .shading.lights import DirectionalLights, Materials, PointLights
from .structures.meshes import Meshes
from .structures.pointclouds import Pointclouds
from .structures.textures import TexturesUV, TexturesVertex

from . import io, models, ops, opt, parallel, utils  # noqa: E402,F401 namespaces

__version__ = "0.1.0"
