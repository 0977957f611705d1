"""High-level renderers — API parity with the reference's torch_renderer.py.

The reference wraps pytorch3d renderers behind OpenCV-convention cameras
(DifferentiableRenderer / DepthRender / ColorRender, torch_renderer.py:39-159)
and its main optimization loop rasterizes the SAME mesh three times per step —
once each for depth, silhouette and color (camera_pose_optimizer.py:244-250).

Here each renderer rasterizes ONCE and derives every requested output from the
shared fragment buffers; `RenderOutputs` exposes depth/silhouette/rgb together
so analysis-by-synthesis steps pay for one rasterization per iteration.

All `render` methods take OpenCV (R, tvec) extrinsics directly — the native
convention — so the `_camera_pose_from_opencv_to_pytorch` flip the reference
applies on every call (torch_renderer.py:73-80) disappears.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .cameras.perspective import PerspectiveCamera
from .rasterize.fragments import Fragments
from .rasterize.raster import RasterizationSettings, rasterize_meshes
from .shading.blending import BlendParams, sigmoid_alpha
from .shading.lights import Materials, PointLights
from .shading.phong import hard_phong_shader, soft_phong_shader
from .structures.meshes import Meshes


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutputs:
    """Everything a pose/shape fitting step needs, from one rasterization."""

    depth: jax.Array                      # (B, H, W), background 0
    zbuf: jax.Array                       # (B, H, W), background -1
    silhouette: Optional[jax.Array]       # (B, H, W) soft coverage in [0, 1]
    rgb: Optional[jax.Array]              # (B, H, W, 3)
    fragments: Fragments


class DifferentiableRenderer:
    """Base: OpenCV pinhole K + image size (torch_renderer.py:39-71 parity).

    K: (3,3) or (B,3,3) array-like; image_size: (H, W) tuple.
    """

    def __init__(self, K, image_size: Tuple[int, int]):
        if not isinstance(image_size, tuple):
            raise ValueError(
                "image_size must be a tuple, e.g. (720, 1280)"
            )
        K_arr = jnp.asarray(K, jnp.float32)
        if K_arr.shape[-2:] != (3, 3) or K_arr.ndim not in (2, 3):
            # the reference validates its pinhole input the same way
            # (torch_renderer.py:44-58, ERROR on malformed K)
            raise ValueError(
                f"K must be (3, 3) or (B, 3, 3), got {K_arr.shape}"
            )
        self._image_size = (int(image_size[0]), int(image_size[1]))
        self._base_camera = PerspectiveCamera.from_K(K_arr, self._image_size)

    def camera_with_pose(self, R, tvec) -> PerspectiveCamera:
        return self._base_camera.replace_pose(R, tvec)

    @property
    def image_size(self):
        return self._image_size


class MeshRenderer(DifferentiableRenderer):
    """One-rasterization multi-output mesh renderer (the workhorse)."""

    def __init__(
        self,
        K,
        image_size: Tuple[int, int],
        blur_radius: float = 0.0,
        faces_per_pixel: int = 1,
        sigma: float = 1e-4,
        gamma: float = 1e-4,
        background_color=(0.0, 0.0, 0.0),
        lights: Optional[PointLights] = None,
        materials: Optional[Materials] = None,
        pixel_chunk: int = 8192,
        bin_size: Optional[int] = None,
        max_faces_per_bin: int = 128,
        impl: str = "auto",
        shade_k: Optional[int] = None,
        active_tiles: Optional[int] = None,
        layout: str = "tile",
        group_lanes: Optional[int] = None,
        occupancy_split: Optional[Tuple[int, int]] = None,
        select_impl: str = "auto",
        untile_impl: str = "xla",
        recon_points: bool = False,
        check_budgets: Optional[str] = None,
    ):
        """bin_size follows pytorch3d's contract (None = AUTO coarse-to-
        fine with budgets measured from the first concrete scene per
        shape, 0 = force dense, k > 0 = explicit — see
        RasterizationSettings / rasterize.autotune).

        shade_k: shade only the nearest shade_k fragment slots for RGB
        (silhouette/depth keep all K); at the default gamma=1e-4 the
        z-softmax blend weights beyond slot ~2 are negligible and shading
        cost scales with the slot count. layout/group_lanes: the K=1
        Pallas kernel layout (RasterizationSettings.layout)."""
        super().__init__(K, image_size)
        self.shade_k = shade_k
        # recon_points: Phong world positions from camera-ray reconstruction
        # (zbuf * pixel ray) instead of interpolating 9 world-corner
        # channels — drops ~25% of the bin-gather/interp channel work on
        # the binned path. Eps-level shading change in the blur band only.
        self.recon_points = recon_points
        self.settings = RasterizationSettings(
            image_size=self._image_size,
            blur_radius=blur_radius,
            faces_per_pixel=faces_per_pixel,
            pixel_chunk=pixel_chunk,
            bin_size=bin_size,
            max_faces_per_bin=max_faces_per_bin,
            impl=impl,
            active_tiles=active_tiles,
            layout=layout,
            group_lanes=group_lanes,
            occupancy_split=occupancy_split,
            select_impl=select_impl,
            untile_impl=untile_impl,
            check_budgets=check_budgets,
        )
        self.blend = BlendParams(sigma=sigma, gamma=gamma, background_color=background_color)
        self.lights = lights if lights is not None else PointLights.make()
        self.materials = materials if materials is not None else Materials.make()

    def resolved_settings(self, meshes: Meshes, R, tvec, grow=False,
                          margin=None) -> RasterizationSettings:
        """The concrete settings this scene will rasterize with: auto
        (bin_size=None) resolves via rasterize.autotune (cached per shape);
        explicit settings pass through."""
        if self.settings.bin_size is not None:
            return self.settings
        from .rasterize.autotune import resolve_mesh_settings

        return resolve_mesh_settings(
            self.settings, meshes, self.camera_with_pose(R, tvec),
            grow=grow, margin=margin,
        )

    def prepare(self, meshes: Meshes, R, tvec, grow=False,
                margin=None) -> RasterizationSettings:
        """Force auto-settings resolution from CONCRETE inputs (outside
        jit). Call once at fit/loop setup when every later render happens
        under jit — traced auto calls with no cached resolution fall back
        to the dense path. margin overrides the 1.5x AUTO_MARGIN (pose
        fits size moving footprints at 2x); grow=True max-merges into an
        existing cached resolution instead of being ignored by it."""
        return self.resolved_settings(meshes, R, tvec, grow=grow,
                                      margin=margin)

    def rasterize(
        self, meshes: Meshes, R, tvec, extra_face_attrs=None,
    ) -> Tuple[Fragments, PerspectiveCamera]:
        cam = self.camera_with_pose(R, tvec)
        return (
            rasterize_meshes(meshes, cam, self.settings, extra_face_attrs),
            cam,
        )

    def render(
        self,
        meshes: Meshes,
        R,
        tvec,
        *,
        with_silhouette: bool = True,
        with_rgb: bool = False,
        soft_rgb: bool = True,
    ) -> RenderOutputs:
        extra = None
        if with_rgb:
            from .rasterize.raster import uses_binned_pallas

            if uses_binned_pallas(self.resolved_settings(meshes, R, tvec)):
                # Pre-gather the shading attributes per tile (rides the
                # rasterizer's bin-gather einsum) so Phong interpolation
                # runs bin-locally over <=Fmax candidates.
                from .shading.phong import face_shading_attrs

                extra = face_shading_attrs(
                    meshes, with_points=not self.recon_points
                )
        frags, cam = self.rasterize(meshes, R, tvec, extra)
        sil = sigmoid_alpha(frags, self.blend.sigma) if with_silhouette else None
        rgb = None
        if with_rgb:
            if soft_rgb:
                rgba = soft_phong_shader(
                    meshes, frags, cam, self.lights, self.materials,
                    self.blend, shade_k=self.shade_k,
                )
            else:
                rgba = hard_phong_shader(
                    meshes, frags, cam, self.lights, self.materials, self.blend
                )
            rgb = rgba[..., :3]
        return RenderOutputs(
            depth=frags.depth(), zbuf=frags.zbuf[..., 0],
            silhouette=sil, rgb=rgb, fragments=frags,
        )


class DepthRender(MeshRenderer):
    """Depth (+ optional soft silhouette) — torch_renderer.py:83-121 parity.

    `render(meshes, R, tvec, return_silhouette)` returns relu'd nearest depth,
    and the sigmoid-coverage silhouette when requested — both from a single
    rasterization (the reference rasterizes twice here)."""

    def __init__(self, K, image_size, faces_per_pixel: int = 1, **kw):
        super().__init__(K, image_size, faces_per_pixel=faces_per_pixel, **kw)

    def render(self, meshes: Meshes, R, tvec, return_silhouette: bool = False):  # type: ignore[override]
        out = super().render(
            meshes, R, tvec, with_silhouette=return_silhouette, with_rgb=False
        )
        if not return_silhouette:
            return out.depth
        return out.depth, out.silhouette


class ColorRender(MeshRenderer):
    """Soft-Phong RGB renderer — torch_renderer.py:124-159 parity."""

    def __init__(self, K, image_size, blur_radius: float = 0.0,
                 faces_per_pixel: int = 1, **kw):
        super().__init__(
            K, image_size, blur_radius=blur_radius, faces_per_pixel=faces_per_pixel, **kw
        )

    def render(self, meshes: Meshes, R, tvec):  # type: ignore[override]
        out = super().render(
            meshes, R, tvec, with_silhouette=False, with_rgb=True, soft_rgb=True
        )
        return out.rgb


class SilhouetteRender(MeshRenderer):
    """Soft-silhouette-only renderer (SoftSilhouetteShader equivalent)."""

    def __init__(self, K, image_size, sigma: float = 1e-4,
                 faces_per_pixel: int = 8, blur_radius: Optional[float] = None, **kw):
        import math

        if blur_radius is None:
            blur_radius = math.log(1.0 / 1e-4 - 1.0) * sigma
        super().__init__(
            K, image_size, blur_radius=blur_radius,
            faces_per_pixel=faces_per_pixel, sigma=sigma, **kw
        )

    def render(self, meshes: Meshes, R, tvec):  # type: ignore[override]
        out = super().render(meshes, R, tvec, with_silhouette=True, with_rgb=False)
        return out.silhouette


# ---------------------------------------------------------------------------
# Point-cloud renderers (torch_renderer.py:163-230 parity)
# ---------------------------------------------------------------------------

class PointsRenderer(DifferentiableRenderer):
    """Base point renderer: splat rasterization + a compositor.

    The reference's point renderers (AlphaPointRender :163-184,
    NormPointRender :186-207, PulsarPointRender :209-230) were marked
    untested and carried a `T=Ts` NameError; these are working equivalents
    on the shared OpenCV-camera base."""

    def __init__(
        self, K, image_size: Tuple[int, int],
        radius: float = 0.01, points_per_pixel: int = 8,
        pixel_chunk: int = 8192,
        bin_size=None, max_points_per_bin: int = 128,
        active_tiles=None, impl: str = "auto", check_budgets=None,
    ):
        """bin_size follows pytorch3d's contract: None (default) = AUTO
        coarse-to-fine binning with budgets measured from the first
        concrete cloud per shape (rasterize.autotune; the dense selection
        it replaces is O(pixels x points) — measured 247 ms dense vs
        ~17 ms binned forward at 4x20k points, 256^2, K=8 on v5e);
        0 = force dense; k > 0 = explicit binned — size max_points_per_bin
        for the CONCRETE cloud with rasterize.points.suggest_points_per_bin
        (overflowing tiles silently drop points)."""
        from .rasterize.points import PointsRasterizationSettings

        super().__init__(K, image_size)
        self.settings = PointsRasterizationSettings(
            image_size=self._image_size, radius=radius,
            points_per_pixel=points_per_pixel, pixel_chunk=pixel_chunk,
            bin_size=bin_size, max_points_per_bin=max_points_per_bin,
            active_tiles=active_tiles, impl=impl,
            check_budgets=check_budgets,
        )

    def resolved_settings(self, pointclouds, R, tvec, radius=None,
                          grow=False):
        """Concrete settings for this cloud: auto (bin_size=None) resolves
        via rasterize.autotune (cached per shape); explicit pass through.
        radius: the per-point NDC selection radii the rasterization will
        actually use (PulsarRenderer passes its sphere extents).
        grow=True re-measures a cached resolution from these concrete
        inputs and max-merges the budgets (sharded paths size from every
        shard's slice this way)."""
        if self.settings.bin_size is not None:
            return self.settings
        from .rasterize.autotune import resolve_points_settings

        return resolve_points_settings(
            self.settings, pointclouds, self.camera_with_pose(R, tvec),
            radius, grow=grow,
        )

    def prepare(self, pointclouds, R, tvec, radius=None, grow=False):
        """Force auto-settings resolution from CONCRETE inputs (outside
        jit) — see MeshRenderer.prepare."""
        return self.resolved_settings(pointclouds, R, tvec, radius,
                                      grow=grow)

    def rasterize(self, pointclouds, R, tvec, radius=None, extra=None,
                  settings=None):
        from .rasterize.points import rasterize_points

        cam = self.camera_with_pose(R, tvec)
        return rasterize_points(
            pointclouds, cam,
            self.settings if settings is None else settings,
            radius, extra=extra,
        ), cam

    def _splats(self, pointclouds, R, tvec, radius=None):
        import jax
        import jax.numpy as jnp

        from .shading.compositing import gather_point_features, splat_weights

        # binned path: features (and any per-point radius override) ride
        # the candidate gather + winner einsum (PointFragments.features)
        # instead of the near-scalar per-pixel TPU gather whose backward
        # is a serializing scatter-add
        st = self.resolved_settings(pointclouds, R, tvec, radius)
        binned = bool(st.bin_size)
        r_arr = None
        if radius is not None:
            B, N = pointclouds.points.shape[:2]
            r_arr = jnp.broadcast_to(
                jnp.asarray(radius, jnp.float32), (B, N)
            )
        nf = 0
        extra = None
        if binned:
            cols = []
            if pointclouds.features is not None:
                cols.append(pointclouds.features)
                nf = pointclouds.features.shape[-1]
            if r_arr is not None:
                cols.append(r_arr[..., None])
            if cols:
                extra = jnp.concatenate(cols, axis=-1)
        frags, _ = self.rasterize(
            pointclouds, R, tvec, radius, extra=extra, settings=st
        )

        # splat weights follow the RASTERIZATION radius: with a per-point
        # override, w = 1 - d2/r_settings^2 would silently zero out (or
        # over-weight) splats selected at a different radius
        if r_arr is None:
            w = splat_weights(frags, self.settings.radius)
        else:
            if frags.features is not None:
                r_hit = frags.features[..., nf]
            else:
                safe = jnp.maximum(frags.idx, 0)
                B = r_arr.shape[0]
                r_hit = jax.vmap(lambda a, i: a[i])(
                    r_arr, safe.reshape(B, -1)
                ).reshape(frags.idx.shape)
            w = splat_weights(frags, r_hit)

        if frags.features is not None and nf:
            feats = frags.features[..., :nf]
        else:
            feats = gather_point_features(pointclouds, frags)
        return frags, w, feats


class AlphaPointRender(PointsRenderer):
    """Front-to-back alpha-composited point splats -> (B, H, W, C+1)."""

    def render(self, pointclouds, R, tvec):
        from .shading.compositing import alpha_composite

        _, w, feats = self._splats(pointclouds, R, tvec)
        return alpha_composite(w, feats)


class NormPointRender(PointsRenderer):
    """Normalized-weight composited point splats -> (B, H, W, C+1)."""

    def render(self, pointclouds, R, tvec):
        from .shading.compositing import norm_weighted_composite

        _, w, feats = self._splats(pointclouds, R, tvec)
        return norm_weighted_composite(w, feats)


class PulsarPointRender(PointsRenderer):
    """FAST APPROXIMATION of Pulsar: 2D splats blended by a softmax over
    center depth with temperature gamma. This is NOT the sphere-based model
    of Lassner & Zollhoefer — see PulsarRenderer for the true ray-sphere
    blend (intersection depths, world radii, per-sphere opacity, background
    epsilon weight). Kept for cheap depth-ordered splatting where sphere
    geometry doesn't matter (radius is in NDC units here)."""

    def __init__(self, K, image_size, gamma: float = 1e-3, **kw):
        super().__init__(K, image_size, **kw)
        self.gamma = gamma

    def render(self, pointclouds, R, tvec, radius=None):
        from .shading.compositing import pulsar_composite

        frags, w, feats = self._splats(pointclouds, R, tvec, radius)
        return pulsar_composite(frags, w, feats, gamma=self.gamma)


class PulsarRenderer(PointsRenderer):
    """True sphere-based Pulsar renderer (Lassner & Zollhoefer, CVPR 2021).

    Parity target: the reference's PulsarPointRender wrapping
    pytorch3d.renderer.points.pulsar (torch_renderer.py:209-230) — scene =
    spheres with WORLD-space radii and per-sphere opacity; per pixel the
    K nearest spheres are intersected analytically and blended by a softmax
    over normalized intersection depth with temperature gamma and an
    exp(eps/gamma) background weight (shading.compositing.
    pulsar_sphere_composite). Returns (B, H, W, C+1).

    radius: default world-space sphere radius (per-point override via
    render(..., radius=)); opacity defaults to 1.

    Binned selection (bin_size=): size max_points_per_bin against the
    NDC selection radii this renderer actually rasterizes with — the
    world radius r_w maps to r_ndc = r_w*fmax/(ndc_scale*(z - r_w)),
    which blows up for spheres near the camera and can dwarf a budget
    sized for a fixed NDC radius (suggest_points_per_bin accepts
    radius=r_ndc). Overflowing tiles silently drop spheres."""

    def __init__(
        self, K, image_size, gamma: float = 1e-2,
        radius: float = 0.05, znear: float = 0.1, zfar: float = 10.0,
        background: float = 0.0, eps: float = 1e-3, **kw,
    ):
        super().__init__(K, image_size, radius=radius, **kw)
        self.gamma = gamma
        self.znear = znear
        self.zfar = zfar
        self.background = background
        self.eps = eps

    def _selection_radii(self, pointclouds, cam, radius=None):
        """(pts_cam, r_w, r_ndc): world radii + the conservative NDC
        selection radii — the world sphere's screen extent at its NEAR
        surface, so the rasterizer's top-K candidate set contains every
        sphere the ray can intersect."""
        import jax.numpy as jnp

        pts_cam = cam.world_to_camera(pointclouds.points)   # (B, N, 3)
        B, N = pts_cam.shape[:2]
        r_w = jnp.broadcast_to(
            jnp.asarray(
                self.settings.radius if radius is None else radius,
                jnp.float32,
            ),
            (B, N),
        )
        fmax = jnp.maximum(cam.fx, cam.fy)[:, None]          # (B, 1)
        z = pts_cam[..., 2]
        r_ndc = r_w * fmax / (
            cam.ndc_scale * jnp.maximum(z - r_w, self.settings.znear)
        )
        return pts_cam, r_w, r_ndc

    def resolved_settings(self, pointclouds, R, tvec, radius=None,
                          grow=False):
        """Auto settings size against the NDC selection radii this renderer
        actually rasterizes with (near-camera spheres blow r_ndc up well
        past the world radius — see the sizing caveat above). `radius`
        here is the WORLD radius override, matching render()."""
        if self.settings.bin_size is not None:
            return self.settings
        cam = self.camera_with_pose(R, tvec)
        _, _, r_ndc = self._selection_radii(pointclouds, cam, radius)
        return self._resolve_with_radii(pointclouds, cam, r_ndc, grow=grow)

    def _resolve_with_radii(self, pointclouds, cam, r_ndc, grow=False):
        """Single auto-resolution code path for this renderer — render()
        reuses it with its already-computed cam/r_ndc so the radii
        semantics live in exactly one place."""
        from .rasterize.autotune import resolve_points_settings

        return resolve_points_settings(
            self.settings, pointclouds, cam, r_ndc, grow=grow
        )

    def render(self, pointclouds, R, tvec, radius=None, opacity=None):
        import jax.numpy as jnp

        from .rasterize.points import rasterize_points
        from .shading.compositing import pulsar_sphere_composite

        cam = self.camera_with_pose(R, tvec)
        pts_cam, r_w, r_ndc = self._selection_radii(pointclouds, cam, radius)
        B, N = pts_cam.shape[:2]
        o = jnp.broadcast_to(
            jnp.asarray(1.0 if opacity is None else opacity, jnp.float32),
            (B, N),
        )
        if pointclouds.features is None:
            feats = jnp.ones((B, N, 3), jnp.float32)
        else:
            feats = pointclouds.features
        # binned path: pack every per-sphere channel the compositor needs
        # (camera center xyz, world radius, opacity, features) into the
        # candidate gather so the composite skips its per-hit gathers.
        # Auto settings resolve against the NDC selection radii actually
        # rasterized with (see resolved_settings above).
        st = self.settings
        if st.bin_size is None:
            st = self._resolve_with_radii(pointclouds, cam, r_ndc)
        extra = None
        if st.bin_size:
            extra = jnp.concatenate(
                [pts_cam, r_w[..., None], o[..., None], feats], axis=-1
            )
        frags = rasterize_points(
            pointclouds, cam, st, r_ndc, extra=extra
        )
        packed = frags.features if extra is not None else None
        bcast = lambda a: jnp.broadcast_to(a, (B,))
        return pulsar_sphere_composite(
            frags, pts_cam, r_w, o, feats,
            bcast(cam.fx), bcast(cam.fy), bcast(cam.cx), bcast(cam.cy),
            self._image_size, gamma=self.gamma, znear=self.znear,
            zfar=self.zfar, background=self.background, eps=self.eps,
            packed_hit_channels=packed,
        )


class DepthPointRender(PointsRenderer):
    """Nearest-splat depth map (B, H, W), background 0."""

    def render(self, pointclouds, R, tvec):
        frags, _ = self.rasterize(pointclouds, R, tvec)
        return jax.nn.relu(frags.zbuf[..., 0])
