"""Camera pose optimization by analysis-by-synthesis — fully on-device.

The flagship workload: TPU-native rebuild of the reference's
camera_pose_optimizer.py (7-DoF translation+quaternion camera parameter,
rendered depth/silhouette/RGB matched to reference images with
L1 + Huber + MSE losses, Adam — reference :205-341) and pose_optimizer.py
(depth-only object-pose fit against recorded sensor data, :119-151).

Differences from the reference, by design:
  * ONE rasterization per step feeds every loss term (the reference
    rasterizes 3x per step, camera_pose_optimizer.py:244-250);
  * the whole optimization is a single `lax.scan` under jit — zero host
    round-trips per iteration (the reference logs to wandb/cv2 every step);
  * optimizer is optax.adam; metrics come back as stacked device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..renderer import MeshRenderer
from ..structures.meshes import Meshes
from ..transforms.so3 import (
    matrix_to_quaternion,
    quaternion_multiply,
    quaternion_normalize,
    quaternion_to_matrix,
)


def huber_loss(pred: jax.Array, target: jax.Array, delta: float = 1.0) -> jax.Array:
    """Elementwise Huber (SmoothL1 for delta=1), as the reference's
    torch.nn.functional.huber_loss (camera_pose_optimizer.py:265)."""
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad * quad + delta * (abs_err - quad)


def iou(pred_mask: jax.Array, gt_mask: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Soft IoU over trailing (H, W) dims — the reference's per-iter
    'confidence' metric (gradient.log)."""
    inter = jnp.sum(pred_mask * gt_mask, axis=(-2, -1))
    union = jnp.sum(pred_mask + gt_mask - pred_mask * gt_mask, axis=(-2, -1))
    return inter / (union + eps)


def patch_occlusion(
    key: jax.Array, image: jax.Array, patch_size: int = 50, n_patches: int = 1,
    fill: float = 0.0,
) -> jax.Array:
    """Zero out random square patches of a (B, H, W) image — the robustness
    perturbation of reference `patch_image` (camera_pose_optimizer.py:58-74)."""
    B, H, W = image.shape
    for i in range(n_patches):
        key, ky, kx = jax.random.split(key, 3)
        y0 = jax.random.randint(ky, (B,), 0, max(H - patch_size, 1))
        x0 = jax.random.randint(kx, (B,), 0, max(W - patch_size, 1))
        yy = jnp.arange(H)[None, :, None]
        xx = jnp.arange(W)[None, None, :]
        inside = (
            (yy >= y0[:, None, None]) & (yy < y0[:, None, None] + patch_size)
            & (xx >= x0[:, None, None]) & (xx < x0[:, None, None] + patch_size)
        )
        image = jnp.where(inside, fill, image)
    return image


@dataclasses.dataclass(frozen=True)
class PoseFitConfig:
    """Loss weights / optimizer settings (reference defaults:
    camera_pose_optimizer.py:257-276 loss mix, :283 Adam lr=1e-3)."""

    lr: float = 1e-3
    n_steps: int = 500
    w_sil: float = 1.0
    w_depth: float = 1.0
    w_rgb: float = 0.01
    w_quat_norm: float = 1.0   # keeps the quaternion near unit norm
    huber_delta: float = 1.0
    use_rgb: bool = True


def pose_params_from_Rt(R, t) -> Dict[str, jax.Array]:
    """Initial 7-DoF parameter pytree {t: (B,3), quat: (B,4)} from OpenCV
    (R, t) — the reference's cam_param packing (camera_pose_optimizer.py:214-227)."""
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    if R.ndim == 2:
        R = R[None]
    if t.ndim == 1:
        t = t[None]
    return {"t": t, "quat": matrix_to_quaternion(R)}


def pose_params_to_Rt(params: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    return quaternion_to_matrix(quaternion_normalize(params["quat"])), params["t"]


class CameraPoseFitter:
    """Analysis-by-synthesis camera pose fit (camera_pose_optimizer.py parity).

    One MeshRenderer rasterization per step produces depth + soft silhouette
    (+ soft-Phong RGB); the loss mixes silhouette L1, masked depth Huber and
    RGB MSE exactly as the reference does at camera_pose_optimizer.py:257-276.
    """

    def __init__(
        self,
        K,
        image_size: Tuple[int, int],
        config: PoseFitConfig = PoseFitConfig(),
        faces_per_pixel: int = 4,
        sigma: float = 1e-4,
        blur_radius: Optional[float] = None,
        silhouette_impl: str = "fragments",
        faces_per_tile: int = 128,
        sil_active_tiles: Optional[int] = None,
        sil_layout: str = "lane",
        sil_group_lanes: Optional[int] = None,
        sil_config=None,
        **renderer_kw,
    ):
        """silhouette_impl='pallas' renders the silhouette with the exact
        fused kernel over ALL faces (rasterize/pallas_soft) and drops the
        fragment count to K=1 hard hits for depth/RGB — faster and closer to
        the true SoftRas coverage than the K-fragment approximation.

        sil_active_tiles: optional active-tile compaction budget for the
        pallas silhouette (pallas_soft.suggest_active_tiles; size it from
        the GT pose with headroom — the footprint moves during the fit and
        tiles beyond the budget are dropped). renderer_kw accepts
        active_tiles= for the depth/RGB rasterization the same way.
        sil_layout='packed' runs the group-packed kernels (requires
        sil_active_tiles); size sil_group_lanes with
        pallas_soft.suggest_group_lanes from the GT pose with the same
        headroom caveat (group overflow drops candidates like bin
        overflow).

        sil_config: a pallas_soft.SoftKernelConfig bundle (from
        suggest_soft_config over the poses the fit will traverse, with
        margin); overrides faces_per_tile and every sil_* knob above in
        one argument."""
        import math

        self.silhouette_impl = silhouette_impl
        self.sigma = sigma
        self.sil_hi_tiles = None
        self.sil_lo_lanes = 32
        if sil_config is not None:
            faces_per_tile = sil_config.faces_per_tile
            sil_active_tiles = sil_config.active_tiles
            sil_layout = sil_config.layout
            sil_group_lanes = sil_config.group_lanes
            self.sil_hi_tiles = sil_config.hi_tiles
            self.sil_lo_lanes = sil_config.lo_lanes
        self.faces_per_tile = faces_per_tile
        self.sil_active_tiles = sil_active_tiles
        self.sil_layout = sil_layout
        self.sil_group_lanes = sil_group_lanes
        if silhouette_impl == "pallas":
            blur_radius = 0.0
            faces_per_pixel = min(faces_per_pixel, 1)
        elif blur_radius is None:
            blur_radius = math.log(1.0 / 1e-4 - 1.0) * sigma
        self.config = config
        self.renderer = MeshRenderer(
            K, image_size, blur_radius=blur_radius,
            faces_per_pixel=faces_per_pixel, sigma=sigma, **renderer_kw,
        )
        self._fit_cache: dict = {}

    # -- rendering ----------------------------------------------------------
    def render(self, meshes: Meshes, params: Dict[str, jax.Array]):
        R, t = pose_params_to_Rt(params)
        if self.silhouette_impl == "pallas":
            import dataclasses as _dc

            from ..rasterize.pallas_soft import soft_silhouette_pallas

            out = self.renderer.render(
                meshes, R, t, with_silhouette=False, with_rgb=self.config.use_rgb
            )
            cam = self.renderer.camera_with_pose(R, t)
            sil = soft_silhouette_pallas(
                meshes, cam, sigma=self.sigma,
                faces_per_tile=self.faces_per_tile,
                active_tiles=self.sil_active_tiles,
                layout=self.sil_layout,
                group_lanes=self.sil_group_lanes,
                hi_tiles=self.sil_hi_tiles,
                lo_lanes=self.sil_lo_lanes,
            )
            return _dc.replace(out, silhouette=sil)
        return self.renderer.render(
            meshes, R, t, with_silhouette=True, with_rgb=self.config.use_rgb
        )

    def make_references(
        self, meshes: Meshes, R_gt, t_gt,
        occlusion_key: Optional[jax.Array] = None, patch_size: int = 50,
    ) -> Dict[str, jax.Array]:
        """Render ground-truth reference images (+ optional patch occlusion of
        the depth, reference camera_pose_optimizer.py:187-188). Uses the SAME
        render path as the optimization (self.render) so the loss is exactly
        zero at the true pose whichever silhouette_impl is active."""
        out = self.render(
            jax.lax.stop_gradient(meshes), pose_params_from_Rt(R_gt, t_gt)
        )
        depth = out.depth
        if occlusion_key is not None:
            depth = patch_occlusion(occlusion_key, depth, patch_size)
        refs = {
            "depth": depth,
            "sil": out.silhouette,
            "mask": (depth > 0).astype(jnp.float32),
        }
        if self.config.use_rgb:
            refs["rgb"] = out.rgb
        return jax.tree_util.tree_map(jax.lax.stop_gradient, refs)

    # -- loss ---------------------------------------------------------------
    def loss(self, params, meshes: Meshes, refs) -> Tuple[jax.Array, Dict]:
        cfg = self.config
        out = self.render(meshes, params)

        sil_l1 = jnp.mean(jnp.abs(out.silhouette - refs["sil"]))
        m = refs["mask"]
        npix = jnp.clip(jnp.sum(m), 1.0, None)
        depth_h = jnp.sum(huber_loss(out.depth, refs["depth"], cfg.huber_delta) * m) / npix
        total = cfg.w_sil * sil_l1 + cfg.w_depth * depth_h

        metrics = {"loss_sil": sil_l1, "loss_depth": depth_h}
        if cfg.use_rgb and "rgb" in refs:
            rgb_mse = jnp.mean((out.rgb - refs["rgb"]) ** 2)
            total = total + cfg.w_rgb * rgb_mse
            metrics["loss_rgb"] = rgb_mse

        qn = jnp.linalg.norm(params["quat"], axis=-1)
        quat_reg = jnp.mean((qn - 1.0) ** 2)
        total = total + cfg.w_quat_norm * quat_reg

        metrics["loss"] = total
        metrics["quat_norm"] = jnp.mean(qn)
        metrics["iou"] = jnp.mean(
            iou((out.silhouette > 0.5).astype(jnp.float32), refs["mask"])
        )
        return total, metrics

    # -- optimization -------------------------------------------------------
    def step_fn(self, tx: optax.GradientTransformation):
        """One (params, opt_state) -> (params, opt_state, metrics) Adam step."""

        def step(params, opt_state, meshes, refs):
            (loss, metrics), grads = jax.value_and_grad(self.loss, has_aux=True)(
                params, meshes, refs
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return step

    def fit(
        self, meshes: Meshes, refs, params0: Dict[str, jax.Array],
        n_steps: Optional[int] = None,
    ):
        """Run the full Adam loop as one jitted lax.scan. Returns
        (final params, metrics history dict of (n_steps,) arrays)."""
        cfg = self.config
        n = int(n_steps if n_steps is not None else cfg.n_steps)
        tx = optax.adam(cfg.lr)
        step = self.step_fn(tx)

        # auto bin settings resolve from CONCRETE scenes only — size them
        # from the start pose before the jitted scan traces (traced auto
        # calls with no cached resolution fall back to the dense path)
        if self.renderer.settings.bin_size is None:
            from ..rasterize.autotune import is_concrete

            if is_concrete(meshes, params0):
                R0, t0 = pose_params_to_Rt(
                    jax.tree_util.tree_map(jnp.asarray, params0)
                )
                # the footprint MOVES as the pose converges: 2x margin
                # (the pose apps' documented both-poses protocol) instead
                # of the static 1.5x AUTO_MARGIN, and grow=True so an
                # earlier 1.5x resolution (e.g. from rendering the refs)
                # is expanded rather than silently reused
                self.renderer.prepare(meshes, R0, t0, grow=True, margin=2.0)

        if n not in self._fit_cache:

            @jax.jit
            def run(params, meshes, refs):
                opt_state = tx.init(params)

                def body(carry, _):
                    params, opt_state = carry
                    params, opt_state, metrics = step(params, opt_state, meshes, refs)
                    return (params, opt_state), metrics

                (params, _), history = jax.lax.scan(
                    body, (params, opt_state), None, length=n
                )
                return params, history

            self._fit_cache[n] = run
        return self._fit_cache[n](params0, meshes, refs)


class DepthPoseFitter(CameraPoseFitter):
    """Depth+silhouette-only variant — the pose_optimizer.py workload
    (recorded sensor depth, no RGB term; reference pose_optimizer.py:119-131).
    """

    def __init__(self, K, image_size, config: Optional[PoseFitConfig] = None, **kw):
        cfg = config or PoseFitConfig(use_rgb=False, w_rgb=0.0)
        if cfg.use_rgb:
            cfg = dataclasses.replace(cfg, use_rgb=False, w_rgb=0.0)
        super().__init__(K, image_size, cfg, **kw)

    @staticmethod
    def references_from_recorded(depth: jax.Array) -> Dict[str, jax.Array]:
        """Reference dict from a recorded depth image (B, H, W) — the
        filtered_datas.pkl pathway (pose_optimizer.py:41-61)."""
        depth = jnp.asarray(depth, jnp.float32)
        if depth.ndim == 2:
            depth = depth[None]
        mask = (depth > 0).astype(jnp.float32)
        return {"depth": depth, "sil": mask, "mask": mask}


class ObjectPoseFitter(DepthPoseFitter):
    """ONE trainable object pose observed through FIXED per-frame camera
    extrinsics — the reference's parameterization (pose_optimizer.py:88-91:
    the camera chain is `cam_ext @ object_mat` with only object_mat
    trainable), fit JOINTLY over all recorded frames at once (the reference
    runs a single frame; the chain is observable from every camera that saw
    the object, so all frames constrain the same 7 DoF).

    K: (F, 3, 3) per-frame intrinsics (or a shared (3, 3));
    extrinsics: (F, 4, 4) OpenCV world->camera transforms.
    Params: {"t": (1, 3), "quat": (1, 4)} — the object pose O
    (object->world); frame f renders at (R_f R_o, R_f t_o + t_f).
    Pass meshes.extend(F) (all frames render as one batch) and stack the
    recorded depths (F, H, W) into references_from_recorded.
    """

    def __init__(self, K, image_size, extrinsics, config=None, **kw):
        import numpy as _np

        super().__init__(K, image_size, config, **kw)
        ext = _np.asarray(extrinsics, _np.float32)
        if ext.ndim == 2:
            ext = ext[None]
        self.cam_R = jnp.asarray(ext[:, :3, :3])
        self.cam_t = jnp.asarray(ext[:, :3, 3])
        self.cam_quat = matrix_to_quaternion(self.cam_R)
        self.n_frames = int(ext.shape[0])

    def compose(self, params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Per-frame composed camera params from the object pose. The
        quaternion product with the unit cam_quat preserves |q_o|, so the
        quat-norm regularizer acts identically through the chain."""
        q_o = quaternion_normalize(params["quat"][0])
        t_o = params["t"][0]
        q = quaternion_multiply(self.cam_quat, q_o[None, :])
        t = jnp.einsum("fij,j->fi", self.cam_R, t_o) + self.cam_t
        return {"quat": q, "t": t}

    def render(self, meshes: Meshes, params: Dict[str, jax.Array]):
        return super().render(meshes, self.compose(params))

    def object_pose(self, params: Dict[str, jax.Array]) -> jax.Array:
        """(4, 4) fitted object pose matrix (object->world)."""
        R = quaternion_to_matrix(quaternion_normalize(params["quat"]))[0]
        M = jnp.eye(4, dtype=jnp.float32)
        M = M.at[:3, :3].set(R)
        return M.at[:3, 3].set(params["t"][0])

    @staticmethod
    def params_from_object_pose(object_mat) -> Dict[str, jax.Array]:
        """Initial params from a (4, 4) object pose matrix."""
        object_mat = jnp.asarray(object_mat, jnp.float32)
        return pose_params_from_Rt(object_mat[:3, :3], object_mat[:3, 3])
