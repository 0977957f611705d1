"""Joint shape + UV-texture optimization from multi-view renders.

TPU rebuild of the reference's deform_mesh_with_color.py (component 7,
SURVEY.md §2a): generate an N-view RGB/silhouette/depth dataset from a target
mesh (reference :114-209), then jointly optimize per-vertex offsets AND a full
TexturesUV texture map (reference :263-271) with two Adam optimizers and
step-decay schedules (reference :289-306), using silhouette + RGB MSE over a
few random views per iteration (reference :372-396), mesh shape priors
(reference :248-256) and a texture clamp regularizer (reference :422-423).

TPU-shaped differences: the dataset is ONE batched render; the whole
optimization is a jitted lax.scan whose per-step random view subset is a
device-side gather (the reference re-renders 2 views per step on the host
loop); the two optimizers are one optax.multi_transform over the param pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..cameras.look_at import look_at_view_transform
from ..ops.mesh_losses import (
    build_topology,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
)
from ..renderer import MeshRenderer
from ..structures.meshes import Meshes
from ..structures.textures import TexturesUV


@dataclasses.dataclass(frozen=True)
class JointFitConfig:
    """Reference settings: 15 views, 2 random views/iter, sigma=1e-4 soft
    rasterization with faces_per_pixel=50 (we use a leaner K — the soft
    fragments beyond ~8 contribute negligibly at sigma=1e-4), Adam x2 with
    StepLR (deform_mesh_with_color.py:149-159,289-306,372)."""

    n_views: int = 15
    views_per_step: int = 2
    texture_size: int = 256
    n_steps: int = 2000
    # Vertex lr: Adam, so lr IS the per-coordinate step scale. 1.0 (the
    # value the reference's commented-out SGD used) made every vertex
    # jump ~a sphere radius per step: the fit then GEOMETRICALLY
    # DIVERGES while the visible silhouette still chases the target —
    # |deform| grew to ~9 units and surface chamfer to ~70 (vs a 0.0012
    # sampling floor), masked for three rounds by silhouette-only
    # metrics. The reference's live optimizer is Adam(5e-4) with
    # StepLR(20, 0.5) (deform_mesh_with_color.py:289-300); our decay is
    # gentler (500/0.5), so 3e-3 measured best on the round-5 lr sweep:
    # chamfer 0.0017 (at the floor), full-view sil MSE 5.3e-3 — 30x the
    # old config's converged silhouette quality.
    lr_verts: float = 3e-3
    lr_texture: float = 0.05
    lr_decay_steps: int = 500
    lr_decay_rate: float = 0.5
    w_sil: float = 1.0
    w_rgb: float = 1.0
    w_edge: float = 1.0
    w_normal: float = 0.01
    # reference WEIGHTS[3] = 1.0 for the uniform laplacian
    # (deform_mesh_with_color.py:234); 0.1 measured 2.4x worse chamfer
    w_laplacian: float = 1.0
    w_clamp: float = 1.0
    sigma: float = 1e-4
    faces_per_pixel: int = 8
    # Shade RGB on only the nearest shade_k slots (the z-softmax blend at
    # gamma=1e-4 is decided by slot 0-1; slots beyond carry ~exp(-dz/1e-4)
    # weight). Silhouette gradients keep all faces_per_pixel slots.
    # Interpolation + texture sampling + lighting cost scales with this.
    shade_k: int = 2
    # Steps per device call; fit() host-loops over segments carrying the
    # optax state on device (bounded device-call time; see fit()).
    scan_segment: int = 250
    # Coarse-to-fine rasterization. The fused Pallas top-K kernel
    # (rasterize/pallas_hard._topk_select_kernel) makes binning the clear winner
    # at K=8: 5.9 ms vs 163 ms dense-XLA render+backward at the
    # reference's 128^2 scale (27x). bin_size=None = the renderer's AUTO
    # resolution (rasterize.autotune); bin_size=0 = dense XLA.
    # max_faces_per_bin=None = auto-size: measure the true max tile
    # occupancy of the concrete scene at make_dataset/fit setup and give
    # it 1.5x headroom (overflowing bins silently drop faces — a level-4
    # icosphere at 128^2 already peaks at ~490 faces/tile).
    bin_size: Optional[int] = 16
    max_faces_per_bin: Optional[int] = None
    # Active-tile compaction budget (RasterizationSettings.active_tiles).
    # None = auto-size from the concrete scene with 1.5x headroom (like
    # max_faces_per_bin; ~44% of tiles are empty at the reference's 128^2
    # joint-fit scale and every binned stage skips them); 0 = disable.
    active_tiles: Optional[int] = None
    # Reconstruct Phong world positions from camera rays (zbuf * pixel
    # ray) instead of interpolating 9 world-corner channels — drops ~25%
    # of the bin-gather/interp channel work. Eps-level shading change in
    # the blur band (self-consistent: the dataset renders use it too).
    # Default ON: measured 10.81 -> 10.35 ms/step (-4.3%) on the flagship
    # 128^2/K=8 grad step, same-session scan-harness A/B (2026-08-20).
    recon_points: bool = True


class JointShapeTextureFitter:
    """deform_mesh_with_color.py workload on one MeshRenderer."""

    def __init__(
        self, K, image_size: Tuple[int, int],
        config: JointFitConfig = JointFitConfig(), **renderer_kw,
    ):
        import math

        cfg = config
        self.config = cfg
        blur = math.log(1.0 / 1e-4 - 1.0) * cfg.sigma
        mfb = cfg.max_faces_per_bin if cfg.max_faces_per_bin else 128
        self.renderer = MeshRenderer(
            K, image_size, blur_radius=blur, sigma=cfg.sigma,
            faces_per_pixel=cfg.faces_per_pixel,
            bin_size=cfg.bin_size, max_faces_per_bin=mfb,
            shade_k=cfg.shade_k,
            active_tiles=cfg.active_tiles if cfg.active_tiles else None,
            recon_points=cfg.recon_points,
            **renderer_kw,
        )
        self._auto_mfb = mfb
        self._auto_act = 0  # grows monotonically, like _auto_mfb
        self._fit_cache: dict = {}

    def _ensure_bin_capacity(self, meshes: Meshes, Rs, ts) -> None:
        """Auto-size max_faces_per_bin from the CONCRETE scene (call
        outside jit). Overflowing bins silently drop the highest-index
        faces, so the capacity must cover the true max tile occupancy;
        1.5x headroom absorbs occupancy drift as the mesh deforms."""
        import math

        cfg = self.config
        if cfg.bin_size is None:
            # AUTO bin_size: seed the autotune cache for the jitted fit's
            # ACTUAL shape key — the loss renders views_per_step views,
            # not the n_views dataset batch, and a traced auto call with
            # no cached resolution falls back to dense (163 vs 5.9 ms at
            # the reference scale) with only a one-time warning.
            v = min(cfg.views_per_step, meshes.batch_size)
            sliced = jax.tree.map(lambda x: x[:v], meshes)
            self.renderer.prepare(sliced, Rs[:v], ts[:v])
            return
        from ..rasterize.binning import (
            count_active_tiles,
            count_overflow,
            tile_grid,
        )
        from ..rasterize.geometry import setup_faces

        st = self.renderer.settings
        cam = self.renderer.camera_with_pose(Rs, ts)
        fd = setup_faces(meshes, cam)
        pad = math.sqrt(st.blur_radius) if st.blur_radius > 0 else 0.0
        changed = {}
        if cfg.max_faces_per_bin is None:
            mx, _ = count_overflow(
                fd, self.renderer.image_size, cfg.bin_size, 0, pad
            )
            need = max(128, int(math.ceil(float(mx) * 1.5 / 128.0)) * 128)
            if need > self._auto_mfb:
                self._auto_mfb = need
                changed["max_faces_per_bin"] = need
        if cfg.active_tiles is None:
            # same auto contract as max_faces_per_bin: 1.5x headroom
            # absorbs footprint drift as the mesh deforms toward the target
            na = int(count_active_tiles(
                fd, self.renderer.image_size, cfg.bin_size, pad
            ))
            TH, TW, _ = tile_grid(self.renderer.image_size, cfg.bin_size)
            need_a = min(TH * TW, int(math.ceil(na * 1.5 / 8.0)) * 8)
            if need_a > self._auto_act:
                self._auto_act = need_a
                changed["active_tiles"] = (
                    need_a if need_a < TH * TW else None
                )
        if changed:
            self.renderer.settings = dataclasses.replace(st, **changed)
            self._fit_cache.clear()  # cached jits traced the old capacity

    # -- dataset generation (reference :114-209) -----------------------------
    def make_dataset(
        self, target_mesh: Meshes, dist: float = 2.7, elev: float = 10.0,
    ) -> Dict[str, jax.Array]:
        """Render the N-view reference dataset from evenly spaced azimuths."""
        n = self.config.n_views
        azims = jnp.linspace(-180.0, 180.0, n, endpoint=False)
        Rs, ts = look_at_view_transform(dist, elev, azims)
        batched = target_mesh.extend(n) if target_mesh.batch_size == 1 else target_mesh
        self._ensure_bin_capacity(batched, Rs, ts)
        out = self.renderer.render(
            batched, Rs, ts, with_silhouette=True, with_rgb=True
        )
        return jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            {"R": Rs, "t": ts, "rgb": out.rgb, "sil": out.silhouette,
             "depth": out.depth},
        )

    # -- parameters ----------------------------------------------------------
    def init_params(self, src_mesh: Meshes, verts_uvs: jax.Array) -> Dict:
        """{deform (V, 3) zeros, texture_map (T, T, 3) mid-grey}."""
        cfg = self.config
        del verts_uvs  # kept in the fitter call signature for clarity
        return {
            "deform": jnp.zeros(src_mesh.verts.shape[-2:], jnp.float32),
            "texture_map": jnp.full(
                (cfg.texture_size, cfg.texture_size, 3), 0.5, jnp.float32
            ),
        }

    # -- loss -----------------------------------------------------------------
    def loss(
        self, params: Dict, src_mesh: Meshes, topo, verts_uvs: jax.Array,
        dataset: Dict, view_idx: jax.Array,
    ):
        cfg = self.config
        v = cfg.views_per_step
        mesh = src_mesh.offset_verts(params["deform"])

        Rs = dataset["R"][view_idx]
        ts = dataset["t"][view_idx]
        ref_rgb = dataset["rgb"][view_idx]
        ref_sil = dataset["sil"][view_idx]

        tex = TexturesUV(
            maps=jnp.broadcast_to(
                params["texture_map"][None], (v,) + params["texture_map"].shape
            ),
            faces_uvs=jnp.repeat(src_mesh.faces[:1], v, axis=0),
            verts_uvs=jnp.broadcast_to(verts_uvs[None], (v,) + verts_uvs.shape),
        )
        batched = dataclasses.replace(mesh.extend(v), textures=tex)
        out = self.renderer.render(batched, Rs, ts, with_silhouette=True, with_rgb=True)

        sil_mse = jnp.mean((out.silhouette - ref_sil) ** 2)
        rgb_mse = jnp.mean((out.rgb - ref_rgb) ** 2)
        edge = mesh_edge_loss(mesh, topo)
        normal = mesh_normal_consistency(mesh, topo)
        lap = mesh_laplacian_smoothing(mesh, topo)
        tex_map = params["texture_map"]
        clamp = jnp.mean(jax.nn.relu(tex_map - 1.0) + jax.nn.relu(-tex_map))

        total = (
            cfg.w_sil * sil_mse + cfg.w_rgb * rgb_mse + cfg.w_edge * edge
            + cfg.w_normal * normal + cfg.w_laplacian * lap + cfg.w_clamp * clamp
        )
        return total, {
            "loss": total, "sil_mse": sil_mse, "rgb_mse": rgb_mse,
            "edge": edge, "normal": normal, "laplacian": lap, "clamp": clamp,
        }

    # -- optimization ----------------------------------------------------------
    def _make_optimizer(self) -> optax.GradientTransformation:
        cfg = self.config
        sched = lambda lr: optax.exponential_decay(
            lr, cfg.lr_decay_steps, cfg.lr_decay_rate, staircase=True
        )
        return optax.multi_transform(
            {"deform": optax.adam(sched(cfg.lr_verts)),
             "texture_map": optax.adam(sched(cfg.lr_texture))},
            param_labels={"deform": "deform", "texture_map": "texture_map"},
        )

    def fit(
        self, src_mesh: Meshes, verts_uvs: jax.Array, dataset: Dict,
        key: jax.Array, n_steps: Optional[int] = None,
        params0: Optional[Dict] = None,
    ):
        """Run the joint optimization; returns (params, history)."""
        cfg = self.config
        n = int(n_steps if n_steps is not None else cfg.n_steps)
        src_batched = (
            src_mesh.extend(cfg.n_views) if src_mesh.batch_size == 1
            else src_mesh
        )
        self._ensure_bin_capacity(src_batched, dataset["R"], dataset["t"])
        topo = build_topology(src_mesh)
        tx = self._make_optimizer()
        params = params0 if params0 is not None else self.init_params(src_mesh, verts_uvs)

        # The scan runs in SEGMENTS of bounded device time, with the optax
        # state carried across calls on device: one monolithic n-step scan
        # is a single multi-ten-second device call, which the tunneled TPU
        # runtime intermittently kills (UNAVAILABLE) past ~30 s. Segmenting
        # costs one dispatch per cfg.scan_segment steps (microseconds); lr
        # schedules and optimizer state continue exactly (they live in the
        # optax state). NB the random view sequence depends on the segment
        # size (keys fold per segment), so changing scan_segment changes
        # the sampled views — not the distribution or convergence.
        seg = max(1, min(cfg.scan_segment, n))

        def make_run(length):
            @jax.jit
            def run(params, opt_state, src_mesh, topo, verts_uvs, dataset,
                    key):
                def body(carry, k):
                    params, opt_state = carry
                    idx = jax.random.choice(
                        k, cfg.n_views, (cfg.views_per_step,), replace=False
                    )
                    (loss, metrics), grads = jax.value_and_grad(
                        self.loss, has_aux=True
                    )(params, src_mesh, topo, verts_uvs, dataset, idx)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), metrics

                keys = jax.random.split(key, length)
                (params, opt_state), history = jax.lax.scan(
                    body, (params, opt_state), keys
                )
                return params, opt_state, history

            return run

        opt_state = jax.jit(tx.init)(params)
        histories = []
        done = 0
        s = 0
        # The final segment is sized to the remainder so exactly n optimizer
        # steps run (a fixed-size last segment would overshoot and leave the
        # returned params ahead of the reported history).
        while done < n:
            step_n = min(seg, n - done)
            if step_n not in self._fit_cache:
                self._fit_cache[step_n] = make_run(step_n)
            params, opt_state, hist = self._fit_cache[step_n](
                params, opt_state, src_mesh, topo, verts_uvs, dataset,
                jax.random.fold_in(key, s),
            )
            histories.append(hist)
            done += step_n
            s += 1
        history = jax.tree_util.tree_map(
            lambda *hs: jnp.concatenate(hs, axis=0), *histories
        )
        return params, history

    def textured_mesh(self, src_mesh: Meshes, verts_uvs, params: Dict) -> Meshes:
        """Final mesh with the optimized texture attached (for save_obj —
        the reference's result_colored.obj export at :460)."""
        tex = TexturesUV(
            maps=params["texture_map"][None],
            faces_uvs=src_mesh.faces[:1],
            verts_uvs=verts_uvs[None],
        )
        return dataclasses.replace(
            src_mesh.offset_verts(params["deform"]), textures=tex
        )
