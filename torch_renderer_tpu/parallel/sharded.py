"""SPMD rendering and optimization over a device mesh.

Two parallel axes (see parallel/mesh.py):

  * data-parallel — GSPMD does it for free: place the batch axis of
    (meshes, poses, reference images, per-item params) on the 'data' axis
    with `shard_batch` and jit the normal step; XLA inserts the loss-psum.
    This scales the reference's only parallel axis (`Meshes.extend` batches,
    reference batch_rendering_test.py:325-328) across chips.

  * face-parallel ('model' axis) — explicit shard_map: the SoftRas coverage
    sum S decomposes over faces (rasterize/soft.py), so each shard measures
    its face slice against every pixel and ONE psum over 'model' combines
    them. Renders meshes whose face count exceeds a single chip's appetite
    and cuts per-chip work m-fold on the north-star soft-silhouette metric.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..cameras.perspective import PerspectiveCamera
from ..rasterize.geometry import setup_faces
from ..rasterize.soft import soft_coverage_sum
from ..structures.meshes import Meshes
from .mesh import DATA_AXIS, MODEL_AXIS, pad_axis_to_multiple, shard_batch


def _fd_specs(fd, data_axis: Optional[str], model_axis: Optional[str]):
    """PartitionSpecs for FaceRasterData leaves: (B, F, ...) ->
    P(data, model, None...)."""
    return jax.tree_util.tree_map(
        lambda x: P(data_axis, model_axis, *([None] * (x.ndim - 2))), fd
    )


def soft_silhouette_sharded(
    meshes: Meshes,
    camera: PerspectiveCamera,
    device_mesh: Mesh,
    sigma: float = 1e-4,
    pixel_chunk: int = 8192,
    face_chunk: int = 1024,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
    impl: str = "streaming",
    faces_per_tile: int = 128,
    active_tiles: Optional[int] = None,
    layout: str = "lane",
    group_lanes: Optional[int] = None,
) -> jax.Array:
    """Soft silhouette (B, H, W) with faces sharded over `model_axis` and the
    batch over `data_axis`. Exact (same sum as the dense streaming oracle);
    differentiable end-to-end (psum backward = identity broadcast).

    Both axes are zero-padded to shard evenly: the face axis over the model
    axis (padding faces carry valid=False and contribute softplus of +inf =
    0) and the batch axis over the data axis (padded batch rows are all-
    invalid and are sliced off the returned silhouette).
    impl='pallas' runs each shard's coverage sum through the fused TPU kernel
    (rasterize/pallas_soft) — size faces_per_tile for the LOCAL face count,
    and active_tiles (optional tile compaction) for the LOCAL shard's
    non-empty tile count (each shard sees only its face slice).
    layout/group_lanes select the kernel layout per shard (the group-packed
    kernels compose with sharding exactly like the lane layout: the psum
    over model_axis sums per-shard coverage; see pallas_soft layout docs).
    """
    msize = device_mesh.shape[model_axis]
    dsize = device_mesh.shape[data_axis]
    if impl == "pallas":
        # channel planes shard as clean (B, F) arrays and skip the
        # tiny-trailing-dim corner tensors (geometry.setup_face_planes);
        # the streaming oracle path keeps FaceRasterData (its math reads
        # the (B, F, 3, 2) corners directly)
        from ..rasterize.geometry import setup_face_planes

        fd = setup_face_planes(meshes, camera)
    else:
        fd = setup_faces(meshes, camera)
    batch = fd.valid.shape[0]
    fd = jax.tree_util.tree_map(
        lambda x: pad_axis_to_multiple(
            pad_axis_to_multiple(x, 1, msize), 0, dsize
        ),
        fd,
    )
    image_size = camera.image_size

    def local(fd_local):
        if impl == "pallas":
            from ..rasterize.pallas_soft import soft_silhouette_pallas_fd

            S = soft_silhouette_pallas_fd(
                fd_local, image_size, sigma=sigma,
                faces_per_tile=faces_per_tile, return_sum=True,
                active_tiles=active_tiles, layout=layout,
                group_lanes=group_lanes,
            )
        else:
            S = soft_coverage_sum(
                fd_local, image_size, sigma=sigma,
                pixel_chunk=pixel_chunk, face_chunk=face_chunk,
            )
        return jax.lax.psum(S, model_axis)

    # check_vma=False: the coverage sum's scan carry is initialized with
    # jnp.zeros inside rasterize/soft.py, which jax's varying-axes checker
    # flags as unvarying; semantics are unaffected (one psum over model_axis).
    alpha_fn = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(_fd_specs(fd, data_axis, model_axis),),
        out_specs=P(data_axis, None, None),
        check_vma=False,
    )
    S = alpha_fn(fd)
    return (1.0 - jnp.exp(-S))[:batch]


def render_points_sharded(
    renderer,
    pointclouds,
    R,
    tvec,
    device_mesh: Mesh,
    data_axis: str = DATA_AXIS,
):
    """Point rendering with the CLOUD-BATCH axis sharded over `data_axis`
    (SURVEY §2d: FPS/chip applies to every renderer, not just meshes).

    renderer: any PointsRenderer subclass (AlphaPointRender /
    NormPointRender / PulsarPointRender / PulsarRenderer). Clouds are
    independent, so there are no collectives — each shard renders its own
    batch slice; the batch is padded to a multiple of the data-axis size
    and sliced back. shard_map rather than sharded-inputs jit because the
    fused point selection kernel (pallas_points) is opaque to GSPMD's
    auto-partitioner (same reason as bench.make_scan_step)."""
    from .mesh import pad_batch_to

    d = device_mesh.shape[data_axis]
    B = pointclouds.points.shape[0]
    Bp = -(-B // d) * d
    args, _ = pad_batch_to(
        (pointclouds, jnp.asarray(R), jnp.asarray(tvec)), Bp)

    # auto bin settings resolve from concrete inputs only: size them here
    # at the PER-SHARD shapes (what the shard_map body will see) so the
    # traced renders inside hit the resolution cache instead of falling
    # back to the dense path — and from EVERY shard's slice (grow=True
    # max-merges budgets into the cached resolution): sizing from shard 0
    # alone would let a denser cloud on another shard silently overflow
    # the shared budget (round-5 review finding)
    if getattr(renderer.settings, "bin_size", 0) is None:
        Bs = Bp // d
        for i in range(d):
            local = jax.tree_util.tree_map(
                lambda x: x[i * Bs:(i + 1) * Bs], args)
            renderer.prepare(*local, grow=True)

    # cache the jitted shard-mapped callable on the renderer: a fresh
    # @jax.jit wrapper per call would retrace+recompile EVERY invocation
    # (measured ~1.55 s per repeat call of a tiny scene vs milliseconds
    # cached), turning any loop over this function into compile-bound
    cache = renderer.__dict__.setdefault("_points_shard_jit", {})
    key = (device_mesh, data_axis)
    if key not in cache:
        @jax.jit
        def run(pcl, Rp, tp):
            in_specs = jax.tree_util.tree_map(
                lambda x: P(data_axis, *([None] * (x.ndim - 1))),
                (pcl, Rp, tp))
            return shard_map(
                lambda a, b, c: renderer.render(a, b, c),
                mesh=device_mesh,
                in_specs=in_specs,
                out_specs=P(data_axis),
                check_vma=False,
            )(pcl, Rp, tp)

        cache[key] = run
    return cache[key](*args)[:B]


def data_parallel_fit(fitter, meshes: Meshes, refs, params0, device_mesh: Mesh,
                      n_steps: Optional[int] = None, data_axis: str = DATA_AXIS):
    """Run CameraPoseFitter.fit with the batch sharded over `data_axis`.

    Pure GSPMD: inputs are placed with NamedShardings and the jitted scan
    runs SPMD — each chip renders/fits its batch shard, scalar-loss psums
    are inserted by XLA. Returns (params, history) like fit()."""
    meshes_s = shard_batch(meshes, device_mesh, data_axis)
    refs_s = shard_batch(refs, device_mesh, data_axis)
    params_s = shard_batch(params0, device_mesh, data_axis)
    return fitter.fit(meshes_s, refs_s, params_s, n_steps)


def sharded_silhouette_loss(
    meshes: Meshes, camera: PerspectiveCamera, ref_sil: jax.Array,
    device_mesh: Mesh, sigma: float = 1e-4, **kw,
) -> jax.Array:
    """Mean-L1 silhouette loss on the dp+tp sharded render (scalar)."""
    sil = soft_silhouette_sharded(meshes, camera, device_mesh, sigma=sigma, **kw)
    return jnp.mean(jnp.abs(sil - ref_sil))


def make_sharded_pose_step(
    device_mesh: Mesh,
    base_camera: PerspectiveCamera,
    optimizer,
    sigma: float = 1e-4,
    pixel_chunk: int = 8192,
    face_chunk: int = 512,
):
    """Full dp+tp pose-optimization train step (the multi-chip training path).

    Parameters {t (B,3), quat (B,4)} pose per batch item; the silhouette is
    rendered with faces sharded over 'model' and batch over 'data'; Adam
    update included. Returns step(params, opt_state, meshes, ref_sil) ->
    (params, opt_state, loss)."""
    from ..transforms.so3 import quaternion_normalize, quaternion_to_matrix
    import optax

    def loss_fn(params, meshes, ref_sil):
        R = quaternion_to_matrix(quaternion_normalize(params["quat"]))
        cam = base_camera.replace_pose(R, params["t"])
        sil = soft_silhouette_sharded(
            meshes, cam, device_mesh, sigma=sigma,
            pixel_chunk=pixel_chunk, face_chunk=face_chunk,
        )
        qn = jnp.linalg.norm(params["quat"], axis=-1)
        return jnp.mean(jnp.abs(sil - ref_sil)) + jnp.mean((qn - 1.0) ** 2)

    @jax.jit
    def step(params, opt_state, meshes, ref_sil):
        loss, grads = jax.value_and_grad(loss_fn)(params, meshes, ref_sil)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
