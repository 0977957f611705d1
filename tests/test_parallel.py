"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.pose_fit import pose_params_from_Rt
from torch_renderer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from torch_renderer_tpu.parallel.sharded import (
    make_sharded_pose_step,
    soft_silhouette_sharded,
)
from torch_renderer_tpu.rasterize.soft import soft_silhouette_streaming
from torch_renderer_tpu.structures.meshes import Meshes

IMAGE = (32, 32)
B = 4


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(1)  # 80 faces
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * IMAGE[0]
    K = np.array(
        [[f, 0, IMAGE[1] / 2], [0, f, IMAGE[0] / 2], [0, 0, 1]], np.float32
    )
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 3.0], np.float32), (B, 1))
    cam = PerspectiveCamera.from_K(K, IMAGE, R=R, t=t)
    return meshes, cam, K


@pytest.fixture(scope="module")
def device_mesh(eight_devices):
    return make_mesh((4, 2), ("data", "model"), eight_devices)


def test_sharded_silhouette_matches_streaming(scene, device_mesh):
    meshes, cam, _ = scene
    want = soft_silhouette_streaming(meshes, cam)
    got = soft_silhouette_sharded(
        shard_batch(meshes, device_mesh), cam, device_mesh,
        pixel_chunk=512, face_chunk=16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sharded_silhouette_gradients_match(scene, device_mesh):
    meshes, cam, _ = scene

    def loss_sharded(v):
        return jnp.sum(
            soft_silhouette_sharded(
                meshes.update_padded(v), cam, device_mesh,
                pixel_chunk=512, face_chunk=16,
            )
        )

    def loss_ref(v):
        return jnp.sum(soft_silhouette_streaming(meshes.update_padded(v), cam))

    g_sharded = jax.grad(loss_sharded)(meshes.verts)
    g_ref = jax.grad(loss_ref)(meshes.verts)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_ref), atol=1e-3, rtol=1e-3
    )


def test_sharded_pose_step_decreases_loss(scene, device_mesh):
    meshes, cam, K = scene
    base_cam = PerspectiveCamera.from_K(K, IMAGE)
    ref_sil = soft_silhouette_streaming(meshes, cam)

    R0 = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t0 = np.tile(np.array([0.1, -0.05, 3.2], np.float32), (B, 1))
    params = shard_batch(pose_params_from_Rt(R0, t0), device_mesh)

    tx = optax.adam(5e-3)
    step = make_sharded_pose_step(
        device_mesh, base_cam, tx, pixel_chunk=512, face_chunk=16
    )
    opt_state = tx.init(params)
    meshes_s = shard_batch(meshes, device_mesh)
    refs_s = shard_batch(ref_sil, device_mesh)

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, meshes_s, refs_s)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_data_parallel_matches_single_device(scene, device_mesh):
    """GSPMD-sharded render equals the unsharded one."""
    meshes, cam, _ = scene
    want = soft_silhouette_streaming(meshes, cam)
    meshes_s = shard_batch(meshes, device_mesh)
    cam_s = replicate(cam, device_mesh)
    got = jax.jit(soft_silhouette_streaming)(meshes_s, cam_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sharded_pallas_matches_streaming(scene, device_mesh):
    """Face-sharded Pallas kernel inside shard_map == streaming oracle."""
    meshes, cam, _ = scene
    want = soft_silhouette_streaming(meshes, cam)
    got = soft_silhouette_sharded(
        shard_batch(meshes, device_mesh), cam, device_mesh,
        impl="pallas", faces_per_tile=40,  # 80 faces / 2 shards
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_sharded_pallas_active_tiles_matches_streaming(scene, device_mesh):
    """Per-shard active-tile compaction inside shard_map stays exact (each
    shard compacts against its own face slice's footprint)."""
    import math

    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces
    from torch_renderer_tpu.rasterize.soft import SOFT_CUTOFF

    meshes, cam, _ = scene
    want = soft_silhouette_streaming(meshes, cam)
    # budget from the FULL face set: every shard's footprint is a subset
    act = suggest_active_tiles_fd(
        setup_faces(meshes, cam), cam.image_size, 16,
        math.sqrt(SOFT_CUTOFF * 1e-4),
    )
    got = soft_silhouette_sharded(
        shard_batch(meshes, device_mesh), cam, device_mesh,
        impl="pallas", faces_per_tile=40, active_tiles=act,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_sharded_pallas_packed_matches_streaming(scene, device_mesh):
    """Group-packed kernel layout inside shard_map == streaming oracle
    (the per-shard pack composes with the model-axis psum unchanged)."""
    import math

    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces
    from torch_renderer_tpu.rasterize.soft import SOFT_CUTOFF

    meshes, cam, _ = scene
    want = soft_silhouette_streaming(meshes, cam)
    act = suggest_active_tiles_fd(
        setup_faces(meshes, cam), cam.image_size, 16,
        math.sqrt(SOFT_CUTOFF * 1e-4),
    )
    got = soft_silhouette_sharded(
        shard_batch(meshes, device_mesh), cam, device_mesh,
        impl="pallas", faces_per_tile=40, active_tiles=act,
        layout="packed", group_lanes=256,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 4), (8, 1), (1, 8)])
def test_sharded_silhouette_other_mesh_shapes(scene, eight_devices, shape):
    """dp/tp ratios beyond the default (4,2): pure-tp, pure-dp, tall-tp.

    B=4 over an 8-way data axis exercises the internal batch padding (the
    meshes are passed unsharded; soft_silhouette_sharded pads to a multiple
    of dsize and slices the result back)."""
    meshes, cam, _ = scene
    dm = make_mesh(shape, ("data", "model"), eight_devices)
    meshes_in = shard_batch(meshes, dm) if B % shape[0] == 0 else meshes
    want = soft_silhouette_streaming(meshes, cam)
    got = soft_silhouette_sharded(
        meshes_in, cam, dm, pixel_chunk=512, face_chunk=16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sharded_silhouette_uneven_batch(scene, eight_devices):
    """B=3 over a 4-way data axis: zero-padded internally, sliced back, and
    gradients flow only to the real batch rows."""
    meshes4, cam4, K = scene
    meshes = meshes4[:3]
    f = 0.8 * IMAGE[0]
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (3, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 3.0], np.float32), (3, 1))
    cam = PerspectiveCamera.from_K(K, IMAGE, R=R, t=t)
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    want = soft_silhouette_streaming(meshes, cam)
    got = soft_silhouette_sharded(
        meshes, cam, dm, pixel_chunk=512, face_chunk=16,
    )
    assert got.shape == (3, *IMAGE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss(v):
        return jnp.sum(
            soft_silhouette_sharded(
                meshes.update_padded(v), cam, dm,
                pixel_chunk=512, face_chunk=16,
            )
        )

    def loss_ref(v):
        return jnp.sum(soft_silhouette_streaming(meshes.update_padded(v), cam))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(meshes.verts)),
        np.asarray(jax.grad(loss_ref)(meshes.verts)),
        atol=1e-3, rtol=1e-3,
    )


# -- sharded GMM pose search -------------------------------------------------


@pytest.fixture(scope="module")
def search_problem():
    from torch_renderer_tpu.transforms.so3 import (
        euler_angles_to_matrix,
        transform_points,
    )

    key = jax.random.PRNGKey(3)
    ref = jax.random.normal(key, (96, 3)) * 0.2
    gt_R = euler_angles_to_matrix(jnp.array([0.3, -0.5, 0.9]), "XYZ")
    gt_t = jnp.array([0.15, -0.05, 0.2])
    target = transform_points(gt_R, gt_t, ref)
    return ref, target


def test_sharded_pose_search_matches_single(search_problem, eight_devices):
    """Hypothesis-axis sharding over 'data' must reproduce the single-device
    search (per-hypothesis chamfer math is unchanged; sharding only splits
    the hypothesis batch)."""
    from torch_renderer_tpu.opt.pose_search import (
        GMMPoseSearch,
        PoseSearchConfig,
    )

    ref, target = search_problem
    cfg = PoseSearchConfig(n_hypotheses=64, n_elite=16, n_iters=3)
    search = GMMPoseSearch(ref, cfg)
    key = jax.random.PRNGKey(7)
    plain = search.search(key, target)
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    sharded = search.search(key, target, device_mesh=dm)
    for name in ("pose6d", "score", "best_history"):
        np.testing.assert_allclose(
            np.asarray(plain[name]), np.asarray(sharded[name]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    # the search actually works: best score improves on the first elite
    assert float(sharded["score"]) <= float(sharded["best_history"][0])


def test_sharded_pose_search_rejects_uneven_hypotheses(
    search_problem, eight_devices
):
    from torch_renderer_tpu.opt.pose_search import (
        GMMPoseSearch,
        PoseSearchConfig,
    )

    ref, target = search_problem
    search = GMMPoseSearch(
        ref, PoseSearchConfig(n_hypotheses=30, n_elite=8, n_iters=1)
    )
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    with pytest.raises(ValueError, match="data"):
        search.search(jax.random.PRNGKey(0), target, device_mesh=dm)


def test_sharded_search_batch_pads_uneven(search_problem, eight_devices):
    """Batch-axis sharding with B=3 on a 4-way data axis: padded searches
    are sliced off and real targets match the unsharded batch."""
    from torch_renderer_tpu.opt.pose_search import (
        GMMPoseSearch,
        PoseSearchConfig,
    )
    from torch_renderer_tpu.transforms.so3 import transform_points

    ref, target = search_problem
    targets = jnp.stack([
        target,
        transform_points(jnp.eye(3), jnp.array([0.1, 0.0, -0.1]), target),
        transform_points(jnp.eye(3), jnp.array([-0.2, 0.1, 0.0]), target),
    ])
    cfg = PoseSearchConfig(n_hypotheses=32, n_elite=8, n_iters=2)
    search = GMMPoseSearch(ref, cfg)
    key = jax.random.PRNGKey(11)
    plain = search.search_batch(key, targets)
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    sharded = search.search_batch(key, targets, device_mesh=dm)
    assert sharded["pose6d"].shape == (3, 6)
    np.testing.assert_allclose(
        np.asarray(plain["score"]), np.asarray(sharded["score"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(plain["pose6d"]), np.asarray(sharded["pose6d"]),
        rtol=1e-5, atol=1e-6,
    )


def test_sharded_icp_registration_matches_single(eight_devices):
    """Object-axis sharded batched ICP (uneven B=5 on a 4-way data axis)
    matches the single-device solution on every field."""
    from torch_renderer_tpu.opt.registration import (
        RegisterDataConfig,
        create_register_data,
        register_batch,
        register_batch_sharded,
    )

    base = jax.random.normal(jax.random.PRNGKey(6), (64, 3)) * 0.2
    data = create_register_data(
        jax.random.PRNGKey(5), base,
        RegisterDataConfig(n_objects=5, crop_fraction=0.3),
    )
    plain = register_batch(data, max_iterations=12)
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    sharded = register_batch_sharded(data, dm, max_iterations=12)
    np.testing.assert_allclose(
        np.asarray(plain.RTs.R), np.asarray(sharded.RTs.R),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(plain.RTs.t), np.asarray(sharded.RTs.t),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(plain.rmse), np.asarray(sharded.rmse),
        rtol=1e-5, atol=1e-6,
    )


def test_sharded_datagen_matches_single(eight_devices, tmp_path):
    """Datagen view-axis sharding over 'data' is bit-exact vs the
    single-device generator (packed u8/u16 outputs compare equal)."""
    from torch_renderer_tpu.datagen.coco import (
        COCODataGenerator,
        DataGenConfig,
        ObjectLibrary,
    )

    cfg = DataGenConfig(
        image_size=(64, 64), views_per_scene=6, view_chunk=3,
        objects_per_scene=(2, 2), material_mode="vertex",
        normal_maps=True, bin_size=16, max_faces_per_bin=96,
    )
    lib = ObjectLibrary.primitives(2, level=1)
    gen_plain = COCODataGenerator(lib, cfg)
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    gen_shard = COCODataGenerator(lib, cfg, device_mesh=dm)
    assert gen_shard.config.view_chunk == 4  # rounded up to the axis size

    rng1 = np.random.default_rng(9)
    rng2 = np.random.default_rng(9)
    scene1, poses1 = gen_plain.sample_scene(rng1)
    scene2, poses2 = gen_shard.sample_scene(rng2)
    out1 = gen_plain.render_scene(scene1, np.random.default_rng(3))
    out2 = gen_shard.render_scene(scene2, np.random.default_rng(3))
    for k in ("rgb", "depth", "segmentation", "normals"):
        np.testing.assert_array_equal(
            np.asarray(out1[k]), np.asarray(out2[k]), err_msg=k
        )


def test_sharded_icp_uneven_with_init_transform(eight_devices):
    """init_transform pads alongside the data on uneven batches (review
    regression: un-padded init crashed with a batch-dim mismatch)."""
    from torch_renderer_tpu.ops.icp import SimilarityTransform
    from torch_renderer_tpu.opt.registration import (
        RegisterDataConfig,
        create_register_data,
        register_batch,
        register_batch_sharded,
    )

    base = jax.random.normal(jax.random.PRNGKey(6), (48, 3)) * 0.2
    data = create_register_data(
        jax.random.PRNGKey(5), base, RegisterDataConfig(n_objects=3),
    )
    init = SimilarityTransform(
        R=jnp.broadcast_to(jnp.eye(3), (3, 3, 3)),
        t=jnp.zeros((3, 3)), s=jnp.ones((3,)),
    )
    dm = make_mesh((4, 2), ("data", "model"), eight_devices)
    plain = register_batch(data, max_iterations=8, init_transform=init)
    sharded = register_batch_sharded(
        data, dm, max_iterations=8, init_transform=init
    )
    np.testing.assert_allclose(
        np.asarray(plain.RTs.t), np.asarray(sharded.RTs.t),
        rtol=1e-5, atol=1e-6,
    )


def test_bench_scan_step_sharded_matches_single(eight_devices, monkeypatch):
    """The driver-bench north-star pass (bench.make_scan_step) sharded over
    an 8-device data mesh must produce the SAME final verts as the
    single-device scan on the identical total batch — proves bench.py's
    multi-chip path end-to-end (VERDICT r2 #4) on the virtual CPU mesh."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import bench
    from jax.sharding import Mesh

    monkeypatch.setattr(bench, "B", 1)
    monkeypatch.setattr(bench, "IMAGE", 64)
    monkeypatch.setattr(bench, "LEVEL", 1)
    monkeypatch.setattr(bench, "STEPS", 3)

    dmesh = Mesh(np.array(eight_devices), ("data",))
    step_s, args_s = bench.make_scan_step(dmesh)
    out_sharded = np.asarray(jax.block_until_ready(step_s(*args_s)))
    assert out_sharded.shape[0] == 8  # B * n_devices

    # single-device reference over the SAME total batch
    monkeypatch.setattr(bench, "B", 8)
    step_1, args_1 = bench.make_scan_step(None)
    out_single = np.asarray(jax.block_until_ready(step_1(*args_1)))

    np.testing.assert_allclose(out_sharded, out_single, rtol=0, atol=1e-6)
    # the scan must have moved the verts (a real render+backward ran)
    assert np.abs(out_sharded - np.asarray(args_s[0])).max() > 0


def test_sharded_point_render_matches_single(eight_devices):
    """render_points_sharded (cloud-batch over 'data', no collectives)
    matches the single-device point renderers — incl. the uneven batch
    (B=3 over 8 devices -> internal padding) and the sphere Pulsar
    renderer's per-point radii. Comparison allows rare boundary-pixel
    flips: the per-shard batch of 1 compiles different fusions than the
    B=3 reference, and eps-level projection differences flip hard
    `d2 <= r2` coverage tests on splat-boundary pixels (<1% of pixels;
    every other pixel matches to 1e-5)."""
    from torch_renderer_tpu.parallel.sharded import render_points_sharded
    from torch_renderer_tpu.renderer import AlphaPointRender, PulsarRenderer
    from torch_renderer_tpu.structures.pointclouds import Pointclouds

    dm = make_mesh((8, 1), ("data", "model"), eight_devices)
    Bp, P = 3, 300
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.3, (Bp, P, 3)).astype(np.float32)
    pts[..., 2] += 2.5
    feats = rng.uniform(0, 1, (Bp, P, 3)).astype(np.float32)
    pcl = Pointclouds(
        points=jnp.asarray(pts), num_points=jnp.full((Bp,), P, jnp.int32),
        features=jnp.asarray(feats))
    S = 32
    f = 0.8 * S
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (Bp, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 2.5], np.float32), (Bp, 1))

    for r in (
        AlphaPointRender(K, (S, S), radius=0.05, bin_size=16,
                         max_points_per_bin=128),
        PulsarRenderer(K, (S, S), radius=0.05, bin_size=16,
                       max_points_per_bin=128),
    ):
        want = np.asarray(r.render(pcl, R, t))
        got = np.asarray(render_points_sharded(r, pcl, R, t, dm))
        diff = np.abs(got - want)
        flipped = diff > 1e-5
        assert flipped.mean() < 0.01, flipped.mean()
        np.testing.assert_allclose(got[~flipped], want[~flipped], atol=1e-5)
