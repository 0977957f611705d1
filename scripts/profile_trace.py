"""Device op-profile for a workload step via jax.profiler + xprof.

Captures a trace of N repetitions of a jitted step and prints the
per-step self time of every HLO op category and the top ops inside each,
with their HLO expressions — the tool that pinned the north-star grad
step's hidden 1.5x gather-chunk padding (docs/ROUND2_NOTES.md). Works
through the axon tunnel (the trace is host-assembled).

Usage:
  python scripts/profile_trace.py --workload northstar [--steps 10]
  python scripts/profile_trace.py --workload posefit

Notes:
  * run from the repo root (or with the repo on PYTHONPATH — do NOT
    overwrite PYTHONPATH wholesale: the axon plugin lives on it).
  * rawTime units in the xprof op_profile JSON are picoseconds.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _northstar():
    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize import pallas_soft as ps
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.structures.meshes import Meshes

    B, IMAGE, SIGMA = 8, 256, 1e-4
    verts, faces = icosphere(3)
    f = 0.8 * IMAGE
    K = np.array(
        [[f, 0, IMAGE / 2.0], [0, f, IMAGE / 2.0], [0, 0, 1.0]], np.float32
    )
    meshes = Meshes.from_single(verts, faces).extend(B)
    cam = PerspectiveCamera.from_K(
        K, (IMAGE, IMAGE),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)),
        t=np.tile(np.array([0.0, 0.0, 3.0], np.float32), (B, 1)),
    )
    fp0 = setup_face_planes(meshes, cam)
    fpt = ps.suggest_faces_per_tile(fp0, (IMAGE, IMAGE))
    act = ps.suggest_active_tiles(fp0, (IMAGE, IMAGE))
    gl = ps.suggest_group_lanes(fp0, (IMAGE, IMAGE), active_tiles=act,
                                faces_per_tile=fpt)

    def loss(v):
        fp = setup_face_planes(meshes.update_padded(v), cam)
        a = ps.soft_silhouette_pallas_fd(
            fp, (IMAGE, IMAGE), sigma=SIGMA, faces_per_tile=fpt,
            active_tiles=act, layout="packed", group_lanes=gl,
        )
        return jnp.sum(a)

    import jax as _j
    return _j.jit(_j.grad(loss)), (meshes.verts,)


def _posefit():
    """One CameraPoseFitter grad step, app-equivalent TPU config
    (pallas silhouette, packed layout, auto budgets)."""
    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.opt.pose_fit import (
        CameraPoseFitter, PoseFitConfig, pose_params_from_Rt,
    )
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.rasterize.pallas_soft import (
        suggest_active_tiles, suggest_group_lanes,
    )
    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.structures.meshes import Meshes

    # the docs/BENCHMARKS.md flagship config: 128^2, binned K=1 fragments
    # (bin_size 16), pallas packed silhouette, auto budgets with 2x margin
    IMAGE = 128
    verts, faces = icosphere(3)
    meshes = Meshes.from_single(verts, faces)
    f = 0.8 * IMAGE
    K = np.array(
        [[f, 0, IMAGE / 2.0], [0, f, IMAGE / 2.0], [0, 0, 1.0]], np.float32
    )
    R = np.eye(3, dtype=np.float32)[None]
    t = np.array([[0.0, 0.0, 3.0]], np.float32)
    cam = PerspectiveCamera.from_K(K, (IMAGE, IMAGE), R=R, t=t)
    fp = setup_face_planes(meshes, cam)
    act = suggest_active_tiles(fp, (IMAGE, IMAGE), margin=2.0)
    gl = suggest_group_lanes(fp, (IMAGE, IMAGE), active_tiles=act,
                             margin=2.0)
    fitter = CameraPoseFitter(
        K, (IMAGE, IMAGE), config=PoseFitConfig(),
        bin_size=16, max_faces_per_bin=128, active_tiles=act,
        silhouette_impl="pallas", sil_active_tiles=act,
        sil_layout="packed", sil_group_lanes=gl,
        select_impl=(
            "affine" if os.environ.get("PROFILE_AFFINE") else "auto"
        ),
    )
    refs = fitter.make_references(meshes, R, t)
    params = pose_params_from_Rt(
        R, t + np.array([[0.05, -0.04, 0.1]], np.float32))

    def one_step(p):
        (loss_v, _), grads = jax.value_and_grad(
            fitter.loss, has_aux=True)(p, meshes, refs)
        return loss_v, grads

    return jax.jit(one_step), (params,)


def _depth720():
    """One 12-view 1280x720 batched depth-render call (the reference's
    headline harness shape, apps/batch_render_bench.py defaults)."""
    import jax
    import jax.numpy as jnp

    import os

    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize.binning import (
        count_overflow, suggest_active_tiles_fd, suggest_occupancy_split_fd,
    )
    from torch_renderer_tpu.rasterize.geometry import setup_faces
    from torch_renderer_tpu.renderer import DepthRender
    from torch_renderer_tpu.structures.meshes import Meshes

    H, W, vc = 720, 1280, 12
    verts, faces = icosphere(4)  # 5120 faces, the bench's default scene
    meshes = Meshes.from_single(verts, faces)
    f = 0.9 * min(H, W)
    K = np.array(
        [[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32
    )
    azims = jnp.linspace(0.0, 360.0, vc, endpoint=False)
    Rs, ts = look_at_view_transform(2.7, 15.0, azims)
    cam0 = PerspectiveCamera.from_K(K, (H, W), R=Rs, t=ts)
    fd0 = setup_faces(meshes.extend(vc), cam0)
    max_count, _ = count_overflow(fd0, (H, W), 32, 0, 0.0)
    mfb = max(8, int(float(max_count) * 1.3))
    act = suggest_active_tiles_fd(fd0, (H, W), 32, 0.0)
    split = None
    if not os.environ.get("PROFILE_NO_SPLIT"):
        split = suggest_occupancy_split_fd(fd0, (H, W), 32, 0.0, act, mfb)
    sel = "affine" if os.environ.get("PROFILE_AFFINE") else "auto"
    unt = "pallas" if os.environ.get("PROFILE_UNTILE") else "xla"
    renderer = DepthRender(
        K, (H, W), pixel_chunk=1048576, bin_size=32,
        max_faces_per_bin=mfb, active_tiles=act, occupancy_split=split,
        select_impl=sel, untile_impl=unt,
    )
    batched = meshes.extend(vc)
    step = jax.jit(lambda m, R, t: renderer.render(m, R, t))
    return step, (batched, Rs, ts)


def _jointfit():
    """One JointShapeTextureFitter grad+update step (the fit() scan body)
    at the docs/BENCHMARKS.md scale: 128^2, level-4 icosphere, 15 views,
    2 views/step, K=8, shade_k=2, auto bin/active budgets."""
    import jax
    import numpy as np

    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.opt.deform_color import (
        JointFitConfig,
        JointShapeTextureFitter,
    )
    from torch_renderer_tpu.ops.mesh_losses import build_topology
    from torch_renderer_tpu.structures.meshes import Meshes
    from torch_renderer_tpu.structures.textures import sphere_uv_mapping

    H = W = 128
    verts, faces = icosphere(4)
    src = Meshes.from_single(verts, faces)
    tgt = Meshes.from_single(
        verts * np.array([1.0, 0.7, 0.9], np.float32), faces)
    f = 0.8 * H
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)
    import os

    # PROFILE_RECON=1: camera-ray world-position reconstruction instead of
    # interpolating the 9 world-corner channels (MeshRenderer recon_points).
    cfg = JointFitConfig(
        recon_points=bool(int(os.environ.get("PROFILE_RECON", "0")))
    )
    fitter = JointShapeTextureFitter(K, (H, W), cfg)
    data = fitter.make_dataset(tgt)
    verts_uvs = sphere_uv_mapping(verts)
    fitter._ensure_bin_capacity(
        src.extend(fitter.config.n_views), data["R"], data["t"])
    topo = build_topology(src)
    tx = fitter._make_optimizer()
    params = fitter.init_params(src, verts_uvs)
    opt_state = jax.jit(tx.init)(params)

    def one_step(params, opt_state, k):
        idx = jax.random.choice(
            k, fitter.config.n_views, (fitter.config.views_per_step,),
            replace=False)
        (loss, metrics), grads = jax.value_and_grad(
            fitter.loss, has_aux=True
        )(params, src, topo, verts_uvs, data, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax_apply(params, updates), opt_state, loss

    import optax

    def optax_apply(params, updates):
        return optax.apply_updates(params, updates)

    return jax.jit(one_step), (params, opt_state, jax.random.PRNGKey(0))


def _points():
    """One binned alpha-compositor point render (scripts/bench_points.py's
    4x20k-point 256^2 K=8 config). PROFILE_GRAD=1 profiles the grad step
    (feature-MSE loss w.r.t. positions); PROFILE_SPHERE=1 profiles the
    per-sphere-radius Pulsar renderer (the 32-50 ms session-spread case)."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.rasterize.points import (
        PointsRasterizationSettings,
        suggest_points_per_bin,
    )
    from torch_renderer_tpu.renderer import AlphaPointRender, PulsarRenderer
    from torch_renderer_tpu.structures.pointclouds import Pointclouds

    B, P, S = 4, 20000, 256
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, P, 3)).astype(np.float32) * 0.8
    feats = rng.uniform(0.0, 1.0, (B, P, 3)).astype(np.float32)
    pcd = Pointclouds(
        points=jnp.asarray(pts), num_points=jnp.full((B,), P, jnp.int32),
        features=jnp.asarray(feats),
    )
    f = 0.8 * S
    K = np.array([[f, 0, S / 2.0], [0, f, S / 2.0], [0, 0, 1.0]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 2.5], np.float32), (B, 1))
    probe = PointsRasterizationSettings(
        image_size=(S, S), radius=0.01, bin_size=16)
    if os.environ.get("PROFILE_SPHERE"):
        sph = PulsarRenderer(K, (S, S), radius=0.01, bin_size=16)
        cam_s = sph.camera_with_pose(R, t)
        pts_cam = cam_s.world_to_camera(pcd.points)
        fmax = jnp.maximum(cam_s.fx, cam_s.fy)[:, None]
        r_ndc = 0.01 * fmax / (
            cam_s.ndc_scale
            * jnp.maximum(pts_cam[..., 2] - 0.01, sph.settings.znear))
        mpb = suggest_points_per_bin(pcd, cam_s, probe, radius=r_ndc)
        r = PulsarRenderer(K, (S, S), radius=0.01, bin_size=16,
                           max_points_per_bin=mpb)
    else:
        r0 = AlphaPointRender(K, (S, S))
        mpb = suggest_points_per_bin(pcd, r0.camera_with_pose(R, t), probe)
        r = AlphaPointRender(K, (S, S), radius=0.01, bin_size=16,
                             max_points_per_bin=mpb)

    def fwd(p):
        pc = dataclasses.replace(pcd, points=p)
        return r.render(pc, R, t)

    if os.environ.get("PROFILE_GRAD"):
        step = jax.jit(jax.grad(lambda p: jnp.sum(fwd(p) ** 2)))
    else:
        step = jax.jit(fwd)
    return step, (pcd.points,)


WORKLOADS = {
    "northstar": _northstar,
    "posefit": _posefit,
    "depth720": _depth720,
    "jointfit": _jointfit,
    "points": _points,
}


def capture(step, args, steps: int, log_dir: str):
    import jax

    out = jax.block_until_ready(step(*args))  # compile + warm
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        out = step(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return out


def report(log_dir: str, steps: int, top: int = 12):
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(os.path.join(log_dir, "plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    j = json.loads(data)

    def t_ps(node):
        m = node.get("metrics", {})
        return m.get("rawTime", 0) or m.get("time", 0)

    for prog in j["byProgramExcludeIdle"].get("children", []):
        total = t_ps(prog) / 1e9 / steps
        print(f"\n== {prog['name']}  total {total:.3f} ms/step")
        for cat in sorted(prog.get("children", []), key=t_ps, reverse=True):
            ct = t_ps(cat) / 1e9 / steps
            if ct < total * 0.005:
                continue
            print(f"  {cat['name']:<28s} {ct:8.3f} ms/step")
            for op in sorted(cat.get("children", []), key=t_ps,
                             reverse=True)[:top]:
                ot = t_ps(op) / 1e9 / steps
                if ot < total * 0.005:
                    continue
                expr = (op.get("xla", {}) or {}).get("expression", "")
                expr = expr.split(" = ", 1)[-1][:110]
                print(f"    {op['name']:<40s} {ot:8.3f}  {expr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=sorted(WORKLOADS), required=True)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir (printed) for manual digging")
    args = ap.parse_args()

    step, step_args = WORKLOADS[args.workload]()
    log_dir = tempfile.mkdtemp(prefix="trt_trace_")
    try:
        capture(step, step_args, args.steps, log_dir)
        report(log_dir, args.steps)
        if args.keep:
            print(f"\ntrace kept at {log_dir}")
    finally:
        if not args.keep:
            shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
