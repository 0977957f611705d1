"""North-star benchmark: batched 256^2 soft-silhouette render+backward FPS/chip.

Protocol (BASELINE.md / BASELINE.json): render a SoftRas-style soft silhouette
of a 1280-face mesh at 256x256, take gradients w.r.t. the vertex positions
(the shape-fitting backward), batch of 8. The reference implements this via
PyTorch3D's CUDA rasterizer + SoftSilhouetteShader
(camera_pose_optimizer.py:131-137); the CPU baseline here is the same math in
vectorized torch on CPU (PyTorch3D CPU kernels are not available in this
image, so the baseline is a best-effort faithful stand-in of the reference
pipeline on CPU). vs_baseline = our FPS per chip / CPU reference FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = 8
IMAGE = 256
LEVEL = 3  # 1280 faces
SIGMA = 1e-4
STEPS = 100  # one ~0.25 s device call per timed pass (30 s call-kill safe)

if "--quick" in sys.argv:  # fast smoke mode (verify skill / CI)
    B, IMAGE, LEVEL, STEPS = 2, 128, 2, 5
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")


def _scene():
    from torch_renderer_tpu.ops.icosphere import icosphere

    verts, faces = icosphere(LEVEL)
    f = 0.8 * IMAGE
    K = np.array(
        [[f, 0, IMAGE / 2.0], [0, f, IMAGE / 2.0], [0, 0, 1.0]], np.float32
    )
    t = np.array([0.0, 0.0, 3.0], np.float32)
    return verts, faces, K, t


def make_scan_step(device_mesh=None):
    """Build the jitted north-star pass: STEPS chained render+backward
    iterations over a batch of B images PER CHIP.

    device_mesh=None: single-device jit on a batch of B.
    device_mesh: a 1-axis ('data',) jax.sharding.Mesh — the batch scales to
    B * n_devices and shard_maps over the data axis (weak scaling: each
    chip runs the identical per-chip computation, so FPS *per chip* stays
    comparable to the single-chip number; the Pallas kernel is opaque to
    GSPMD's auto-partitioner, hence shard_map rather than sharded-inputs
    jit). No collectives: batch items are independent through the loss sum,
    so each shard steps its own verts slice. Exactness vs single-device is
    asserted on the 8-virtual-CPU-device mesh in tests/test_parallel.py.

    Returns (step, args): call jax.block_until_ready(step(*args)).
    """
    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.rasterize.pallas_soft import (
        soft_silhouette_pallas_fd,
        suggest_soft_config,
    )
    from torch_renderer_tpu.structures.meshes import Meshes

    n_chips = 1 if device_mesh is None else device_mesh.size
    Bt = B * n_chips
    verts, faces, K, t = _scene()
    meshes = Meshes.from_single(verts, faces).extend(Bt)
    # intrinsics tiled per item so EVERY camera leaf carries the full batch
    # axis (sharding needs uniform leading dims; broadcast-1 leaves can't
    # split over the data axis)
    cam = PerspectiveCamera.from_K(
        np.tile(K[None], (Bt, 1, 1)), (IMAGE, IMAGE),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (Bt, 3, 3)),
        t=np.tile(t, (Bt, 1)),
    )

    # size the tile bins + active-tile budget for this scene once (static
    # kernel parameters); exactness vs the streaming oracle is covered by
    # tests/test_pallas_soft and tests/test_rank_binning. setup_face_planes
    # (channel planes, no tiny-trailing-dim corner tensors) is bit-exact vs
    # setup_faces through this path (tests/test_rank_binning). The budgets
    # are sized on the PER-CHIP slice so sharded/unsharded kernels match.
    fp0 = setup_face_planes(_batch_slice(meshes, B), _batch_slice(cam, B))
    cfg = suggest_soft_config(fp0, (IMAGE, IMAGE), sigma=SIGMA,
                              layout="packed")

    def loss_fn(v, meshes, cam):
        fp = setup_face_planes(meshes.update_padded(v), cam)
        alpha = soft_silhouette_pallas_fd(
            fp, (IMAGE, IMAGE), sigma=SIGMA, **cfg.kwargs(),
        )
        return jnp.sum(alpha)

    grad_fn = jax.grad(loss_fn)

    # All STEPS timed iterations run as ONE device call (lax.scan with a
    # dependent carry, exactly one render+backward per iteration — the
    # same computation the per-call loop ran). Rationale: through the
    # tunnel each dispatch costs a variable RTT (measured up to ~25 ms on
    # degraded days, vs a 2.4 ms step), so a per-call loop benchmarks the
    # tunnel, not the chip. The carry chains each step on the previous
    # gradient so no iteration can be folded or overlapped away.
    def scan_pass(v, meshes, cam):
        def body(v, _):
            g = grad_fn(v, meshes, cam)
            return v - 1e-6 * g, ()

        v, _ = jax.lax.scan(body, v, None, length=STEPS)
        return v

    if device_mesh is None:
        return jax.jit(scan_pass), (meshes.verts, meshes, cam)

    from jax import shard_map

    from torch_renderer_tpu.parallel.mesh import data_specs

    step = jax.jit(
        shard_map(
            scan_pass,
            mesh=device_mesh,
            in_specs=(data_specs(meshes.verts), data_specs(meshes),
                      data_specs(cam)),
            out_specs=data_specs(meshes.verts),
            # the pallas_call inside doesn't declare varying mesh axes;
            # semantics are unaffected (no collectives in the pass)
            check_vma=False,
        )
    )
    return step, (meshes.verts, meshes, cam)


def _batch_slice(tree, n: int):
    """First-n batch slice of every array leaf (static fields untouched)."""
    import jax

    return jax.tree_util.tree_map(lambda x: x[:n], tree)


def tpu_fps() -> float:
    import jax

    # Persistent compile cache (same dir as the apps): on a degraded-tunnel
    # day the Mosaic/XLA compile alone takes 4-8 minutes; caching it means
    # only the first-ever bench run after a kernel change pays it, and the
    # watchdog retries below actually get to measure.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_app_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Multi-chip: shard the batch axis over every available chip and report
    # per-chip throughput (SURVEY.md §2d's FPS/chip metric). Validated on
    # the 8-virtual-CPU-device mesh (tests/test_parallel.py); engages
    # automatically when the driver attaches hardware with >1 chip.
    n_chips = len(jax.devices())
    if n_chips > 1:
        from torch_renderer_tpu.parallel.mesh import data_mesh

        device_mesh = data_mesh()
    else:
        device_mesh = None

    step, args = make_scan_step(device_mesh)
    jax.block_until_ready(step(*args))  # compile + warm

    # Best-of-N timed passes: the tunnel's per-call cost varies minute to
    # minute (documented 1.6x day-to-day spread); a single pass can record
    # a transient-slow reading for the whole round.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(step(*args))
        best = min(best, time.perf_counter() - t0)
    return B * n_chips * STEPS / best / n_chips


def cpu_reference_fps(use_cache: bool = True) -> float:
    """Torch-CPU soft-silhouette render+backward (reference-pipeline math)."""
    if use_cache and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cpu_fps"]

    import torch

    verts_np, faces_np, K, tvec = _scene()
    verts = torch.tensor(verts_np, requires_grad=True)
    faces = torch.tensor(faces_np, dtype=torch.long)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    s = IMAGE / 2.0

    ys = (torch.arange(IMAGE, dtype=torch.float32) + 0.5 - IMAGE / 2.0) / s
    xs = (torch.arange(IMAGE, dtype=torch.float32) + 0.5 - IMAGE / 2.0) / s
    yy, xx = torch.meshgrid(ys, xs, indexing="ij")
    pix = torch.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # (HW, 2)

    def render_backward_once():
        if verts.grad is not None:
            verts.grad = None
        cam = verts + torch.tensor(tvec)
        z = cam[:, 2].clamp_min(1e-5)
        u = (fx * cam[:, 0] / z + cx - IMAGE / 2.0) / s
        v = (fy * cam[:, 1] / z + cy - IMAGE / 2.0) / s
        pts = torch.stack([u, v], -1)  # (V, 2)
        tri = pts[faces]  # (F, 3, 2)

        S = torch.zeros(pix.shape[0])
        FCH, PCH = 256, 8192
        for f0 in range(0, tri.shape[0], FCH):
            q = tri[f0 : f0 + FCH]  # (Fc, 3, 2)
            e0, e1, e2 = q[:, 0], q[:, 1], q[:, 2]
            area2 = (e1[:, 0] - e0[:, 0]) * (e2[:, 1] - e0[:, 1]) - (
                e1[:, 1] - e0[:, 1]
            ) * (e2[:, 0] - e0[:, 0])
            for p0 in range(0, pix.shape[0], PCH):
                p = pix[p0 : p0 + PCH][:, None, :]  # (P, 1, 2)
                d2 = None
                inside = torch.ones(p.shape[0], q.shape[0], dtype=torch.bool)
                for a_i, b_i in ((0, 1), (1, 2), (2, 0)):
                    qa = q[None, :, a_i]
                    g = q[None, :, b_i] - qa
                    w = p - qa
                    cross = g[..., 0] * w[..., 1] - g[..., 1] * w[..., 0]
                    inside = inside & ((cross * area2[None, :].sign()) >= 0)
                    len2 = (g * g).sum(-1).clamp_min(1e-12)
                    tt = ((w * g).sum(-1) / len2).clamp(0.0, 1.0)
                    dd = (w * w).sum(-1) - 2 * tt * (w * g).sum(-1) + tt * tt * len2
                    d2 = dd if d2 is None else torch.minimum(d2, dd)
                signed = torch.where(inside, -d2.clamp_min(0), d2.clamp_min(0))
                S[p0 : p0 + PCH] += torch.nn.functional.softplus(
                    -signed / SIGMA
                ).sum(-1)
        alpha = 1.0 - torch.exp(-S)
        alpha.sum().backward()

    # One timed pass (the pipeline is deterministic; the measurement is
    # cached in-repo so the driver's bench run never pays this cost again).
    t0 = time.perf_counter()
    render_backward_once()
    dt = time.perf_counter() - t0
    fps = 1.0 / dt  # one image per pass (B amortizes linearly on CPU)
    if use_cache:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_fps": fps, "seconds_per_image": dt}, f)
    return fps


def main():
    quick = "--quick" in sys.argv
    # The tunneled TPU runtime intermittently fails transiently (HTTP 500
    # from the compile helper, UNAVAILABLE device errors, hangs that clear
    # on retry — see CLAUDE.md). Retry so one flake doesn't record a bogus
    # benchmark for the round.
    # The tunnel's other failure mode is a silent HANG (device calls block
    # forever inside a C call, so in-process watchdogs never fire) — run
    # the measurement in a subprocess with a hard timeout and retry.
    import subprocess

    def _sub_once(flag: str, timeout_s: float) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag]
            + (["--quick"] if quick else []),
            capture_output=True, text=True, timeout=timeout_s,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"{flag} subprocess rc={proc.returncode}: "
                f"{proc.stderr[-500:]}"
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # Phase 1 — COMPILE, decoupled from measurement: a warm-only
    # subprocess compiles the pass into the persistent cache (own generous
    # watchdog; a degraded-tunnel compile measured 4-8 minutes on
    # 2026-08-19). Once it lands, every measurement attempt below is
    # measurement-only under a tight window, so a slow compile can never
    # eat a measurement attempt. Warm failures are non-fatal: the combined
    # measure path below still compiles on demand.
    for warm_try in range(2):
        try:
            _sub_once("--_warm", 600 if quick else 900)
            break
        except Exception as e:  # noqa: BLE001 - infra flakiness
            print(f"bench warm attempt {warm_try + 1} failed: {e}",
                  file=sys.stderr)
            time.sleep(10)

    # Phase 2 — MEASURE (tight watchdog, retried).
    last_err = None
    waits = (10, 30, 60) if not quick else (10, 10)
    for attempt, wait in enumerate(waits + (0,)):
        try:
            meas = _sub_once("--_measure", 240 if quick else 420)
            fps = meas["fps_per_chip"]
            break
        except Exception as e:  # noqa: BLE001 - infra flakiness, retried
            last_err = e
            print(f"bench attempt {attempt + 1} failed: {e}", file=sys.stderr)
            if wait:
                time.sleep(wait)
    else:
        raise last_err
    try:
        cpu = cpu_reference_fps(use_cache=not quick)
        vs = fps / cpu if cpu > 0 else float("nan")
    except Exception:
        cpu, vs = None, float("nan")
    print(
        json.dumps(
            {
                "metric": "softsil_256_render_backward_fps_per_chip",
                "value": round(fps, 2),
                "unit": "images/s",
                "vs_baseline": round(vs, 2) if vs == vs else None,
                "n_chips": meas.get("n_chips", 1),
            }
        )
    )


def tpu_warm() -> None:
    """Compile-only phase: build the pass into the persistent cache and run
    it once (the first real execution also warms device state)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_app_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n_chips = len(jax.devices())
    device_mesh = None
    if n_chips > 1:
        from jax.sharding import Mesh

        device_mesh = Mesh(np.array(jax.devices()), ("data",))
    step, args = make_scan_step(device_mesh)
    jax.block_until_ready(step(*args))


if __name__ == "__main__":
    if "--_warm" in sys.argv:  # watchdog subprocess: compile-only phase
        tpu_warm()
        print(json.dumps({"warmed": True}))
    elif "--_measure" in sys.argv:  # watchdog subprocess: one raw measurement
        import jax as _jax

        print(json.dumps(
            {"fps_per_chip": tpu_fps(), "n_chips": len(_jax.devices())}
        ))
    else:
        main()
