"""CLI app smoke tests: every workload entry point must run end to end.

The reference's entry points are plain scripts (SURVEY.md L5); ours are the
12 CLI apps in apps/. These tests run a representative subset as real
subprocesses (fresh interpreter, --cpu, tiny settings) so argument plumbing,
platform setup and end-of-run reporting stay exercised — several historical
breakages (batched K handling, fixture ingestion, auto-sizing) were only
visible at the CLI layer. The heavier apps (batch bench, joint fit, datagen)
are covered by their library-level tests; running everything here would
double the suite's wall-clock for little extra signal.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(app, *args, timeout=420):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "apps", app), "--cpu", *args],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT,
        env={**os.environ, "JAX_TRACEBACK_FILTERING": "off"},
    )
    assert proc.returncode == 0, (
        f"{app} failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


def test_quick_render_smoke(tmp_path):
    out = _run(
        "quick_render.py", "--image-size", "64",
        "--out-dir", str(tmp_path),
    )
    assert "saved" in out.lower() or "render" in out.lower()


def test_camera_pose_optimizer_smoke():
    out = _run(
        "camera_pose_optimizer.py", "--iters", "10", "--image-size", "48",
    )
    assert "translation error" in out


def test_quick_render_check_budgets_flag(tmp_path):
    """--check-budgets wires the process-default budget guard through
    _common.setup_platform before the first trace (no overflow on this
    tiny scene — the run must stay clean and succeed)."""
    out = _run(
        "quick_render.py", "--image-size", "64", "--check-budgets",
        "--out-dir", str(tmp_path),
    )
    assert "saved" in out.lower() or "render" in out.lower()


def test_coco_generator_distractors_and_textures(tmp_path):
    """coco_data_generator.py end to end with the round-4 flags:
    distractors from a second library + texture-dir materials."""
    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not available")
    tex_dir = tmp_path / "tex"
    tex_dir.mkdir()
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = 200
    Image.fromarray(img).save(tex_dir / "t.png")
    # a tiny tetrahedron OBJ as the distractor model
    dobj = tmp_path / "distractor.obj"
    dobj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n"
    )
    out = _run(
        "coco_data_generator.py", "--scenes", "1", "--views-per-scene", "2",
        "--height", "48", "--width", "64", "--min-objects", "1",
        "--max-objects", "2", "--distractors", "1,1",
        "--distractor-objs", str(dobj),
        "--material-mode", "texture", "--texture-dir", str(tex_dir),
        "--out-dir", str(tmp_path / "out"),
    )
    assert "annotations" in out
    import json

    with open(tmp_path / "out" / "annotations.json") as f:
        coco = json.load(f)
    assert all(c["id"] in (1, 2, 3) for c in coco["categories"])


def test_render_compare_smoke():
    out = _run("render_compare.py", "--image-size", "48")
    assert "cross-renderer gate" in out
    # the self-check scene must agree with the independent oracle
    worst = float(out.rsplit("worst interior |diff|", 1)[1].split()[0])
    assert worst < 2e-3


def test_icp_registration_smoke():
    out = _run("icp_registration.py", "--objects", "4", "--points", "64",
               "--icp-iters", "8")
    assert "err" in out.lower() or "converged" in out.lower()


def test_pose_search_iteration_plots(tmp_path):
    """--plot-dir writes one hypothesis scatter + GMM ellipse PNG per EM
    iteration (the reference saves the same diagnostic to PUResults/ every
    iteration, pytorch3d_icp_evaluation.py:244-279)."""
    plot_dir = tmp_path / "em_plots"
    out = _run(
        "pose_search.py", "--points", "64", "--hypotheses", "32",
        "--elite", "8", "--iters", "3", "--plot-dir", str(plot_dir),
    )
    assert "wrote 3 EM-iteration plots" in out, out
    files = sorted(p.name for p in plot_dir.glob("em_iter_*.png"))
    assert files == ["em_iter_00.png", "em_iter_01.png", "em_iter_02.png"]
    assert all((plot_dir / f).stat().st_size > 1000 for f in files)


def test_batch_render_bench_sharded_smoke():
    """batch_render_bench with the view axis sharded over the 8-virtual-CPU
    mesh (conftest's XLA_FLAGS propagate to the subprocess env): the
    shard_map path must engage, render, and report per-chip throughput."""
    out = _run(
        "batch_render_bench.py", "--n-views", "8", "--view-chunk", "8",
        "--height", "64", "--width", "80", "--reps", "2",
        "--raster-impl", "xla", "--bin-size", "16",
    )
    assert "view axis sharded over 8 chips" in out, out
    assert "/chip over 8 chips" in out, out
    assert "coverage" in out
