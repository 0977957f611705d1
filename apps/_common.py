"""Shared helpers for the CLI apps (reference L5 entry points, SURVEY.md §1).

Every app accepts --cpu (force the CPU backend — the axon TPU plugin ignores
the JAX_PLATFORMS env var, so this must happen via jax.config) and loads its
scene either from an --obj path or a generated icosphere.
"""

from __future__ import annotations

import argparse

import numpy as np


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cpu", action="store_true", help="run on CPU backend")
    p.add_argument("--obj", type=str, default=None, help="input OBJ mesh path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--check-budgets", nargs="?", const="warn", default="warn",
        choices=["warn", "checkify", "off"],
        help="runtime guard for every silent-drop budget (face/point bins, "
             "active tiles, group lanes): 'warn' (default) warns on the "
             "host whenever a true candidate count exceeds its configured "
             "budget; 'off' disables the guards (benching)",
    )
    return p


def setup_platform(args) -> None:
    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    mode = getattr(args, "check_budgets", None)
    if mode:
        # process-wide default ('warn' unless --check-budgets off), set
        # BEFORE any trace (the binned paths read it at trace time);
        # per-settings check_budgets values still win
        from torch_renderer_tpu.rasterize.binning import (
            set_budget_check_default,
        )

        set_budget_check_default(mode)
    # Persistent compilation cache: repeat app runs with unchanged shapes
    # skip the (multi-minute on the tunneled TPU) XLA/Mosaic compiles.
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_app_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_scene_mesh(args, level: int = 3, normalize: bool = True):
    """Meshes (B=1) from --obj or a generated icosphere."""
    from torch_renderer_tpu.structures.meshes import Meshes

    if args.obj:
        from torch_renderer_tpu.io.obj import load_objs_as_meshes

        meshes = load_objs_as_meshes([args.obj])
    else:
        from torch_renderer_tpu.ops.icosphere import icosphere

        verts, faces = icosphere(level)
        meshes = Meshes.from_single(verts, faces)
    if normalize:
        meshes, _, _ = meshes.center_and_scale_to_unit_sphere()
    return meshes


def pinhole_K(image_size, focal_scale: float = 0.9) -> np.ndarray:
    H, W = image_size
    f = focal_scale * min(H, W)
    return np.array(
        [[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32
    )
