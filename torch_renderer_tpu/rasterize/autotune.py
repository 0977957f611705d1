"""Automatic rasterization-settings resolution (pytorch3d default parity).

pytorch3d's contract for ``RasterizationSettings.bin_size`` (consumed by the
reference at torch_renderer.py:90-95 and deform_mesh_with_color.py:149-159)
is: ``None`` = *auto* — the CUDA rasterizer picks a bin size and budget
heuristically and runs coarse-to-fine; ``0`` = force the naive dense path.
Through round 4 this package inverted that default (None meant dense), so a
user porting reference code with no flags silently ran the O(pixels x items)
dense selection — 14x slower at the 4x20k-point bench, similar on large
meshes. This module restores the pytorch3d contract:

  * ``bin_size=None``  -> AUTO: tile size from the image, budgets
    (max_faces_per_bin / max_points_per_bin, active_tiles) measured from the
    CONCRETE scene via the suggest_* machinery with head-room, impl='auto'
    (the fused Pallas kernels on TPU). Resolved once per
    (shapes, settings) key and cached — re-tracing under jit with the same
    shapes reuses the measured budgets.
  * ``bin_size=0``     -> dense selection (pytorch3d's explicit-naive).
  * ``bin_size=k > 0`` -> explicit binned settings, untouched.

Auto-sized budgets are measured at the FIRST concrete call and reused while
shapes match, with a 1.5x margin for footprints that move during a fit;
because reuse is heuristic, auto mode defaults ``check_budgets`` to "warn"
(pytorch3d's CUDA binner warns on bin overflow unconditionally) — pass
``check_budgets="off"`` to silence it for benchmarking.

Auto resolution needs concrete geometry to count bin occupancy. Under jit
(tracers) with no cached resolution for the shape key, it falls back to the
dense path and warns once: call the renderer once outside jit (any eager
render/`prepare` with the real shapes — the opt fitters do this at setup),
or pass an explicit ``bin_size``.
"""

from __future__ import annotations

import dataclasses
import math
import warnings

import jax
import jax.numpy as jnp

# The measured sweet spot across the repo's TPU benchmarks (and the largest
# tile the fused Pallas top-K kernel supports: tile=32 programs crash the
# Mosaic compiler — see RasterizationSettings.impl).
AUTO_TILE = 16
# Images smaller than this run dense: a 16-pixel tile grid over a sub-32px
# image is all boundary tiles and the binning machinery costs more than the
# tiny dense contraction it replaces.
MIN_BINNED_IMAGE = 32
# Meshes/clouds at or below this size stay dense under auto: the dense
# selection einsum is already tiny and avoids the binning fixed costs.
MIN_BINNED_FACES = 256
MIN_BINNED_POINTS = 1024
# Head-room multiplier on measured budgets: bins/tiles beyond a static
# budget silently drop work, and footprints move during fits (the pose apps
# size explicitly with 2.0 when the motion is large).
AUTO_MARGIN = 1.5

_CACHE: dict = {}
_WARNED: set = set()


def clear_cache() -> None:
    """Drop every cached auto resolution (tests / long-lived processes
    whose scene statistics change shape-compatibly)."""
    _CACHE.clear()
    _WARNED.clear()


def is_concrete(*trees) -> bool:
    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.core.Tracer):
                return False
    return True


def _settings_key(settings) -> tuple:
    return (type(settings).__name__,) + dataclasses.astuple(settings)


def _auto_guard(settings):
    """Auto-resolved budgets are reused across calls on matching shapes, so
    they are heuristic, not proven — default the runtime overflow guard on
    ("warn") when NOTHING else asked for a mode. An explicit per-settings
    value wins, then the process-wide set_budget_check_default (the apps'
    --check-budgets flag — baking 'warn' over it silently disabled the
    documented 'off' benching opt-out and the 'checkify' escalation for
    every bin_size=None path)."""
    if settings.check_budgets is not None:
        return settings.check_budgets
    from .binning import _BUDGET_CHECK_DEFAULT

    return "warn" if _BUDGET_CHECK_DEFAULT[0] is None \
        else _BUDGET_CHECK_DEFAULT[0]


def _dense(settings):
    if getattr(settings, "impl", None) == "pallas":
        # auto routed this scene dense (too small to bin, or a traced
        # call with no cached resolution): the fused Pallas kernels only
        # run binned, so an explicit impl='pallas' cannot be honored —
        # say so and downgrade instead of silently ignoring it (points)
        # or raising about a bin_size the user never set (mesh).
        warnings.warn(
            "impl='pallas' with bin_size=None: auto resolution chose the "
            "DENSE path for this scene (below the binning thresholds, or "
            "a traced call before any concrete resolution) — the Pallas "
            "binned kernel does not apply; rendering dense XLA. Pass an "
            "explicit bin_size to force binning.", RuntimeWarning,
        )
        return dataclasses.replace(settings, bin_size=0, impl="auto")
    return dataclasses.replace(settings, bin_size=0)


def _warn_tracer_fallback(key, kind: str) -> None:
    if key in _WARNED:
        return
    _WARNED.add(key)
    warnings.warn(
        f"auto bin sizing for this {kind} shape was requested under jit "
        "(traced inputs) before any concrete call measured the scene — "
        "falling back to DENSE selection, which is O(pixels x "
        f"{'faces' if kind == 'mesh' else 'points'}). Call the renderer "
        "once outside jit with the real inputs (or pass an explicit "
        "bin_size) to enable the coarse-to-fine fast path.",
        stacklevel=3,
    )


def resolve_mesh_settings(settings, meshes=None, camera=None, fd=None,
                          grow=False, margin=None):
    """Resolve ``RasterizationSettings.bin_size=None`` (auto) into explicit
    binned (or dense) settings for this scene. Explicit settings
    (bin_size=0 dense / k>0 binned) pass through untouched.

    Provide either (meshes, camera) or a pre-projected fd
    (FaceRasterData / FacePlanes). Cached per (batch, faces, settings).
    grow=True re-measures concrete inputs against a cached resolution and
    max-merges the budgets; margin overrides AUTO_MARGIN (pose fitters
    size their moving footprints at 2x — the pose apps' documented
    protocol)."""
    if settings.bin_size is not None:
        return settings
    H, W = settings.image_size
    if fd is not None:
        B, F = fd.valid.shape
    else:
        B, F = meshes.faces.shape[:2]
    if min(H, W) < MIN_BINNED_IMAGE or F <= MIN_BINNED_FACES:
        return _dense(settings)
    key = ("mesh", B, F, _settings_key(settings))
    hit = _CACHE.get(key)
    if hit is not None and not grow:
        return hit

    concrete = is_concrete(fd) if fd is not None else is_concrete(meshes, camera)
    if not concrete:
        if hit is not None:
            return hit
        _warn_tracer_fallback(key, "mesh")
        return _dense(settings)

    from .binning import count_overflow, suggest_active_tiles_fd, tile_grid

    if fd is None:
        from .geometry import setup_face_planes

        fd = setup_face_planes(meshes, camera, znear=settings.znear)
    tile = AUTO_TILE
    m = AUTO_MARGIN if margin is None else margin
    pad = math.sqrt(settings.blur_radius) if settings.blur_radius > 0 else 0.0
    mx, _ = count_overflow(fd, (H, W), tile, 0, pad)
    mfb = int(min(F, max(32, math.ceil(float(mx) * m / 32) * 32)))
    act = suggest_active_tiles_fd(fd, (H, W), tile, pad, margin=m)
    TH, TW, _ = tile_grid((H, W), tile)
    if hit is not None:
        # grow: budgets only ever expand (see resolve_points_settings)
        mfb = max(mfb, hit.max_faces_per_bin)
        act = TH * TW if hit.active_tiles is None else max(
            act, hit.active_tiles)
    resolved = dataclasses.replace(
        settings,
        bin_size=tile,
        max_faces_per_bin=mfb,
        active_tiles=None if act >= TH * TW else act,
        check_budgets=_auto_guard(settings),
    )
    _CACHE[key] = resolved
    return resolved


def resolve_points_settings(settings, pcls=None, camera=None, radius=None,
                            q=None, z=None, valid=None, radius_arr=None,
                            grow=False):
    """Resolve ``PointsRasterizationSettings.bin_size=None`` (auto) for this
    cloud. Explicit settings (0 dense / k>0 binned) pass through.

    Provide (pcls, camera [, radius]) — or pre-projected (q, z, valid,
    radius_arr) raster-space data. Cached per (batch, points, settings)."""
    if settings.bin_size is not None:
        return settings
    H, W = settings.image_size
    if q is not None:
        B, N = z.shape
    else:
        B, N = pcls.points.shape[:2]
    if min(H, W) < MIN_BINNED_IMAGE or N <= MIN_BINNED_POINTS:
        return _dense(settings)
    key = ("points", B, N, _settings_key(settings))
    hit = _CACHE.get(key)
    if hit is not None and not grow:
        return hit

    concrete = (is_concrete(q, z, valid, radius_arr) if q is not None
                else is_concrete(pcls, camera, radius))
    if hit is not None and not concrete:
        return hit
    if not concrete:
        _warn_tracer_fallback(key, "points")
        return _dense(settings)

    from .binning import (
        count_bbox_active_tiles,
        count_bbox_overflow,
        tile_grid,
    )

    if q is None:
        from .points import project_points_screen

        q, z, valid = project_points_screen(pcls, camera, settings.znear)
        r = settings.radius if radius is None else radius
        radius_arr = jnp.broadcast_to(
            jnp.asarray(r, jnp.float32), (B, N)
        )
    elif radius_arr is None:
        radius_arr = jnp.full((B, N), settings.radius, jnp.float32)
    tile = AUTO_TILE
    lo = q - radius_arr[..., None]
    hi = q + radius_arr[..., None]
    mx = count_bbox_overflow(lo, hi, valid, (H, W), tile)
    ppb = int(min(N, max(32, math.ceil(float(mx) * AUTO_MARGIN / 32) * 32)))
    na = int(count_bbox_active_tiles(lo, hi, valid, (H, W), tile))
    TH, TW, _ = tile_grid((H, W), tile)
    T = TH * TW
    act = max(8, min(int(math.ceil(na * AUTO_MARGIN / 8) * 8), T))
    if hit is not None:
        # grow=True re-measure: budgets only ever GROW (shrinking would
        # invalidate callers already traced against the cached settings;
        # growing is always safe — drops strictly decrease). Used by the
        # sharded render path to size from EVERY shard's slice, not just
        # the first one resolved.
        ppb = max(ppb, hit.max_points_per_bin)
        act = T if hit.active_tiles is None else max(act, hit.active_tiles)
    resolved = dataclasses.replace(
        settings,
        bin_size=tile,
        max_points_per_bin=ppb,
        active_tiles=None if act >= T else act,
        check_budgets=_auto_guard(settings),
    )
    _CACHE[key] = resolved
    return resolved
