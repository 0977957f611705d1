"""Coarse-to-fine tile binning for rasterization.

The TPU equivalent of pytorch3d's CUDA coarse-to-fine binning (bin_size /
max_faces_per_bin in RasterizationSettings, reference
camera_pose_optimizer.py:112-115 comments): the image is cut into square
pixel tiles; each tile gets a fixed-size list of candidate faces whose
(blur-expanded) screen bbox intersects it. The fine stage then evaluates only
(tile_pixels x faces_per_tile) pairs instead of (pixels x all_faces) —
typically a 10-30x work reduction — while every shape stays static:

  overlap:   (B, T, F) bool via broadcast bbox tests
  face list: (B, T, Fmax) int32 via top_k over overlap scores (ascending ids)
  gather:    face raster data re-laid-out per tile, (B, T, Fmax, ...)

Overflowing tiles (> Fmax candidates) drop the highest-index faces; pick
faces_per_tile with headroom (count_overflow() reports the true max).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import FaceRasterData

# ---------------------------------------------------------------------------
# Opt-in runtime budget guards
# ---------------------------------------------------------------------------
#
# Every fixed-size budget in this module (faces/points per bin, active
# tiles, packed group lanes) silently DROPS overflowing work — the price of
# static shapes. The suggest_* helpers size budgets outside jit, but moving
# footprints can outgrow them mid-fit (a real incident: tile=32 with
# faces_per_tile=128 overflowed on the bench scene and rendered alpha wrong
# by 0.85 with no signal). check_budget() is the opt-in runtime guard: the
# binned paths call it with the TRUE candidate counts they already compute,
# and it either warns on the host (mode="warn", jax.debug.callback — works
# under jit/scan on CPU/GPU/TPU-pjrt; the axon backend rejects host
# callbacks, so warn mode degrades to a one-time trace-time notice there)
# or emits a checkify check
# (mode="checkify"; the caller must be wrapped with
# utils.debug.checked_budgets, otherwise JAX fails at trace time with a
# "not functionalized" error). pytorch3d's CUDA binner warns on bin
# overflow the same way (reference camera_pose_optimizer.py:112-115
# settings comments size bins against that warning).

_BUDGET_CHECK_DEFAULT = [None]


def set_budget_check_default(mode) -> None:
    """Process-wide default for the binned paths' check_budgets settings
    (None | 'off' | 'warn' | 'checkify'); an explicit per-settings value
    wins. Set BEFORE the first traced call — the default is read at trace
    time, so flipping it later does not affect already-compiled functions
    (apps' --check-budgets flag sets it at startup). 'off' forces the
    guards off (auto-resolved settings default them to 'warn' —
    rasterize.autotune)."""
    if mode not in (None, "off", "warn", "checkify"):
        raise ValueError(f"unknown budget check mode {mode!r}")
    _BUDGET_CHECK_DEFAULT[0] = mode


def resolve_budget_check(mode):
    mode = _BUDGET_CHECK_DEFAULT[0] if mode is None else mode
    return None if mode == "off" else mode


def _axon_backend() -> bool:
    """True when the default backend is the axon TPU plugin (which rejects
    host send/recv callbacks at run time). The plugin registers platform
    'tpu', so sniff the PJRT platform_version string instead."""
    try:
        client = jax.devices()[0].client
        return "axon" in getattr(client, "platform_version", "")
    except Exception:
        return False


def check_budget(name: str, actual: jax.Array, budget: int, mode,
                 hint: str = "") -> None:
    """Emit a runtime overflow guard: `actual` (traced int scalar — the true
    max candidate count) must be <= `budget` (static). mode None = no-op."""
    mode = resolve_budget_check(mode)
    if mode is None:
        return
    msg = (f"{name} overflow: max count {{a}} > budget {budget} — "
           f"overflowing work is silently dropped. {hint}").rstrip()
    if mode == "checkify":
        from jax.experimental import checkify

        checkify.check(actual <= budget, msg, a=actual)
    elif mode == "warn":
        if _axon_backend():
            # axon_pjrt rejects host send/recv callbacks at RUN time
            # (UNIMPLEMENTED), so an in-jit debug.callback would crash the
            # very call it guards. Downgrade to a one-time trace-time
            # notice; checkify mode (pure dataflow) still works there.
            import warnings

            warnings.warn(
                f"{name}: check_budgets='warn' needs host callbacks, which "
                "the axon TPU backend does not support — runtime overflow "
                "warnings are disabled for this trace. Use "
                "check_budgets='checkify' (utils.debug.checked_budgets) "
                "for guarded runs, or size budgets via suggest_* / "
                "renderer.prepare.", RuntimeWarning, stacklevel=2,
            )
            return

        def _cb(a):
            if int(a) > budget:
                import warnings

                warnings.warn(
                    msg.format(a=int(a)), RuntimeWarning, stacklevel=2
                )

        jax.debug.callback(_cb, actual)
    else:
        raise ValueError(f"unknown budget check mode {mode!r}")


# Non-overlap sentinel for rank slots. Must never collide with a live
# slot index for ANY n_slots a gather might use: the sublane soft layout
# rounds per-tile slots up to a granule (and callers may size per_tile
# above F), so F + 1 WAS a live slot there — excluded faces then summed
# into a phantom candidate (alpha 0.84 where the lane layout renders 0).
_NO_SLOT = np.int32(2**31 - 1)


class TileBins(NamedTuple):
    face_idx: jax.Array   # (B, T, Fmax) int32 candidate face ids (0-padded)
    face_mask: jax.Array  # (B, T, Fmax) bool valid slot
    tile_origin: jax.Array  # (T, 2) raster coords of each tile's pixel (0,0)
    n_tiles_hw: Tuple[int, int]


def tile_grid(image_size, tile: int):
    """Static tile decomposition. Returns (TH, TW, tile_origin_raster (T,2))."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH = -(-H // tile)
    TW = -(-W // tile)
    ty = (jnp.arange(TH, dtype=jnp.float32) * tile + 0.5 - H / 2.0) / s
    tx = (jnp.arange(TW, dtype=jnp.float32) * tile + 0.5 - W / 2.0) / s
    yy, xx = jnp.meshgrid(ty, tx, indexing="ij")
    origin = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (T, 2)
    return TH, TW, origin


def bin_bboxes(
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    valid: jax.Array,
    image_size,
    tile: int,
    per_tile: int,
    item_chunk: int = 8192,
) -> TileBins:
    """Assign screen-space bboxes to pixel tiles (the generic binning core).

    bbox_min/bbox_max: (B, N, 2) raster-unit extents; valid: (B, N) bool.
    Collections larger than item_chunk are binned by a scan that merges
    per-chunk top-k candidate lists (a single top_k over a (B, T, 100k)
    score tensor crashes the TPU compiler).
    """
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    T = TH * TW
    tile_extent = tile / s  # raster-units size of a tile

    N = valid.shape[-1]
    Nmax = min(per_tile, N)
    t_lo = origin[None, :, None, :]            # (1, T, 1, 2)
    t_hi = t_lo + tile_extent

    def chunk_scores(lo_c, hi_c, valid_c, id_c):
        """Candidate scores for one chunk: higher = keep, 0 = no overlap."""
        lo_ok = lo_c[:, None, :, :] <= t_hi    # (B, T, Nc, 2)
        hi_ok = hi_c[:, None, :, :] >= t_lo
        overlap = jnp.all(lo_ok & hi_ok, axis=-1) & valid_c[:, None, :]
        # prefer low item ids deterministically
        return jnp.where(overlap, (N - id_c)[None, None, :], 0)

    ids = jnp.arange(N, dtype=jnp.int32)
    if N <= item_chunk:
        score = chunk_scores(bbox_min, bbox_max, valid, ids)
        vals, idx = jax.lax.top_k(score, Nmax)  # (B, T, Nmax)
    else:
        n_chunks = -(-N // item_chunk)
        padn = n_chunks * item_chunk - N
        B = valid.shape[0]
        lo_p = jnp.pad(bbox_min, ((0, 0), (0, padn), (0, 0)))
        hi_p = jnp.pad(bbox_max, ((0, 0), (0, padn), (0, 0)))
        v_p = jnp.pad(valid, ((0, 0), (0, padn)))
        id_p = jnp.pad(ids, (0, padn), constant_values=N)  # pad scores to <=0
        lo_c = jnp.swapaxes(lo_p.reshape(B, n_chunks, item_chunk, 2), 0, 1)
        hi_c = jnp.swapaxes(hi_p.reshape(B, n_chunks, item_chunk, 2), 0, 1)
        v_c = jnp.swapaxes(v_p.reshape(B, n_chunks, item_chunk), 0, 1)
        id_c = id_p.reshape(n_chunks, item_chunk)

        def body(carry, chunk):
            best_vals, best_idx = carry
            loc, hic, vc, ic = chunk
            sc = chunk_scores(loc, hic, vc, ic)
            cv, ci = jax.lax.top_k(sc, min(Nmax, item_chunk))
            cand_idx = ic[ci]  # global ids via chunk-local lookup
            vals = jnp.concatenate([best_vals, cv], axis=-1)
            idxs = jnp.concatenate([best_idx, cand_idx], axis=-1)
            mv, mi = jax.lax.top_k(vals, Nmax)
            merged_idx = jnp.take_along_axis(idxs, mi, axis=-1)
            return (mv, merged_idx), None

        init = (
            jnp.zeros((B, T, Nmax), jnp.int32),
            jnp.zeros((B, T, Nmax), jnp.int32),
        )
        (vals, idx), _ = jax.lax.scan(body, init, (lo_c, hi_c, v_c, id_c))

    return TileBins(
        face_idx=jnp.where(vals > 0, idx, 0).astype(jnp.int32),
        face_mask=vals > 0,
        tile_origin=origin,
        n_tiles_hw=(TH, TW),
    )



def _bbox_min_max(fd, pad_radius):
    """Blur-expanded screen bboxes (B, F, 2) from FaceRasterData OR
    geometry.FacePlanes (duck-typed on .q)."""
    if hasattr(fd, "q"):
        return (jnp.min(fd.q, axis=2) - pad_radius,
                jnp.max(fd.q, axis=2) + pad_radius)
    fminx = jnp.minimum(jnp.minimum(fd.x0, fd.x1), fd.x2) - pad_radius
    fmaxx = jnp.maximum(jnp.maximum(fd.x0, fd.x1), fd.x2) + pad_radius
    fminy = jnp.minimum(jnp.minimum(fd.y0, fd.y1), fd.y2) - pad_radius
    fmaxy = jnp.maximum(jnp.maximum(fd.y0, fd.y1), fd.y2) + pad_radius
    return jnp.stack([fminx, fminy], -1), jnp.stack([fmaxx, fmaxy], -1)


def _channel_sources(fd, znear: float = 1e-5):
    """Per-face scalar channel planes from FaceRasterData OR FacePlanes."""
    if hasattr(fd, "q"):
        return {
            "qx0": fd.q[:, :, 0, 0], "qx1": fd.q[:, :, 1, 0],
            "qx2": fd.q[:, :, 2, 0],
            "qy0": fd.q[:, :, 0, 1], "qy1": fd.q[:, :, 1, 1],
            "qy2": fd.q[:, :, 2, 1],
            "z0": fd.z[:, :, 0], "z1": fd.z[:, :, 1], "z2": fd.z[:, :, 2],
            "invz0": fd.invz[:, :, 0], "invz1": fd.invz[:, :, 1],
            "invz2": fd.invz[:, :, 2],
        }
    inv = lambda z: 1.0 / jnp.clip(z, znear, None)
    return {
        "qx0": fd.x0, "qx1": fd.x1, "qx2": fd.x2,
        "qy0": fd.y0, "qy1": fd.y1, "qy2": fd.y2,
        "z0": fd.z0, "z1": fd.z1, "z2": fd.z2,
        "invz0": inv(fd.z0), "invz1": inv(fd.z1), "invz2": inv(fd.z2),
    }


def bin_faces(
    fd: FaceRasterData,
    image_size,
    tile: int,
    faces_per_tile: int,
    pad_radius: float,
    face_chunk: int = 8192,
) -> TileBins:
    """Assign faces to pixel tiles by blur-expanded screen bbox overlap.

    pad_radius: extra margin in raster (NDC) units — sqrt(blur_radius) for
    soft rasterization, 0 for hard.
    """
    fmin, fmax = _bbox_min_max(fd, pad_radius)
    return bin_bboxes(
        fmin, fmax, fd.valid, image_size, tile, faces_per_tile,
        item_chunk=face_chunk,
    )


def count_overflow(fd: FaceRasterData, image_size, tile, faces_per_tile, pad_radius):
    """Max candidate count over tiles and how many tiles overflow (debugging/
    autotuning helper; same overlap math as bin_faces)."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    fmin, fmax = _bbox_min_max(fd, pad_radius)
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    overlap = jnp.all(
        (fmin[:, None, :, :] <= t_hi) & (fmax[:, None, :, :] >= t_lo), axis=-1
    ) & fd.valid[:, None, :]
    counts = jnp.sum(overlap, axis=-1)  # (B, T)
    return jnp.max(counts), jnp.sum(counts > faces_per_tile)


def gather_bin_channels(planes: jax.Array, bins: TileBins,
                        onehot_max_items: int = 8192) -> jax.Array:
    """Per-tile re-layout of per-item channels: (B, N, C) -> (B, T, Nmax, C).

    TPU layout notes:
      * gathering arrays with tiny trailing dims (e.g. (3, 2) corners)
        makes XLA tile-pad them up to ~40x their logical size at big tile
        counts — hence scalar channels;
      * TPU dynamic gathers run nearly scalar (~90 ns/element), so for
        modest item counts the C-channel gather is ONE one-hot matmul on
        the MXU instead (chunked over tiles); for huge collections the
        one-hot is accumulated over item chunks of onehot_max_items lanes.
    """
    B, T, Fmax = bins.face_idx.shape
    F = planes.shape[1]
    C = planes.shape[2]

    # NB: a fused Pallas gather (pallas_gather.gather_tiles) was built and
    # measured SLOWER than this XLA path at the north-star scale (3.3 vs
    # 2.0 ms fwd): the cost is the one-hot CONSTRUCTION on the VPU, not
    # the HBM staging, and Mosaic's f32 dot pipeline loses to the fused
    # einsum. Kept (tested) for shapes where it might win; not dispatched.
    if F <= onehot_max_items:
        # chunk tiles so the one-hot stays a bounded VMEM/HBM guest
        t_chunk = max(1, min(T, 1 + 16_000_000 // (Fmax * F)))
        n_chunks = -(-T // t_chunk)
        padt = n_chunks * t_chunk - T
        idx = jnp.pad(bins.face_idx, ((0, 0), (0, padt), (0, 0)))
        idx = idx.reshape(B, n_chunks, t_chunk, Fmax)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_chunk, Fmax, F), 3)

        @jax.checkpoint  # recompute the one-hot in backward, never store it
        def chunk_gather(idx_c):  # (B, t_chunk, Fmax) -> (B, t_chunk, Fmax, C)
            onehot = (idx_c[..., None] == iota).astype(planes.dtype)
            return jnp.einsum(
                "btkf,bfc->btkc", onehot, planes,
                precision=jax.lax.Precision.HIGHEST,
            )

        gathered = jax.lax.map(
            chunk_gather, jnp.swapaxes(idx, 0, 1)
        )  # (n_chunks, B, t_chunk, Fmax, C)
        gathered = jnp.swapaxes(gathered, 0, 1).reshape(
            B, n_chunks * t_chunk, Fmax, C
        )[:, :T]
    else:
        # large collections: accumulate one-hot matmuls over item chunks
        # (each candidate id hits exactly one chunk's window)
        n_f = -(-F // onehot_max_items)
        padf = n_f * onehot_max_items - F
        planes_p = jnp.pad(planes, ((0, 0), (0, padf), (0, 0)))
        planes_c = jnp.swapaxes(
            planes_p.reshape(B, n_f, onehot_max_items, C), 0, 1
        )
        lo_c = jnp.arange(n_f, dtype=jnp.int32) * onehot_max_items
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, Fmax, onehot_max_items), 3
        )

        @jax.checkpoint  # one-hot is recomputed in backward, never stored
        def accumulate(acc, pl, lo):
            local = bins.face_idx - lo  # (B, T, Fmax)
            onehot = (local[..., None] == iota).astype(planes.dtype)
            return acc + jnp.einsum(
                "btkf,bfc->btkc", onehot, pl,
                precision=jax.lax.Precision.HIGHEST,
            )

        def body(acc, chunk):
            pl, lo = chunk
            return accumulate(acc, pl, lo), None

        gathered, _ = jax.lax.scan(
            body, jnp.zeros((B, T, Fmax, C), planes.dtype), (planes_c, lo_c)
        )

    return gathered


def gather_bin_planes(fd: FaceRasterData, bins: TileBins,
                      onehot_max_faces: int = 8192,
                      channels=None, extra=None):
    """Per-tile face data as scalar channel planes, each (B, T, Fmax).

    Returns dict with qx0..qy2, z0..2, invz0..2 (see gather_bin_channels
    for the TPU layout rationale). `channels` restricts the gathered set
    (names from _PLANE_ORDER) — the einsum's MXU passes and HBM output
    both scale with the channel count, so consumers that only need the
    corner coordinates (the soft-silhouette path) should not pay for the
    depth channels.

    `extra` ((B, F, CE) float32, e.g. flattened per-face-corner shading
    attributes) rides the SAME one-hot einsum — the dominant cost is the
    one-hot construction, so extra channels are nearly free MXU work.
    With extra, returns (dict, extra_gathered (B, T, Fmax, CE))."""
    sources = _channel_sources(fd)
    names = _PLANE_ORDER if channels is None else tuple(channels)
    planes = jnp.stack([sources[n] for n in names], axis=-1)  # (B, F, C)
    if extra is not None:
        planes = jnp.concatenate([planes, extra], axis=-1)
    gathered = gather_bin_channels(planes, bins, onehot_max_faces)
    out = {name: gathered[..., c] for c, name in enumerate(names)}
    if extra is not None:
        return out, gathered[..., len(names):]
    return out


_PLANE_ORDER = ("qx0", "qx1", "qx2", "qy0", "qy1", "qy2",
                "z0", "z1", "z2", "invz0", "invz1", "invz2")


# ---------------------------------------------------------------------------
# Rank-based fused binning + gather (no top_k)
# ---------------------------------------------------------------------------
#
# bin_bboxes' candidate lists are exactly "the first Nmax overlapping items,
# ascending id" — which a prefix count (cumsum) of the overlap mask encodes
# directly: item f with overlap rank r lands in slot r-1. That makes the
# (B, T, Nmax, F) slot one-hot computable straight from the overlap mask,
# skipping the top_k sort AND the face_idx == iota reconstruction that
# gather_bin_channels pays. The one-hot rides the MXU as 3 bfloat16 passes
# (see _split3) — exact f32 results at half the cost of a
# Precision.HIGHEST (6-pass) f32 einsum.


def _trunc16(x: jax.Array) -> jax.Array:
    """Zero the low 16 mantissa bits: the result is exactly bf16-representable.
    Done with integer masking because XLA folds an f32->bf16->f32 convert
    pair away entirely (measured), which would silently break the split."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )


def _split3(x: jax.Array):
    """Exact 3-way bf16 split: x == hi + mid + lo with every part exactly
    bf16-representable (8 mantissa bits each covers f32's 24)."""
    hi = _trunc16(x)
    r = x - hi
    mid = _trunc16(r)
    lo = r - mid
    return hi, mid, lo


def _prefix_count(mask: jax.Array) -> jax.Array:
    """Inclusive 1-based prefix count of a boolean mask over the minor axis.

    Computed as within-block (128-lane) ranks via one exact bf16 triangular
    MXU dot plus a tiny cross-block cumsum, instead of jnp.cumsum over the
    full F axis: XLA lays the scan out with lanes on the NON-scanned axis,
    which forced full relayout copies of the (B, A, F) slot array between
    the scan and its F-minor one-hot gather consumers (~1.1 ms of the
    12-view 720p call in the op profile). Exact: 0/1 values are bf16-exact,
    per-block sums <= 128, and the f32 cross-block offsets stay integral
    below 2^24."""
    lead, F = mask.shape[:-1], mask.shape[-1]
    BL = 128
    Fp = -(-F // BL) * BL
    m = mask
    if Fp != F:
        m = jnp.pad(m, [(0, 0)] * len(lead) + [(0, Fp - F)])
    mb = m.reshape(*lead, Fp // BL, BL).astype(jnp.bfloat16)
    tri = jnp.triu(jnp.ones((BL, BL), jnp.bfloat16))  # tri[j,i]=1 for j<=i
    within = jax.lax.dot_general(
        mb, tri, (((mb.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (..., nb, BL) inclusive within-block count
    # block totals as a lane reduction of the mask, NOT within[..., -1]:
    # the trailing-dim slice materialized (…, nb, 1) copies (0.24 ms of
    # the 12-view 720p call)
    bsum = jnp.sum(mb.astype(jnp.float32), axis=-1)  # (..., nb)
    off = jnp.cumsum(bsum, axis=-1) - bsum           # exclusive block offset
    rank = (within + off[..., None]).reshape(*lead, Fp)[..., :F]
    return rank.astype(jnp.int32)


def _slot_onehot(slot: jax.Array, n_slots: int) -> jax.Array:
    """(B, t, F) slot ids -> (B, t, n_slots, F) bf16 one-hot (0/1 exact)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_slots, 1), 2)
    return (slot[:, :, None, :] == iota).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _slot_gather(slot: jax.Array, planes: jax.Array, n_slots: int):
    """Exact one-hot gather: out[b,t,k,c] = planes[b,f,c] where slot[b,t,f]==k.

    slot entries outside [0, n_slots) contribute nothing. Exact f32 via 3
    bf16 MXU passes (one-hot is exactly bf16; planes split exactly, see
    _split3). custom_vjp keeps only `slot` as residual — the backward
    rebuilds the one-hot and runs the transpose contraction with the same
    split trick on the cotangent, so nothing (B, t, K, F)-sized is ever
    stored (what jax.checkpoint achieved on the top_k path, minus the
    recompute of the forward einsum)."""
    onehot = _slot_onehot(slot, n_slots)
    hi, mid, lo = _split3(planes)
    # one dot with the 3 split parts PACKED along the channel axis: the
    # one-hot is constructed/read once instead of three times, and the
    # result is bit-identical (each output channel of the single dot IS
    # the corresponding per-part dot; the final adds are the same three
    # f32 values in the same order)
    C = planes.shape[-1]
    packed = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        onehot, packed,
        (((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]


def _slot_gather_fwd(slot, planes, n_slots):
    return _slot_gather(slot, planes, n_slots), slot


def _slot_gather_bwd(n_slots, slot, g):
    onehot = _slot_onehot(slot, n_slots)
    # d_planes[b,f,c] = sum_{t,k} onehot[b,t,k,f] * g[b,t,k,c]; single
    # packed dot as in the forward (bit-identical to the 3-pass form)
    hi, mid, lo = _split3(g)
    C = g.shape[-1]
    packed = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        onehot, packed,
        (((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    d_planes = (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]
    d_slot = np.zeros(slot.shape, dtype=jax.dtypes.float0)
    return d_slot, d_planes


_slot_gather.defvjp(_slot_gather_fwd, _slot_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _slot_gather_grouped(slot: jax.Array, planes: jax.Array, n_slots: int,
                         group: int):
    """Bit-identical to ``_slot_gather`` with a group-factored forward.

    The plain forward's MXU dot has n = 3C output lanes (21 for the
    7-channel point path) but pays the full 128-lane padded width, and its
    one-hot compare covers (t, n_slots, F) elements. Factoring
    slot = group*g + s shrinks both by ~``group``x (the round-5 probe,
    scripts/probe_point_gather.py, measured the padded-lane cost real:
    0.111 -> 0.190 ms/chunk going 21 -> 128 lanes on identical inputs):

      * the one-hot runs over groups only: (t, G, F) with G = ceil(K/group);
      * each item's 3C split channels are scattered into the s(f)-th
        21-lane block of a (t, F, group*3C <= 128) RHS (an elementwise
        select XLA fuses into the dot operand, like the one-hot);
      * one batched dot (batch (b, t), m=G, k=F, n=group*3C) then holds
        output slot g*group+s in row g, lane block s.

    Exactness: slots are unique per tile, so every output element is an
    f32 accumulation of exactly one nonzero bf16-exact product — the same
    value the plain forward accumulates — and the final 3-part add runs in
    the same (hi+mid)+lo order. The backward is the plain ungrouped
    transpose (the s-selection depends on (t, f), which blocks a grouped
    factoring of the cotangent contraction); residual stays slot-only."""
    B, t, F = slot.shape
    C = planes.shape[-1]
    G = -(-n_slots // group)
    hi, mid, lo = _split3(planes)
    packed = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    live = slot < n_slots
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, G, 1), 2)
    oh_g = (((slot // group)[:, :, None, :] == g_iota)
            & live[:, :, None, :]).astype(jnp.bfloat16)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, group), 3)
    s_mask = ((slot % group)[..., None] == s_iota).astype(jnp.bfloat16)
    # rhs[b,i,f, s*3C+c'] = packed[b,f,c'] iff slot[b,i,f] % group == s
    rhs = (s_mask[..., None] * packed[:, None, :, None, :]).reshape(
        B, t, F, group * 3 * C)
    y = jax.lax.dot_general(
        oh_g, rhs,
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (B, t, G, group*3C)
    y = y.reshape(B, t, G * group, 3 * C)[:, :, :n_slots]
    return (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]


def _slot_gather_grouped_fwd(slot, planes, n_slots, group):
    return _slot_gather_grouped(slot, planes, n_slots, group), slot


def _slot_gather_grouped_bwd(n_slots, group, slot, g):
    return _slot_gather_bwd(n_slots, slot, g)


_slot_gather_grouped.defvjp(_slot_gather_grouped_fwd, _slot_gather_grouped_bwd)


def _gather_group(n_slots: int, C: int) -> int:
    """Slot-group factor for _slot_gather_grouped; 1 = keep the plain path.

    MEASURED NEGATIVE (round 5, TPU v5e, the 4x20k/256^2 point bench):
    grouping is ~3x SLOWER in situ despite ~6x fewer padded MACs and ~2x
    fewer generated operand elements — 26.5 ms (t_chunk=2) / 12.3 ms
    (t_chunk=1) vs 9.3 ms ungrouped for the full 128-chunk gather. The
    tile-dependent RHS scatter (s-block select) does not fuse into the
    batched dot's operand generation the way the plain one-hot does, so
    its (B, t, F, group*3C) bf16 product materializes through HBM (~5 GB
    per gather at the bench shape). The gather is one-hot-CONSTRUCTION
    bound, not MAC bound: a transposed dot (m = 3C streamed rows, n = t*K
    lanes, no padded-lane waste at all) measured only 8.2 vs 9.3 ms. The
    ~2 ms channel-packed model in docs/ROUND4_NOTES.md double-counted the
    dot; scripts/probe_point_gather.py and this measurement retire it.
    Grouping therefore stays OFF; the grouped kernel remains (bit-exact,
    tested) for future hardware where operand fusion covers batched dots."""
    return 1


class RankBins(NamedTuple):
    """Rank-encoded tile bins: slot[b,t,f] = candidate position of item f in
    tile t (ascending id among overlaps), or _NO_SLOT (int32 max) for
    non-overlapping — a sentinel no gather slot count can reach."""

    slot: jax.Array         # (B, T, F) int32
    count: jax.Array        # (B, T) int32 total overlaps (uncapped)
    tile_origin: jax.Array  # (T, 2)
    n_tiles_hw: Tuple[int, int]


def bin_ranks(
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    valid: jax.Array,
    image_size,
    tile: int,
) -> RankBins:
    """Overlap mask -> slot ranks via prefix count. No sort, no top_k."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    overlap = jnp.all(
        (bbox_min[:, None, :, :] <= t_hi) & (bbox_max[:, None, :, :] >= t_lo),
        axis=-1,
    ) & valid[:, None, :]
    overlap = jax.lax.stop_gradient(overlap)
    F = overlap.shape[-1]
    rank = _prefix_count(overlap)  # 1-based (MXU block form, exact)
    slot = jnp.where(overlap, rank - 1, _NO_SLOT)
    return RankBins(
        slot=slot, count=rank[..., -1], tile_origin=origin,
        n_tiles_hw=(TH, TW),
    )


def bin_faces_ranked(
    fd, image_size, tile: int, pad_radius: float,
) -> RankBins:
    """Rank-binning of faces by blur-expanded screen bbox (cf. bin_faces).
    fd: FaceRasterData or geometry.FacePlanes."""
    fmin, fmax = _bbox_min_max(fd, pad_radius)
    return bin_ranks(fmin, fmax, fd.valid, image_size, tile)


def gather_rank_channels(
    planes: jax.Array, bins: RankBins, per_tile: int,
    vmem_budget: int = 16_000_000,
) -> jax.Array:
    """Per-tile re-layout (B, N, C) -> (B, T, per_tile, C) via _slot_gather,
    chunked over tiles to bound the fused one-hot working set."""
    B, T, F = bins.slot.shape
    C = planes.shape[-1]
    # chunk tiles so the per-chunk fused operands stay a true VMEM guest.
    # The former `1 + budget // (per_tile * F)` rounding allowed up to 2x
    # overshoot, which crosses a fusion cliff: at per_tile=384, F=20000 it
    # picked t_chunk=3 (23M-element one-hot) and XLA materialized the
    # one-hot through HBM — 59 vs 22 ms on the 4x20k-point sphere-Pulsar
    # render, and the round-3 "32-50 ms session spread" (the suggested
    # budget hopping across the cliff). Allow the +1 only within a 10%
    # overshoot. With the grouped forward the per-tile operand footprint
    # is G one-hot rows + group*3C RHS lanes instead of per_tile one-hot
    # rows, so the same budget admits larger chunks.
    group = _gather_group(per_tile, C)
    if group > 1:
        eff_per_tile = -(-per_tile // group) + group * 3 * C
    else:
        eff_per_tile = per_tile
    t_chunk = max(1, vmem_budget // (eff_per_tile * F))
    if (t_chunk + 1) * eff_per_tile * F <= int(1.1 * vmem_budget):
        t_chunk += 1
    t_chunk = min(T, t_chunk)
    n_chunks = -(-T // t_chunk)
    # balance the chunks: ceil(T / n_chunks) keeps the same chunk count
    # but minimizes padding (A=128 with a budget of 98 would otherwise
    # pad to 2x98=196 tiles — 1.5x wasted one-hot compare + dot work in
    # the hot gather; measured 0.40 -> 0.27 ms on the north-star step)
    t_chunk = -(-T // n_chunks)
    padt = n_chunks * t_chunk - T
    slot_p = jnp.pad(bins.slot, ((0, 0), (0, padt), (0, 0)),
                     constant_values=_NO_SLOT)
    slot_c = jnp.swapaxes(slot_p.reshape(B, n_chunks, t_chunk, F), 0, 1)

    def chunk(sc):
        if group > 1:
            return _slot_gather_grouped(sc, planes, per_tile, group)
        return _slot_gather(sc, planes, per_tile)

    g = jax.lax.map(chunk, slot_c)  # (n_chunks, B, t_chunk, K, C)
    return jnp.swapaxes(g, 0, 1).reshape(
        B, n_chunks * t_chunk, per_tile, C
    )[:, :T]


def gather_rank_planes(
    fd: FaceRasterData, bins: RankBins, per_tile: int,
    channels=None, extra=None,
):
    """Rank-binned analogue of gather_bin_planes: same channel-plane output
    dict (+ optional extra channels riding the same one-hot contraction),
    plus the per-slot valid mask derived from the tile counts."""
    sources = _channel_sources(fd)
    names = _PLANE_ORDER if channels is None else tuple(channels)
    planes = jnp.stack([sources[n] for n in names], axis=-1)
    if extra is not None:
        planes = jnp.concatenate([planes, extra], axis=-1)
    gathered = gather_rank_channels(planes, bins, per_tile)
    out = {name: gathered[..., c] for c, name in enumerate(names)}
    capped = jnp.minimum(bins.count, per_tile)  # (B, T)
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, per_tile), 2)
        < capped[:, :, None]
    )
    if extra is not None:
        return out, gathered[..., len(names):], mask
    return out, mask


def _winner_onehot(lane: jax.Array, live: jax.Array, P: int) -> jax.Array:
    """(c, tp) winner lanes -> (c, tp, P) bf16 one-hot (0 rows where dead
    or lane < 0)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)
    return ((lane[..., None] == iota) & live[..., None]).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def winner_gather(P: int, lane, live, g):
    """sel[c, n, t] = g[c, lane[c, t], n] (0 where dead): the per-pixel
    winner pick shared by the binned mesh and point interpolation
    epilogues, as ONE one-hot MXU contraction.

    Exact f32 at bf16-dot cost via the 3-way split (_split3, as
    _slot_gather): the one-hot is exactly bf16, g splits exactly, and
    each forward output element has a SINGLE nonzero term, so hi+mid+lo
    reconstructs the f32 value bit-for-bit — at half the MXU passes of a
    Precision.HIGHEST (6-pass) f32 einsum. custom_vjp keeps only
    (lane, live) as residuals and rebuilds the one-hot in the backward —
    plain AD stored every per-k (c, tp, P) mask across the chunk loop
    (436 MB / 10.7 ms of residual copies at the 4x20k point bench)."""
    mk = _winner_onehot(lane, live, P)                       # (c, tp, P)
    hi, mid, lo = _split3(g)                                 # (c, P, C)
    C = g.shape[-1]
    packed = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        mk, packed, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                        # (c, tp, 3C)
    sel = (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]
    return jnp.swapaxes(sel, 1, 2)                           # (c, C, tp)


def _winner_gather_fwd(P, lane, live, g):
    return winner_gather(P, lane, live, g), (lane, live)


def _winner_gather_bwd(P, res, d_sel):
    lane, live = res
    mk = _winner_onehot(lane, live, P)
    # d_g[c, f, n] = sum_t mk[c, t, f] * d_sel[c, n, t]; same packed
    # 3-pass split on the cotangent (multi-term sums: equal to a plain
    # f32 accumulation up to summation-order eps, like _slot_gather_bwd)
    hi, mid, lo = _split3(d_sel)
    C = d_sel.shape[1]
    packed = jnp.concatenate([hi, mid, lo], axis=1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        mk, packed, (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                        # (c, P, 3C)
    d_g = (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]
    d_lane = np.zeros(lane.shape, dtype=jax.dtypes.float0)
    d_live = np.zeros(live.shape, dtype=jax.dtypes.float0)
    return d_lane, d_live, d_g


winner_gather.defvjp(_winner_gather_fwd, _winner_gather_bwd)


# ---------------------------------------------------------------------------
# Active-tile compaction
# ---------------------------------------------------------------------------
#
# Measured on the north-star scene: 62.5% of tiles are EMPTY, yet every tile
# pays its slice of the gather one-hot (slot compare over all T tiles), its
# planes DMA into the kernel, and a grid step. Compacting the tile axis to
# the <= max_active non-empty tiles (rank over the tile-nonempty mask — the
# same prefix-count trick as rank binning, one level up) cuts all three by
# the empty fraction. The kernel output is scattered back to the full tile
# grid through the same exact one-hot contraction (_slot_gather with the
# inverse rank), where empty tiles receive an exact 0 (= coverage sum of no
# faces). Tiles beyond max_active are DROPPED (alpha 0) — size with
# suggest_active_tiles()-style headroom, as with faces_per_tile.


class ActiveBins(NamedTuple):
    """Rank bins over COMPACTED non-empty tiles. slot/count are indexed by
    active slot a (not tile t); invrank maps a back to its tile id (or
    T + 1 for unused slots); origin is the active tile's raster origin."""

    slot: jax.Array         # (B, A, F) int32
    count: jax.Array        # (B, A) int32
    invrank: jax.Array      # (B, A) int32
    rank: jax.Array         # (B, T) int32 active index of tile t (>=A: none)
    origin: jax.Array       # (B, A, 2) float32
    n_active: jax.Array     # (B,) int32 true non-empty count (diagnostics)
    tile_origin: jax.Array  # (T, 2)
    n_tiles_hw: Tuple[int, int]


def bin_ranks_active(
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    valid: jax.Array,
    image_size,
    tile: int,
    max_active: int,
    order: str = "tile",
) -> ActiveBins:
    """Rank-binning with the tile axis compacted to non-empty tiles.

    order: "tile" (default) ranks active tiles in raster order; "count"
    ranks them by DESCENDING candidate count (ties by raster order) —
    the layout the occupancy-split gather wants, where the first
    `hi_tiles` slots get the full per-tile lane budget and the tail a
    smaller one. Downstream results are order-independent (the scatter
    restores raster positions through invrank)."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    overlap = jnp.all(
        (bbox_min[:, None, :, :] <= t_hi) & (bbox_max[:, None, :, :] >= t_lo),
        axis=-1,
    ) & valid[:, None, :]
    overlap = jax.lax.stop_gradient(overlap)
    B, T, F = overlap.shape
    A = min(max_active, T)

    nonempty = jnp.any(overlap, axis=-1)                    # (B, T)
    if order == "count":
        # rank = position among actives sorted by (count desc, tile asc):
        # one branchless (B, T, T) key comparison — T is a few hundred.
        cnt = jnp.sum(overlap, axis=-1, dtype=jnp.int32)    # (B, T)
        cnt = jnp.where(nonempty, cnt, -1)
        # lexicographic (count desc, tile asc) without a packed integer
        # key: cnt * T + tie overflows int32 once F * T > 2^31 (silently
        # dropping the densest tile); the two compares cannot.
        idx = jnp.arange(T, dtype=jnp.int32)
        tie = (idx[:, None] < idx[None, :])[None]
        beats = ((cnt[:, :, None] > cnt[:, None, :])
                 | ((cnt[:, :, None] == cnt[:, None, :]) & tie))
        srank = jnp.sum(beats.astype(jnp.int32), axis=1)    # (B, T)
        rank = jnp.where(nonempty, srank, A + 1)            # >= A drops
    elif order == "tile":
        trank = jnp.cumsum(nonempty.astype(jnp.int32), axis=-1)
        rank = jnp.where(nonempty, trank - 1, A + 1)        # >= A drops
    else:
        raise ValueError(f"unknown active-tile order: {order!r}")
    iota_a = jnp.arange(A, dtype=jnp.int32)
    onehot = rank[:, None, :] == iota_a[None, :, None]      # (B, A, T)

    # compact the overlap mask rows: exact bf16 matmul (0/1 values, one
    # nonzero term per output element)
    overlap_c = jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), overlap.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) > 0.5                                                 # (B, A, F)
    rankf = _prefix_count(overlap_c)  # 1-based (MXU block form, exact)
    slot = jnp.where(overlap_c, rankf - 1, _NO_SLOT)

    onef = onehot.astype(jnp.float32)
    origin_c = jnp.einsum(
        "bat,tc->bac", onef, origin, precision=jax.lax.Precision.HIGHEST
    )
    inv = jnp.einsum(
        "bat,t->ba", onef, jnp.arange(T, dtype=jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    n_active = jnp.sum(nonempty.astype(jnp.int32), axis=-1)
    used = iota_a[None, :] < jnp.minimum(n_active, A)[:, None]
    invrank = jnp.where(used, inv, T + 1)  # unused slots scatter nowhere

    return ActiveBins(
        slot=slot, count=rankf[..., -1], invrank=invrank, rank=rank,
        origin=origin_c, n_active=n_active, tile_origin=origin,
        n_tiles_hw=(TH, TW),
    )


def bin_faces_active(
    fd, image_size, tile: int, pad_radius: float,
    max_active: int, order: str = "tile",
) -> ActiveBins:
    """Active-tile rank-binning of faces (cf. bin_faces_ranked).
    fd: FaceRasterData or geometry.FacePlanes."""
    fmin, fmax = _bbox_min_max(fd, pad_radius)
    return bin_ranks_active(fmin, fmax, fd.valid, image_size, tile,
                            max_active, order=order)


def count_active_tiles(fd, image_size, tile, pad_radius):
    """Max over the batch of the non-empty tile count (sizing helper for
    bin_faces_active; call with concrete data, like count_overflow).
    fd: FaceRasterData or geometry.FacePlanes."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    fmin, fmax = _bbox_min_max(fd, pad_radius)
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    overlap = jnp.all(
        (fmin[:, None, :, :] <= t_hi) & (fmax[:, None, :, :] >= t_lo), axis=-1
    ) & fd.valid[:, None, :]
    return jnp.max(jnp.sum(jnp.any(overlap, axis=-1).astype(jnp.int32),
                           axis=-1))


def scatter_active(values: jax.Array, bins: ActiveBins) -> jax.Array:
    """(B, A, P) active-slot values -> (B, T, P) full tile grid; empty tiles
    receive exactly 0. Rides _slot_gather (exact 3-pass bf16 contraction,
    residual-light custom VJP) with the inverse rank as the slot map."""
    T = bins.tile_origin.shape[0]
    return _slot_gather(bins.invrank[:, None, :], values, T)[:, 0]


def compact_rows(values: jax.Array, rank: jax.Array, A: int) -> jax.Array:
    """(B, T, ...) -> (B, A, ...) rows reordered by active rank (exact
    one-hot contraction; slots with no source tile come back 0). The
    inverse of scatter_active. int inputs ride f32 (exact below 2^24)."""
    B, T = values.shape[:2]
    trail = values.shape[2:]
    dtype = values.dtype
    flat = values.reshape(B, T, -1)
    if dtype in (jnp.int32, jnp.bool_):
        flat = flat.astype(jnp.float32)
    out = _slot_gather(rank[:, None, :], flat, A)[:, 0]
    if dtype == jnp.int32:
        out = jnp.round(out).astype(jnp.int32)
    elif dtype == jnp.bool_:
        out = out > 0.5
    return out.reshape((B, A) + trail)


def scatter_rows(values: jax.Array, invrank: jax.Array, T: int) -> jax.Array:
    """(B, A, ...) -> (B, T, ...) by the inverse rank (exact; tiles with no
    active slot come back 0). scatter_active without the ActiveBins."""
    B, A = values.shape[:2]
    trail = values.shape[2:]
    flat = values.reshape(B, A, -1)
    out = _slot_gather(invrank[:, None, :], flat, T)[:, 0]
    return out.reshape((B, T) + trail)


def active_indicator(bins: ActiveBins) -> jax.Array:
    """(B, T, 1) bool: True where the tile is active (scatter target)."""
    B, A = bins.invrank.shape
    ones = jnp.ones((B, A, 1), jnp.float32)
    return scatter_active(ones, bins) > 0.5


def scatter_active_bg(values: jax.Array, bins: ActiveBins, bg,
                      indicator: jax.Array | None = None) -> jax.Array:
    """(B, A, ...) -> (B, T, ...) with inactive tiles set to `bg` (a scalar
    or an array broadcastable to the trailing dims). Values on active tiles
    are EXACT (single-term one-hot contraction), so the full-grid result is
    bit-identical to the uncompacted path wherever a tile exists."""
    B, A = values.shape[:2]
    trail = values.shape[2:]
    T = bins.tile_origin.shape[0]
    s = scatter_active(values.reshape(B, A, -1), bins).reshape((B, T) + trail)
    ind = active_indicator(bins) if indicator is None else indicator
    ind = ind.reshape((B, T) + (1,) * len(trail))
    return jnp.where(ind, s, jnp.asarray(bg, values.dtype))


# ---------------------------------------------------------------------------
# Group packing (for the group-packed Pallas kernels)
# ---------------------------------------------------------------------------
#
# One level below active-tile compaction: even over non-empty tiles, the
# kernels' 128-lane chunk quantum means a tile with 27 candidates pays a
# full 128-lane chunk (the north-star mean occupancy is ~61/128). Packing
# the candidates of the 8 tiles a program owns into ONE shared lane axis
# (each face pre-translated into its own tile's pixel frame — the coverage
# math only ever uses px - qx differences, so it is translation-invariant)
# drops the padded-lane total 98304 -> 55296 on the north-star scene. The
# per-tile segmentation of the coverage sums moves into the kernel as a
# tiny one-hot MXU contraction (see pallas_soft._fwd_kernel_packed).

_GROUP = 8  # tiles per pack group == tiles per kernel program


def pack_groups(slabs: jax.Array, capped: jax.Array, n_slots: int):
    """Per-tile slot slabs -> group-packed slabs.

    slabs:  (B, A, K, C) per-tile candidate channels (slot-major, valid
            candidates contiguous from slot 0 — rank binning's layout)
    capped: (B, A) int32 valid candidates per tile (= min(count, K))
    n_slots: packed lane budget per group of 8 tiles (static; group
            candidates beyond it are dropped, like overflowing face bins)

    Returns (packed, n_valid):
      packed  (B * A//8, n_slots, C) — the 8 tiles' candidates concatenated
              in tile order (offset = exclusive cumsum of capped within the
              group); exact (3-pass bf16 one-hot contraction, _slot_gather)
              and differentiable w.r.t. slabs.
      n_valid (B, A//8) int32 — packed candidates per group (post-cap).
    """
    B, A, K, C = slabs.shape
    if A % _GROUP:
        raise ValueError(f"active-tile count {A} not a multiple of {_GROUP}")
    G = A // _GROUP
    cg = jnp.minimum(capped, K).reshape(B, G, _GROUP)
    off = jnp.cumsum(cg, axis=-1) - cg                       # exclusive
    k = jnp.arange(K, dtype=jnp.int32)
    spack = off[..., None] + k[None, None, None, :]          # (B, G, 8, K)
    fill = (k[None, None, None, :] < cg[..., None]) & (spack < n_slots)
    spack = jnp.where(fill, spack, n_slots + 1)
    slot = spack.reshape(B * G, 1, _GROUP * K)
    planes = slabs.reshape(B * G, _GROUP * K, C)
    packed = _slot_gather(slot, planes, n_slots)[:, 0]
    n_valid = jnp.minimum(jnp.sum(cg, axis=-1), n_slots)
    return packed, n_valid


def group_offsets(capped: jax.Array, per_tile: int):
    """Exclusive per-group pack offsets for pack_groups' layout.

    capped (B, A) int32 -> (cg, off): cg (B, G, 8) = min(capped, per_tile)
    reshaped to groups; off (B, G, 8) = each tile's first packed lane
    (exclusive cumsum of cg within its group). A must be 8-aligned."""
    B, A = capped.shape
    if A % _GROUP:
        raise ValueError(f"active-tile count {A} not a multiple of {_GROUP}")
    cg = jnp.minimum(capped, per_tile).reshape(B, -1, _GROUP)
    off = jnp.cumsum(cg, axis=-1) - cg
    return cg, off


def packed_ev_row(cg: jax.Array, n_valid: jax.Array, n_slots: int):
    """The packed kernels' ev row (tile slot + 1 per packed lane, 0 =
    padding), built from the pack offsets directly: lane s of a group
    belongs to tile j iff off_j <= s < off_{j+1}, so ev[s] = #{j: off_j
    <= s} for s < n_valid. Carries no gradient (stop_gradient).

    cg (B, G, 8) capped counts (group_offsets), n_valid (B, G) packed
    candidates per group (pack_groups) -> ev (B, G, n_slots) f32."""
    off = jnp.cumsum(cg, axis=-1) - cg                  # (B, G, 8) exclusive
    s_iota = jnp.arange(n_slots, dtype=jnp.int32)[None, None, None, :]
    ev = jnp.sum((s_iota >= off[..., None]).astype(jnp.float32), axis=2)
    ev = jnp.where(s_iota[:, :, 0] < n_valid[..., None], ev, 0.0)
    return jax.lax.stop_gradient(ev)


def suggest_group_lanes_fd(
    fd: FaceRasterData, image_size, tile: int, pad_radius: float,
    max_active: int, faces_per_tile: int,
    margin: float = 1.3, multiple: int = 128, order: str = "tile",
) -> int:
    """Smallest safe packed-lane budget per 8-tile group for this scene
    (max over (batch, group) of the summed per-tile candidate counts, with
    headroom, 128-lane aligned). Call OUTSIDE jit with concrete data; pass
    as soft_silhouette_pallas_fd(group_lanes=...). Groups follow active-
    compaction order (bin_ranks_active), matching the kernel's grouping —
    pass order="count" when the occupancy split is in play (it sorts tiles
    by count, which concentrates the biggest bins into the first group)."""
    import math as _math

    bins = bin_faces_active(fd, image_size, tile, pad_radius, max_active,
                            order=order)
    capped = jnp.minimum(bins.count, faces_per_tile)        # (B, A)
    B, A = capped.shape
    pad = (-A) % _GROUP
    if pad:
        capped = jnp.pad(capped, ((0, 0), (0, pad)))
    gsum = capped.reshape(B, -1, _GROUP).sum(-1)
    n = int(jnp.max(gsum))
    want = int(_math.ceil(n * margin / multiple)) * multiple
    return max(multiple, min(want, _GROUP * faces_per_tile))


def suggest_active_tiles_fd(
    fd: FaceRasterData, image_size, tile: int, pad_radius: float,
    margin: float = 1.3, multiple: int = 8,
) -> int:
    """Smallest safe active-tile budget for this scene (max non-empty tile
    count over the batch, with headroom). Call OUTSIDE jit with concrete
    data; tiles beyond the budget are dropped like overflowing face bins."""
    import math as _math

    n = int(count_active_tiles(fd, image_size, tile, pad_radius))
    TH, TW, _ = tile_grid(image_size, tile)
    T = TH * TW
    want = int(_math.ceil(n * margin / multiple)) * multiple
    return max(multiple, min(want, T))


def suggest_occupancy_split_fd(
    fd, image_size, tile: int, pad_radius: float, max_active: int,
    max_faces_per_bin: int, lo_candidates=(16, 32, 48, 64, 96),
    margin: float = 1.3, multiple: int = 8,
):
    """(hi_tiles, lo_lanes) for RasterizationSettings.occupancy_split, or
    None when no candidate improves on the single-budget pipeline.

    For each candidate lo, tiles whose margined count exceeds lo must run
    the full max_faces_per_bin budget; the modeled selection/gather work is
    hi*full + (A-hi)*lo, minimized over candidates. Call OUTSIDE jit with
    concrete data; like every bin budget, footprints that move during a
    fit need the margin (tail tiles whose count outgrows lo_lanes DROP
    their highest-index faces)."""
    import math as _math

    import numpy as np

    bins = bin_faces_active(fd, image_size, tile, pad_radius, max_active,
                            order="count")
    cnt = np.asarray(bins.count)                              # (B, A)
    A = cnt.shape[1]
    full = min(max_faces_per_bin, int(fd.valid.shape[-1]))
    best, best_work = None, None
    for lo in lo_candidates:
        if lo >= full:
            continue
        n_hi = int((cnt * margin > lo).sum(axis=1).max())
        hi = min(A, int(_math.ceil(max(n_hi, 1) * margin / multiple))
                 * multiple)
        if hi >= A:
            continue
        work = hi * full + (A - hi) * lo
        if best_work is None or work < best_work:
            best, best_work = (hi, lo), work
    if best is None or best_work > 0.9 * A * full:  # no real modeled win
        return None
    return best


def tile_pixel_coords(image_size, tile: int):
    """Local pixel offsets within a tile, raster units: (tile*tile, 2)."""
    H, W = image_size
    s = min(H, W) / 2.0
    d = jnp.arange(tile, dtype=jnp.float32) / s
    yy, xx = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def untile_image(per_tile: jax.Array, image_size, tile: int, n_tiles_hw):
    """(B, T, tile*tile, C?) -> (B, H, W, C?) cropping any right/bottom pad."""
    TH, TW = n_tiles_hw
    B = per_tile.shape[0]
    trailing = per_tile.shape[3:]
    img = per_tile.reshape((B, TH, TW, tile, tile) + trailing)
    img = jnp.moveaxis(img, 3, 2).reshape((B, TH * tile, TW * tile) + trailing)
    H, W = image_size
    return img[:, :H, :W]


def count_bbox_active_tiles(bbox_min, bbox_max, valid, image_size, tile: int):
    """Max over the batch of the non-empty tile count for bbox binning
    (sizing helper for bin_ranks_active on point clouds, cf.
    count_active_tiles for faces). Call with concrete data outside jit;
    chunks the item axis like count_bbox_overflow."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    N = valid.shape[-1]
    chunk = 8192
    nonempty = None
    for n0 in range(0, N, chunk):
        lo_c = bbox_min[:, n0:n0 + chunk]
        hi_c = bbox_max[:, n0:n0 + chunk]
        v_c = valid[:, n0:n0 + chunk]
        any_c = jnp.any(jnp.all(
            (lo_c[:, None, :, :] <= t_hi) & (hi_c[:, None, :, :] >= t_lo),
            axis=-1,
        ) & v_c[:, None, :], axis=-1)  # (B, T)
        nonempty = any_c if nonempty is None else (nonempty | any_c)
    return int(jnp.max(jnp.sum(nonempty.astype(jnp.int32), axis=-1)))


def count_bbox_overflow(bbox_min, bbox_max, valid, image_size, tile: int):
    """Max candidate count over tiles for bbox binning (sizing helper for
    bin_bboxes' per_tile, like count_overflow for faces). Call with
    concrete data outside jit; chunks the item axis so 100k-point clouds
    don't materialize a (B, T, N) boolean."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    N = valid.shape[-1]
    chunk = 8192
    counts = None
    for n0 in range(0, N, chunk):
        lo_c = bbox_min[:, n0:n0 + chunk]
        hi_c = bbox_max[:, n0:n0 + chunk]
        v_c = valid[:, n0:n0 + chunk]
        overlap = jnp.all(
            (lo_c[:, None, :, :] <= t_hi) & (hi_c[:, None, :, :] >= t_lo),
            axis=-1,
        ) & v_c[:, None, :]
        c = jnp.sum(overlap.astype(jnp.int32), axis=-1)
        counts = c if counts is None else counts + c
    return int(jnp.max(counts))
