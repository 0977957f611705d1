"""Fragment buffers produced by mesh rasterization.

Mirrors pytorch3d's Fragments (pix_to_face / zbuf / bary_coords / dists, the
surface consumed at reference torch_renderer.py:113, camera_pose_optimizer.py:
244-246, batch_rendering_test.py:274) so every shader in the reference has a
direct equivalent here — but produced by a TPU-shaped tiled rasterizer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EMPTY_DIST = 1e10  # sentinel squared-distance for empty fragment slots


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedAttributes:
    """Bin-local winner bookkeeping + pre-gathered per-face attributes.

    Produced by the binned Pallas rasterizer when per-face attribute
    channels are threaded through its tile gather (raster.rasterize_meshes'
    extra_face_attrs): attribute interpolation can then run per tile with a
    one-hot over the bin's <=Fmax candidate lanes instead of all F faces —
    ~F/Fmax (~6x at the joint-fit scale) less one-hot construction, and the
    bin gather of the attributes rides the SAME einsum as the rasterizer's
    corner channels, so it costs no extra one-hot work at all.

    lane:      (B, H, W, K) int32 bin-local candidate lane of each hit
               (garbage where pix_to_face < 0 — always mask).
    channels:  (B, T, Fmax, CE) bin-gathered attribute channels,
               corner-major per attribute (corner0 c0..cn, corner1 ...).
               With active-tile compaction the first axis is A (the active
               budget) instead of T, and rank/invrank are set.
    layout:    static ((name, start, c_per_corner), ...) slices into CE/3.
    rank:      (B, T) int32 active slot of each tile (>= A: empty/dropped),
               or None when channels cover the full tile grid.
    invrank:   (B, A) int32 tile of each active slot (>= T: unused slot).
    """

    lane: jax.Array
    channels: jax.Array
    tile: int = dataclasses.field(metadata=dict(static=True))
    n_tiles_hw: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    layout: Tuple[Tuple[str, int, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    rank: Optional[jax.Array] = None
    invrank: Optional[jax.Array] = None

    def names(self):
        return tuple(n for n, _, _ in self.layout)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Fragments:
    """Per-pixel top-K face hits.

    pix_to_face: (B, H, W, K) int32 face index into the mesh's padded face
        axis, -1 for empty slots. Slots are sorted by increasing z.
    zbuf:        (B, H, W, K) float32 camera-space z of the hit (perspective-
        correct, clipped-barycentric), -1.0 for empty slots (pytorch3d
        sentinel, so `relu(zbuf)` / `zbuf[zbuf==-1]=0` idioms carry over).
    bary:        (B, H, W, K, 3) float32 perspective-correct barycentrics
        (clipped to the simplex when blur_radius > 0), 0 for empty slots.
    dists:       (B, H, W, K) float32 signed squared pixel-to-face-boundary
        distance in NDC units (negative inside), EMPTY_DIST for empty slots.
    """

    pix_to_face: jax.Array
    zbuf: jax.Array
    bary: jax.Array
    dists: jax.Array
    # Bin-local interpolation data (binned Pallas path only; see
    # BinnedAttributes). None for dense/XLA rasterization.
    binned: Optional[BinnedAttributes] = None

    @property
    def mask(self) -> jax.Array:
        """(B, H, W, K) bool: slot has a real face."""
        return self.pix_to_face >= 0

    def hard_mask(self) -> jax.Array:
        """(B, H, W) bool hard coverage from the nearest slot."""
        return self.pix_to_face[..., 0] >= 0

    def depth(self) -> jax.Array:
        """(B, H, W) nearest-hit depth with background 0 (the reference's
        `relu(zbuf[..., 0])`, torch_renderer.py:113-114)."""
        return jax.nn.relu(self.zbuf[..., 0])


def tile_image(img: jax.Array, tile: int, n_tiles_hw) -> jax.Array:
    """(B, H, W, ...) -> (B, T, tile*tile, ...) — inverse of
    binning.untile_image; right/bottom zero-pads H/W to tile multiples."""
    TH, TW = n_tiles_hw
    B, H, W = img.shape[:3]
    trailing = img.shape[3:]
    ph, pw = TH * tile - H, TW * tile - W
    if ph or pw:
        img = jnp.pad(
            img, [(0, 0), (0, ph), (0, pw)] + [(0, 0)] * len(trailing)
        )
    a = img.reshape((B, TH, tile, TW, tile) + trailing)
    a = jnp.moveaxis(a, 2, 3)
    return a.reshape((B, TH * TW, tile * tile) + trailing)


def interpolate_binned(
    fragments: "Fragments", flat: bool = False, k_slots: Optional[int] = None,
):
    """Barycentric interpolation of ALL bin-gathered attribute channels.

    The fast path behind interpolate_face_attributes for fragments produced
    by the binned Pallas rasterizer with extra_face_attrs: per-pixel corner
    picks are one-hots over the tile's <=Fmax candidate LANES (the kernel's
    winner-lane output) against the pre-gathered (B, T, Fmax, 3*C) slabs —
    instead of one-hots over all F faces. Exact same values/gradients as
    the global one-hot path (selection is non-differentiable; gradients
    flow through the bin-gather einsum and the barycentric combine).

    Returns {name: (B, H, W, K, C)} for every attribute in the layout,
    zeros at empty slots.

    flat=True instead returns ({name: (B, T*tp*K, C)}, finalize) where
    finalize maps a (B, T*tp*K, C) array back to masked image shape
    (B, H, W, K, C). Shading chains should stay flat until their final
    color and untile ONCE: every (..., K, small-C) image-shaped
    intermediate pays a (8, 128)-tile padding relayout on TPU.

    k_slots limits interpolation to the nearest k_slots hits per pixel
    (shading cost scales with it; at gamma=1e-4 the z-softmax color blend
    is effectively decided by the first 1-2 slots).
    """
    ba = fragments.binned
    assert ba is not None
    tile, nthw = ba.tile, ba.n_tiles_hw
    B, H, W, K = ba.lane.shape
    if k_slots is not None:
        K = min(k_slots, K)
    T, Fmax, CE = ba.channels.shape[1:]   # T = A under active-tile compaction
    Ctot = CE // 3
    tp = tile * tile
    tpk = tp * K
    T_full = nthw[0] * nthw[1]

    live = fragments.pix_to_face[..., :K] >= 0
    idx = jnp.where(live, ba.lane[..., :K], -1)  # -1 matches no lane
    idx_t = tile_image(idx, tile, nthw).reshape(B, T_full, tpk)
    bar_t = tile_image(fragments.bary[..., :K, :], tile, nthw).reshape(
        B, T_full, tpk, 3
    )
    if ba.rank is not None:
        # compact the per-pixel rows to the active tiles: the interpolation
        # loop (and, in flat mode, the whole downstream shading chain) then
        # runs on A instead of T tiles. idx rides as idx+1 so slots with no
        # source tile come back -1 (dead), not lane 0.
        from .binning import compact_rows, scatter_rows

        idx_t = compact_rows(idx_t + 1, ba.rank, T) - 1
        bar_t = compact_rows(bar_t, ba.rank, T)

    tc = max(1, min(T, 1 + 16_000_000 // max(1, tpk * Fmax)))
    n_chunks = -(-T // tc)
    padt = n_chunks * tc - T

    def padc(a, fill=0):
        a = jnp.pad(
            a, [(0, 0), (0, padt)] + [(0, 0)] * (a.ndim - 2),
            constant_values=fill,
        )
        return a.reshape((a.shape[0], n_chunks, tc) + a.shape[2:]).swapaxes(0, 1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, tc, 1, Fmax), 3)
    dtype = ba.channels.dtype

    @jax.checkpoint  # one-hots are rebuilt in backward, never stored
    def chunk(args):
        idx_c, bar_c, ch_c = args  # (B,tc,tpk), (B,tc,tpk,3), (B,tc,Fmax,CE)
        onehot = (idx_c[..., None] == iota).astype(dtype)
        sel = jnp.einsum(
            "btpf,btfz->btpz", onehot, ch_c,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(idx_c.shape[0], tc, tpk, 3, Ctot)
        return jnp.einsum("btpv,btpvc->btpc", bar_c, sel)

    out = jax.lax.map(
        chunk, (padc(idx_t, -1), padc(bar_t), padc(ba.channels))
    )  # (n_chunks, B, tc, tpk, Ctot)

    from .binning import untile_image

    if flat:
        out_flat = out.swapaxes(0, 1).reshape(
            B, n_chunks * tc * tpk, Ctot
        )[:, : T * tpk]
        # Mask dead slots HERE, not only in finalize: the where() also
        # severs the backward path, so NaN cotangents from downstream
        # shading math evaluated at the zero attributes (e.g. the vjp of
        # normalize at a zero normal) never reach the interpolation.
        if ba.rank is not None:
            live_flat = (idx_t >= 0).reshape(B, T * tpk)
        else:
            live_flat = tile_image(live, tile, nthw).reshape(B, T * tpk)
        out_flat = jnp.where(live_flat[..., None], out_flat, 0.0)

        def finalize(x: jax.Array) -> jax.Array:
            x = x.reshape(B, T, tp, K, x.shape[-1])
            if ba.rank is not None:
                x = scatter_rows(x, ba.invrank, T_full)
            img = untile_image(x, (H, W), tile, nthw)
            return jnp.where(live[..., None], img, 0.0)

        return (
            {n: out_flat[..., s:s + c] for n, s, c in ba.layout},
            finalize,
        )

    out = out.swapaxes(0, 1).reshape(B, n_chunks * tc, tp, K, Ctot)[:, :T]
    if ba.rank is not None:
        out = scatter_rows(out, ba.invrank, T_full)
    img = untile_image(out, (H, W), tile, nthw)  # (B, H, W, K, Ctot)
    img = jnp.where(live[..., None], img, 0.0)
    return {n: img[..., s:s + c] for n, s, c in ba.layout}


def flat_pixel_zbuf(fragments: "Fragments", k_slots: Optional[int] = None):
    """Pixel centers + zbuf of every flat fragment slot, in the SAME
    (B, T*tp*K, ...) order as interpolate_binned(flat=True).

    The inputs of camera-ray world-position reconstruction
    (shading.phong point reconstruction): a fragment's world position is
    the camera ray through its pixel center evaluated at its camera-space
    zbuf — so Phong shading can skip gathering/interpolating the 9
    world-corner channels entirely.

    Returns (uv (B, N, 2) pixel centers in pixels — u indexes width —
    and z (B, N) camera-space depth, exactly -1.0 at EVERY dead slot),
    N = T*tp*K with T the active budget under tile compaction.

    Dead slots come from three sources — rasterizer-empty slots (zbuf
    sentinel -1), right/bottom tile-pad pixels (tile_image zero-fills)
    and compaction-unused active rows (compact_rows zero-fills) — and
    all of them must come back -1, never 0: z=0 reconstructs the point
    at exactly the camera center, where the view-vector norm's vjp is
    NaN even under a zero cotangent. z rides through tiling/compaction
    as z+1 so every zero-filled source lands on -1 after the shift back
    (|pcam| >= 1 at dead slots keeps the lighting vjp finite).
    """
    ba = fragments.binned
    assert ba is not None
    tile, nthw = ba.tile, ba.n_tiles_hw
    B, H, W, K = ba.lane.shape
    if k_slots is not None:
        K = min(k_slots, K)
    T = ba.channels.shape[1]  # = A under active-tile compaction
    T_full = nthw[0] * nthw[1]
    tp = tile * tile

    # +1 shift: zero-filled pad/unused slots land on -1 after the shift
    # back (see docstring); the constant shift leaves gradients unchanged.
    zb = tile_image(
        fragments.zbuf[..., :K] + 1.0, tile, nthw
    )  # (B, T_full, tp, K)
    u = jax.lax.broadcasted_iota(jnp.float32, (1, H, W), 2) + 0.5
    v = jax.lax.broadcasted_iota(jnp.float32, (1, H, W), 1) + 0.5
    uv = tile_image(jnp.stack([u, v], axis=-1), tile, nthw)  # (1, T_full, tp, 2)
    if ba.rank is not None:
        from .binning import compact_rows

        zb = compact_rows(zb, ba.rank, T)
        uv = compact_rows(
            jnp.broadcast_to(uv, (B, T_full, tp, 2)), ba.rank, T
        )
    uvk = jnp.broadcast_to(
        uv[:, :, :, None, :], (max(B, uv.shape[0]), T, tp, K, 2)
    ).reshape(-1, T * tp * K, 2)
    return uvk, zb.reshape(B, T * tp * K) - 1.0


def interpolate_face_attributes(
    pix_to_face: jax.Array, bary: jax.Array, face_attrs: jax.Array,
    method: str = "auto", pixel_chunk: int = 8192,
) -> jax.Array:
    """Barycentric interpolation of per-face-corner attributes.

    Args:
      pix_to_face: (B, ..., K) indices (-1 empty).
      bary: (B, ..., K, 3).
      face_attrs: (B, F, 3, C) per-corner attributes.
      method: 'auto' | 'gather' | 'onehot'. On TPU, auto uses the chunked
        one-hot MXU formulation: arbitrary-index gathers of tiny-trailing-
        dim (F, 3, C) arrays run nearly scalar on TPU, and — worse — their
        BACKWARD is a scatter-add into the attributes, which serializes
        (measured: the shading gathers cost ~74 of an 87 ms joint-fit
        step, vs 13 ms for rasterization). The one-hot path picks corners
        with an exact 0/1 matmul whose autodiff is a transposed matmul —
        identical values, no scatter. Off-TPU the cheap gather is used.
    Returns:
      (B, ..., K, C), zeros at empty slots.
    """
    use_onehot = method == "onehot" or (
        method == "auto" and jax.default_backend() == "tpu"
    )
    if use_onehot:
        return _interpolate_onehot(pix_to_face, bary, face_attrs, pixel_chunk)

    safe_idx = jnp.maximum(pix_to_face, 0)

    def gather_b(attrs_b, idx_b):
        return attrs_b[idx_b]  # (..., K, 3, C)

    corners = jax.vmap(gather_b)(face_attrs, safe_idx)
    out = jnp.einsum("...kv,...kvc->...kc", bary, corners)
    return jnp.where((pix_to_face >= 0)[..., None], out, 0.0)


def _interpolate_onehot(pix_to_face, bary, face_attrs, pixel_chunk):
    """Chunked one-hot MXU corner pick + barycentric combine (TPU path)."""
    B, F, _, C = face_attrs.shape
    shape = pix_to_face.shape  # (B, ...)
    P = 1
    for d in shape[1:]:
        P *= d

    idx = jnp.maximum(pix_to_face, 0).reshape(B, P)
    bar = bary.reshape(B, P, 3)
    attrs_flat = face_attrs.reshape(B, F, 3 * C)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (1, 1, F), 2)

    # Bound the per-chunk one-hot to ~64 MB whatever the face count: at
    # F=100k the default pixel_chunk would otherwise materialize a ~3 GB
    # (B, pc, F) slab per chunk.
    pc = max(1, min(pixel_chunk, P, 16_000_000 // max(1, F)))
    n_chunks = -(-P // pc)
    padp = n_chunks * pc - P
    padc = lambda a: jnp.pad(
        a, [(0, 0), (0, padp)] + [(0, 0)] * (a.ndim - 2)
    ).reshape((B, n_chunks, pc) + a.shape[2:]).swapaxes(0, 1)

    @jax.checkpoint  # one-hots are rebuilt in backward, never stored
    def chunk(args):
        idx_c, bar_c = args                      # (B, pc), (B, pc, 3)
        onehot = (idx_c[..., None] == iota_f).astype(face_attrs.dtype)
        corners = jnp.einsum(
            "bpf,bfz->bpz", onehot, attrs_flat,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(idx_c.shape[0], idx_c.shape[1], 3, C)
        return jnp.einsum("bpv,bpvc->bpc", bar_c, corners)

    out = jax.lax.map(chunk, (padc(idx), padc(bar)))  # (n_chunks, B, pc, C)
    out = out.swapaxes(0, 1).reshape(B, n_chunks * pc, C)[:, :P]
    out = out.reshape(shape + (C,))
    return jnp.where((pix_to_face >= 0)[..., None], out, 0.0)
