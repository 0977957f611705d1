"""Decompose the point candidate gather's cost (VERDICT r4 task 3).

The round-4 roofline row models `gather_rank_channels` at the 4x20k/256^2
point bench as one-hot construction (1 VPU op/element over the
(t_chunk, Pmax, N) compare) PLUS the packed bf16 dot at its full 128-padded
lane width (only 3C = 21 lanes carry data), scoring the measured 8.04 ms at
1.36x the 10.91 ms bound. docs/ROUND4_NOTES.md names a ~4x in-principle
lever: "a channel-packed multi-k gather could in principle approach ~2 ms"
— IF the dot really pays 6x lane padding.

This probe settles it with per-chunk isolations on the exact bench shapes
(scan harness, min-of-N, floor-subtracted):

  full         gather_rank_channels as shipped (all chunks)
  fused1       ONE chunk of the real thing (_slot_gather: construct + dot,
               one-hot lives only in registers/VMEM)
  onehot1      one chunk's (t_chunk, Pmax, N) == compare + bf16 cast alone
  dot21/126/128  one chunk's dot on a PREMATERIALIZED one-hot at n = 3C,
               126, 128 lanes. The one-hot read from HBM is identical
               across the three, so their DIFFERENCES isolate the pure
               lane-width cost of the MXU pass.

Reading: fused1 - onehot1 is what the dot costs in situ. If
dot128 - dot21 ~ 0, the MXU pass cost is lane-width independent below 128
and NO channel-packing rearrangement can recover the modeled 6x — the
roofline model should charge the dot at n=128 regardless of occupancy, and
the gather is construction-bound. If dot21 << dot128, a packed 126-lane
layout has (dot128 - dot21) x n_chunks of real headroom.

  python scripts/probe_point_gather.py [--cpu] [--steps 20] [--repeats 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_app_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from roofline import build_points_planes
    from torch_renderer_tpu.rasterize.binning import (
        _NO_SLOT,
        _slot_gather,
        _slot_onehot,
        _split3,
        gather_rank_channels,
    )

    (_, gplanes, pbins, Pmax, _, _, _, _, B, T, N) = build_points_planes()
    C = gplanes.shape[-1]

    # replicate gather_rank_channels' chunking exactly
    vmem_budget = 16_000_000
    t_chunk = max(1, vmem_budget // (Pmax * N))
    if (t_chunk + 1) * Pmax * N <= int(1.1 * vmem_budget):
        t_chunk += 1
    t_chunk = min(T, t_chunk)
    n_chunks = -(-T // t_chunk)
    t_chunk = -(-T // n_chunks)
    padt = n_chunks * t_chunk - T
    slot_p = jnp.pad(pbins.slot, ((0, 0), (0, padt), (0, 0)),
                     constant_values=_NO_SLOT)
    slot_c = jnp.swapaxes(slot_p.reshape(B, n_chunks, t_chunk, N), 0, 1)
    print(f"bench shapes: B={B} T={T} N={N} Pmax={Pmax} C={C} (3C={3 * C}); "
          f"t_chunk={t_chunk} n_chunks={n_chunks}; "
          f"onehot {n_chunks * B * t_chunk * Pmax * N / 1e9:.2f}G elems total")

    def scan_time(fn, x0):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(c)
                dep = sum(jnp.sum(l).astype(jnp.float32)
                          for l in jax.tree.leaves(out))
                return jax.tree.map(
                    lambda a: a + (1e-30 * dep).astype(a.dtype), c
                ), ()

            cf, _ = jax.lax.scan(body, x, None, length=args.steps)
            return cf

        jax.block_until_ready(run(x0))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best / args.steps * 1e3

    floor = scan_time(lambda p: jnp.sum(p), gplanes)
    t_full = scan_time(
        lambda p: gather_rank_channels(p, pbins, Pmax), gplanes) - floor

    # one REAL chunk: construct + dot fused (slot rides the carry as f32 so
    # the scan dependence doesn't touch the planes operand)
    slot0f = slot_c[0].astype(jnp.float32)

    def fused1(sf):
        return _slot_gather(sf.astype(jnp.int32), gplanes, Pmax)

    t_fused1 = scan_time(fused1, slot0f) - floor

    def onehot1(sf):
        return jnp.sum(
            _slot_onehot(sf.astype(jnp.int32), Pmax).astype(jnp.float32))

    t_onehot1 = scan_time(onehot1, slot0f) - floor

    # dot-only on a prematerialized one-hot (same HBM read for all three
    # lane widths; differences isolate the MXU pass's lane cost)
    oh0 = _slot_onehot(slot_c[0], Pmax)              # (B, t_chunk, Pmax, N)
    hi, mid, lo = _split3(gplanes)
    packed21 = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    packed126 = jnp.tile(packed21, (1, 1, 6))
    packed128 = jnp.pad(packed126, ((0, 0), (0, 0), (0, 2)))

    def dot_only(packed):
        return jax.lax.dot_general(
            oh0, packed, (((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    t_dot21 = scan_time(dot_only, packed21) - floor
    t_dot126 = scan_time(dot_only, packed126) - floor
    t_dot128 = scan_time(dot_only, packed128) - floor

    oh_bytes = oh0.size * 2 / 1e6
    print(f"floor            {floor:8.3f} ms")
    print(f"full gather      {t_full:8.3f} ms   ({n_chunks} chunks)")
    print(f"fused 1 chunk    {t_fused1:8.3f} ms   x{n_chunks} = "
          f"{t_fused1 * n_chunks:.2f} ms")
    print(f"onehot 1 chunk   {t_onehot1:8.3f} ms   x{n_chunks} = "
          f"{t_onehot1 * n_chunks:.2f} ms")
    print(f"dot-in-situ      {t_fused1 - t_onehot1:8.3f} ms/chunk "
          f"(fused - onehot)")
    print(f"dot n=21         {t_dot21:8.3f} ms/chunk  (+{oh_bytes:.0f} MB "
          f"onehot HBM read)")
    print(f"dot n=126        {t_dot126:8.3f} ms/chunk")
    print(f"dot n=128        {t_dot128:8.3f} ms/chunk")
    dlane = t_dot128 - t_dot21
    lane_free = abs(dlane) < 0.25 * max(t_dot128, t_dot21)
    print(
        "verdict:",
        "MXU pass cost is lane-width independent <=128 — channel packing "
        "has no headroom; the gather is construction-bound"
        if lane_free else
        f"lane width matters — ~{dlane * n_chunks:.2f} ms headroom per "
        "forward for a packed 126-lane layout",
    )


if __name__ == "__main__":
    main()
