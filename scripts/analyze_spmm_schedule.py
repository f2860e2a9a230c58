"""Offline traffic analysis of the super-row SpMM slot schedule.

Reports, per sampling/resolution, what the slot-scheduled kernel
(`ops/pallas_spmm._slot_schedule`) saves over the plain union kernel:

- union blocks per super-row (plain kernel's HBM DMAs)
- scheduled NEW blocks (actual HBM DMAs), VMEM copies, free stays
- x-block HBM multiplicity before/after (x bytes read / x size)
- consecutive-column run structure (how coalescible the DMAs are)

Design-decision record (measured on HEALPix knn-20 graphs):
- nested ordering beats RCM reordering for union sizes (11.9 vs 13.8
  blocks/super-row at HEALPix-64), so no node reordering is used;
- the two-parity-buffer schedule reaches x-mult ~2.6 at HEALPix-64/128
  (from 5.9); a full-residency "ghost stay" variant reaches only ~2.5,
  not worth the complexity;
- unions decompose into ~1.7-block consecutive runs, so run-coalesced
  DMAs save little — per-body DMA-op count is the remaining lever.

Usage: python scripts/analyze_spmm_schedule.py [--subdivisions 16 64 ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def runs(sorted_cols):
    """Maximal consecutive runs [(start, length), ...] of sorted ints."""
    out = []
    start = prev = None
    for c in sorted_cols:
        if prev is not None and c == prev + 1:
            prev = c
            continue
        if prev is not None:
            out.append((start, prev - start + 1))
        start = prev = c
    if prev is not None:
        out.append((start, prev - start + 1))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--knn", type=int, default=20)
    ap.add_argument("--rows-per-super", type=int, default=2)
    ap.add_argument("--block-size", type=int, default=128)
    args = ap.parse_args()

    from deepsphere_weather_tpu.ops.pallas_spmm import (_slot_schedule,
                                                        _super_m_tile)
    from deepsphere_weather_tpu.sphere.graph import build_graph

    bs, R = args.block_size, args.rows_per_super
    for subdiv in args.subdivisions:
        g = build_graph("healpix", {"subdivisions": subdiv, "nest": True},
                        k=args.knn)
        L = g.L.tocsr()
        nb = (L.shape[0] + bs - 1) // bs
        n_s = (nb + R - 1) // R
        sets = []
        for s in range(n_s):
            lo = s * R * bs
            hi = min((s + 1) * R * bs, L.shape[0])
            sets.append(np.unique(
                L.indices[L.indptr[lo]:L.indptr[hi]] // bs))
        max_u = max(len(c) for c in sets)
        _, plans = _slot_schedule(sets, max_u)
        n_union = sum(len(c) for c in sets)
        n_new = sum(len(p[2]) for p in plans)
        n_cp = sum(len(p[1]) for p in plans)
        n_stay = sum(len(p[0]) for p in plans)
        nur = float(np.mean([len(runs(list(c))) for c in sets]))
        # full HBM traffic model at the bench column count (bf16 x):
        # the scheduled kernel's grid is (n_mt, n_s) with super-rows
        # fastest, so the A super-row blocks are re-fetched from HBM
        # n_mt times per matvec (the plain kernel's m-fast grid order
        # fetches A once) — when the VMEM budget forces m_tile < M,
        # the A re-reads can offset the x-traffic savings
        M = 1024
        import jax.numpy as jnp
        mt = _super_m_tile(max_u, R, bs, M, jnp.bfloat16, jnp.bfloat16, M)
        n_mt = M // mt
        a_bytes = n_s * R * bs * max_u * bs * 2
        x_bytes = n_new * bs * mt * 2 * n_mt        # news re-issue per pass
        o_bytes = n_s * R * bs * M * 2
        tot = n_mt * a_bytes + x_bytes + o_bytes
        print(f"HEALPix-{subdiv} R={R} knn={args.knn}: "
              f"n_s={n_s} max_u={max_u} | "
              f"union/sr={n_union/n_s:.1f} ({nur:.1f} runs) -> "
              f"new/sr={n_new/n_s:.1f} cp/sr={n_cp/n_s:.1f} "
              f"stay/sr={n_stay/n_s:.1f} | "
              f"x-mult {n_union/nb:.2f} -> {n_new/nb:.2f} | "
              f"bf16 M={M}: mt={mt} n_mt={n_mt} "
              f"A={n_mt*a_bytes/1e6:.0f} x={x_bytes/1e6:.0f} "
              f"out={o_bytes/1e6:.0f} total={tot/1e6:.0f} MB "
              f"(roofline ~{tot/819e9*1e3:.2f} ms at 819 GB/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
