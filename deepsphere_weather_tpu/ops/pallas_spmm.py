"""Pallas TPU block-sparse SpMM for large-graph Laplacians.

Replaces the reference's cuSPARSE `torch.sparse.mm` hot path
(reference: modules/layers.py:164-167) for graphs too large for a dense
operator (HEALPix-64+: 49k nodes, SURVEY.md §2.13).

Design: nested HEALPix (and Morton-ordered meshes generally) give the knn
Laplacian strong spatial block structure, so the matrix is stored as
**BCSR with dense MXU-tile blocks** (128x128 by default). The kernel runs
a grid over (row_block, m_tile); within a grid step it walks the row
block's nonzero slots itself, accumulating `y[i] += A[i, b] @ x[col(i, b)]`
on the MXU while a deep ring of x-block DMAs from HBM — steered by
scalar-prefetched block-column indices (pltpu.PrefetchScalarGridSpec) —
keeps several copies in flight (the per-block compute is far shorter than
one DMA). Rows are padded to the max block count per row-block with zero
blocks, keeping shapes static.

The backward pass multiplies by the transpose operator; the normalized knn
Laplacian is symmetric so the same operator is reused (a transposed BCSR
can be supplied for non-symmetric operators like the cotan Laplacian).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ["BlockSparseOperator", "bcsr_from_scipy",
           "bcsr_super_from_scipy"]

_BS = 128  # MXU-native block size
# DSW_SPMM_BATCHED_WAIT=1 collapses the scheduled kernel's per-transfer
# DMA wait loop into ONE byte-counting semaphore wait (A/B knob; flip to
# default after silicon validation via scripts/validate_tpu_kernels.py)
_BATCHED_WAIT = os.environ.get("DSW_SPMM_BATCHED_WAIT", "0") == "1"
# DSW_SPMM_MM_CHUNK splits the super-row deep matmul along mt (probe
# knob; 0 = single matmul — measured best, see docs/benchmarks/README.md)
_MM_CHUNK = int(os.environ.get("DSW_SPMM_MM_CHUNK", "0"))

# word0 packing radix of the slot schedule: word0 = n_new + RADIX*n_cp.
# Shared by _pack_schedule (encode), _spmm_kernel_super_sched (decode) and
# tests/test_ops.py's schedule replay. Bounds the per-super-row transfer
# counts, hence max_u (union slots) must stay < _SCHED_RADIX.
_SCHED_RADIX = 1024


def _cast_f32_to(vals: np.ndarray, dtype) -> np.ndarray:
    """Fast fp32 -> {fp32, bf16} cast for FINITE arrays.

    ml_dtypes' astype converts elementwise (~50 s for the HEALPix-64
    operator blocks); bf16 is just the upper half of the fp32 bits, so
    round-to-nearest-even on a uint32 view is a vectorized equivalent.
    """
    dt = np.dtype(dtype)
    if dt == vals.dtype:
        return vals
    if vals.dtype == np.float32 and dt.itemsize == 2 and "bfloat16" in dt.name:
        u = vals.view(np.uint32)
        r = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)
        return r.view(dt)
    return vals.astype(dt)


def _nonzero_block_mask(vals: np.ndarray) -> np.ndarray:
    """[n_rb, max_nb] bool: block has any nonzero entry.

    Bit test on an integer view (any float is zero iff all bits but the
    sign are zero) — `vals.astype(np.float32)` on ml_dtypes bf16 arrays
    measured ~50 s at HEALPix-64 against ~1 s for the view."""
    w = vals.view(f"u{vals.dtype.itemsize}")
    sign_off = (1 << (8 * vals.dtype.itemsize - 1)) - 1
    return ((w & sign_off) != 0).reshape(vals.shape[0], vals.shape[1],
                                         -1).any(axis=-1)


def bcsr_from_scipy(mat, block_size: int = _BS, dtype=np.float32):
    """Convert scipy sparse [N, N] to padded BCSR arrays.

    Returns (vals [n_rb, max_nb, bs, bs], cols [n_rb, max_nb] int32, n_pad)
    where n_pad is the zero-padded matrix dimension (multiple of bs).
    Padding slots replicate block-column 0 with zero values.

    `dtype` sets the stored A-block precision: bf16 halves the A-block DMA
    bytes (the kernel is HBM-bandwidth-bound) and costs nothing for bf16
    activations, whose MXU passes round operands to bf16 anyway.
    """
    from scipy import sparse

    n = mat.shape[0]
    bs = block_size
    n_pad = ((n + bs - 1) // bs) * bs
    coo = mat.tocoo()
    rb = coo.row // bs
    cb = coo.col // bs
    n_rb = n_pad // bs
    # unique nonzero blocks per row-block (fully vectorized — a per-nnz
    # Python loop took minutes at HEALPix-128's 4M nonzeros)
    block_ids = rb.astype(np.int64) * n_rb + cb
    uniq, inv = np.unique(block_ids, return_inverse=True)
    u_rb = (uniq // n_rb).astype(np.int64)
    u_cb = (uniq % n_rb).astype(np.int32)
    counts = np.bincount(u_rb, minlength=n_rb)
    max_nb = max(int(counts.max()), 1)

    # slot of each unique block within its row-block: uniq is sorted by
    # (row_block, col_block), so slot = unique-index − first-unique-index
    # of its row-block
    first = np.searchsorted(u_rb, np.arange(n_rb))
    slot_of_uniq = (np.arange(len(uniq)) - first[u_rb]).astype(np.int64)

    vals = np.zeros((n_rb, max_nb, bs, bs), dtype=np.float32)
    cols = np.zeros((n_rb, max_nb), dtype=np.int32)
    cols[u_rb, slot_of_uniq] = u_cb
    np.add.at(vals, (rb, slot_of_uniq[inv], coo.row % bs, coo.col % bs),
              coo.data)
    return _cast_f32_to(vals, dtype), cols, n_pad


def _slot_schedule(ucols_list, max_u):
    """Two-parity-buffer VMEM slot schedule for the super-row kernel.

    The kernel keeps TWO union x buffers that alternate by super-row
    parity; the union of super-row s lives in buffer s%2 at HOST-ASSIGNED
    slots. For s>=2, blocks already resident in buffer s%2 from step s-2
    STAY at their slot (zero traffic); blocks present in buffer (s-1)%2
    are COPIED (VMEM->VMEM, ~order-of-magnitude cheaper than HBM); the
    rest are NEW (HBM DMA). Nested-HEALPix ordering makes adjacent
    super-row unions overlap heavily, so this cuts the x-block HBM
    multiplicity from ~5.9x to ~2.6x at HEALPix-64/128 with ~3 VMEM
    copies per super-row — fully host-precomputed, so the kernel stays
    free of dynamic slot-allocation control flow.

    Returns (slot_maps, plans): slot_maps[s] maps block-col -> slot;
    plans[s] = (stay [(col, slot)], copy [(src_slot, dst_slot)],
    new [(col, slot)]).
    """
    slot_maps, plans = [], []
    for s, cols in enumerate(ucols_list):
        assert len(cols) <= max_u
        stay, cp, new = [], [], []
        pinned = {}
        if s >= 2:
            prev2 = slot_maps[s - 2]
            for c in cols:
                if c in prev2:
                    pinned[c] = prev2[c]
                    stay.append((int(c), prev2[c]))
        taken = set(pinned.values())
        free = [sl for sl in range(max_u) if sl not in taken]
        fi = 0
        prev1 = slot_maps[s - 1] if s >= 1 else {}
        m = dict(pinned)
        for c in cols:
            if c in pinned:
                continue
            sl = free[fi]
            fi += 1
            m[c] = sl
            if c in prev1:
                cp.append((prev1[c], sl))
            else:
                new.append((int(c), sl))
        slot_maps.append(m)
        plans.append((stay, cp, new))
    # rows 0 and 1 must FULLY initialize their parity buffers: unassigned
    # slots would otherwise hold uninitialized VMEM, and although the deep
    # matmul multiplies them by zero A blocks, garbage NaNs would poison
    # the accumulator (0 * NaN = NaN). Cover them with duplicate-source
    # DMAs (same trick as the union kernel's padding slots). Each m-pass
    # re-enters at s=0, so this also refreshes both buffers per pass.
    for s in range(min(2, len(plans))):
        stay, cp, new = plans[s]
        covered = ({sl for _c, sl in new} | {dst for _src, dst in cp}
                   | {sl for _c, sl in stay})
        dup = int(ucols_list[s][0])
        new.extend((dup, sl) for sl in range(max_u) if sl not in covered)
    return slot_maps, plans


def _pack_schedule(plans, max_u):
    """Pack (copy, new) plans into the kernel's scalar-prefetch table.

    Row s: word0 = n_new + _SCHED_RADIX*n_cp; then n_new packed NEW entries
    (col*max_u + dst_slot) immediately followed by n_cp packed COPY
    entries (src_slot*max_u + dst_slot) — copies start at the DYNAMIC
    offset 1+n_new, keeping the table at width 1 + max(n_new+n_cp)
    (SMEM is the scarce resource: prefetching wide per-row metadata
    overflowed it at HEALPix-128).
    """
    mx_tot = max(len(cp) + len(new) for _, cp, new in plans)
    sched = np.zeros((len(plans), 1 + mx_tot), dtype=np.int32)
    for s, (_stay, cp, new) in enumerate(plans):
        if len(new) >= _SCHED_RADIX or len(cp) >= _SCHED_RADIX:
            raise ValueError(
                f"super-row {s} needs {len(new)} new + {len(cp)} copy "
                f"transfers, but the packed schedule encodes counts < "
                f"{_SCHED_RADIX} (word0 = n_new + {_SCHED_RADIX}*n_cp). "
                f"Graphs with union width max_u >= {_SCHED_RADIX} are "
                "unsupported — reduce rows_per_super or the graph degree.")
        sched[s, 0] = len(new) + _SCHED_RADIX * len(cp)
        for j, (c, sl) in enumerate(new):
            sched[s, 1 + j] = c * max_u + sl
        for j, (src, dst) in enumerate(cp):
            sched[s, 1 + len(new) + j] = src * max_u + dst
    return sched


def bcsr_super_from_scipy(mat, block_size: int = _BS, rows_per_super: int = 4,
                          dtype=np.float32, _bcsr=None):
    """Convert scipy sparse [N, N] to SUPER-ROW BCSR.

    Groups `rows_per_super` consecutive row-blocks into a super-row and
    precomputes, per super-row, the UNION of referenced block-columns: the
    kernel then DMAs each x block once per super-row instead of once per
    row-block. On nested-HEALPix knn graphs adjacent row-blocks share most
    of their neighborhood, so the union is ~½ (R=4) to ~⅓ (R=8) of the
    per-row total — and the x traffic is the dominant HBM cost of the SpMM.

    Union members are placed at SCHEDULED slots (`_slot_schedule`): the
    slot assignment maximizes cross-super-row residency in the kernel's
    ping-pong buffers, so consecutive super-rows re-DMA only the blocks
    that actually change. The plain union kernel (used by the row-sharded
    SPMD lowering, where schedule continuity would break at shard
    boundaries) is slot-order-agnostic and reads the same layout.

    The layout is built for an ALL-STATIC-INDEX kernel (this Pallas/Mosaic
    version silently miscompiles dynamically-indexed VMEM reads feeding the
    MXU, and >4-D BlockSpec blocks), and for ONE DEEP MATMUL per row: row
    r's blocks are horizontally concatenated over the union slots —
    svals[s, r, :, u*bs:(u+1)*bs] is row r's block for union slot u
    (zero where row r does not touch that slot's column) — so
    y_r = svals[s, r] @ vstack(x_union) runs as a single [bs, max_u*bs] @
    [max_u*bs, mt] MXU contraction (a per-slot loop of shallow
    [bs,bs]@[bs,mt] matmuls measured ~2x slower: pipeline-fill bound).

    Returns (svals [n_s, R, bs, max_u*bs], use [n_s, R*max_u] int32,
    wait_row [n_s, max_u] int32, ucols [n_s, max_u] int32,
    ucount [n_s] int32, sched [n_s, W] int32, n_pad).
    - use: 1 where row r has a nonzero block for union slot u (metadata —
      the deep matmul multiplies zero blocks; tests use it).
    - wait_row: first row (within the super-row) using each union slot;
      R for never-used padding slots (metadata for tests).
    - ucount: number of REAL union slots per super-row; padding slots
      repeat a real block-column (their DMA is started and waited
      like any other — duplicate sources are harmless).
    - sched: packed stay/copy/new schedule (`_pack_schedule`).
    """
    # _bcsr: precomputed (vals, cols, n_pad) from bcsr_from_scipy, so
    # from_scipy does not pay the conversion twice
    vals, cols, n_pad = (_bcsr if _bcsr is not None else
                         bcsr_from_scipy(mat, block_size=block_size,
                                         dtype=dtype))
    n_rb, max_nb = cols.shape
    bs = block_size
    R = rows_per_super
    n_s = (n_rb + R - 1) // R
    n_rb_pad = n_s * R
    if n_rb_pad != n_rb:
        vals = np.concatenate(
            [vals, np.zeros((n_rb_pad - n_rb,) + vals.shape[1:],
                            dtype=vals.dtype)], axis=0)
        cols = np.concatenate(
            [cols, np.zeros((n_rb_pad - n_rb, max_nb), dtype=cols.dtype)],
            axis=0)
    # real (non-padding) slots: padding replicates block-col 0 with zero vals
    real = _nonzero_block_mask(vals)

    ucols_list = [np.sort(np.unique(cols[s * R:(s + 1) * R]
                                    [real[s * R:(s + 1) * R]]))
                  if real[s * R:(s + 1) * R].any() else
                  np.zeros(1, dtype=cols.dtype)
                  for s in range(n_s)]
    max_u = max(u.size for u in ucols_list)
    slot_maps, plans = _slot_schedule(ucols_list, max_u)
    sched = _pack_schedule(plans, max_u)
    svals = np.zeros((n_s, R, bs, max_u * bs), dtype=vals.dtype)
    use = np.zeros((n_s, R * max_u), dtype=np.int32)
    ucols = np.zeros((n_s, max_u), dtype=np.int32)
    ucount = np.zeros((n_s,), dtype=np.int32)
    wait_row = np.full((n_s, max_u), R, dtype=np.int32)
    # perm[s, rank] = scheduled slot of the rank-th (sorted) union member
    perm = np.zeros((n_s, max_u), dtype=np.int64)
    for s, u in enumerate(ucols_list):
        sm = slot_maps[s]
        slots = np.array([sm[c] for c in u], dtype=np.int64)
        perm[s, : u.size] = slots
        ucols[s] = u[-1]              # padding slots: any real source col
        ucols[s, slots] = u
        ucount[s] = u.size

    # vectorized slot lookup + block fill (a per-block Python loop with
    # ml_dtypes bf16 strided assignments measured 142 s at HEALPix-64):
    # union slot = searchsorted position of each real block's column inside
    # its super-row's sorted union, found in ONE global searchsorted over
    # keys (super_row * n_cb + col), strictly increasing across super-rows
    g_idx, b_idx = np.nonzero(real)
    s_idx, r_idx = g_idx // R, g_idx % R
    c_idx = cols[g_idx, b_idx].astype(np.int64)
    n_cb = n_pad // bs                     # block-column count (cols < n_cb)
    lens = np.array([u.size for u in ucols_list], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    keys = (np.concatenate(ucols_list).astype(np.int64)
            + np.repeat(np.arange(n_s, dtype=np.int64), lens) * n_cb)
    rank = np.searchsorted(keys, s_idx * n_cb + c_idx) - starts[s_idx]
    slot = perm[s_idx, rank]          # union rank -> scheduled slot

    # fill through a same-width integer view: ml_dtypes bf16 assignment is
    # elementwise-slow, raw uint16 moves are memcpys
    itype = f"u{vals.dtype.itemsize}"
    sv = svals.view(itype).reshape(n_s, R, bs, max_u, bs)
    sv[s_idx, r_idx, :, slot, :] = vals.view(itype)[g_idx, b_idx]
    use[s_idx, r_idx * max_u + slot] = 1
    np.minimum.at(wait_row, (s_idx, slot), r_idx.astype(np.int32))
    return svals, use, wait_row, ucols, ucount, sched, n_pad


def _spmm_kernel(cols_ref, a_ref, x_ref, o_ref):
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # MXU accumulation must be 32-bit; bf16 inputs are upcast in VMEM
    o_ref[:] += jnp.dot(a_ref[0, 0].astype(jnp.float32),
                        x_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)


def _spmm_kernel_dma(cols_ref, a_ref, x_hbm, o_ref, x_buf, sem,
                     *, precision, out_dtype):
    """One grid step per (row_block, m_tile): the kernel walks this row
    block's nonzero slots itself, double-buffering the x-block DMAs from
    HBM steered by the prefetched block-column indices. Collapsing the nz
    axis out of the grid removes the per-grid-step overhead that dominated
    the v1 kernel.

    `precision` matters: TPU matmuls default to one bf16 pass (~4e-3
    relative error); fp32 callers get Precision.HIGHEST for exact fp32
    results, bf16 callers keep the fast default."""
    i = pl.program_id(0)
    m = pl.program_id(1)
    nb = a_ref.shape[1]
    bs = a_ref.shape[2]
    mt = o_ref.shape[1]
    depth = x_buf.shape[0]      # DMA ring depth (outstanding copies)

    def get_dma(slot, b):
        c = cols_ref[i, b]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * bs, bs), pl.ds(m * mt, mt)],
            x_buf.at[slot],
            sem.at[slot],
        )

    # prologue: fill the ring — each x-block DMA is small (bs*mt), so the
    # loop is DMA-latency-bound unless several copies are in flight
    for b0 in range(min(depth, nb)):       # static bounds
        get_dma(b0, b0).start()

    # matched operand dtypes feed the MXU directly (bf16 in, fp32
    # accumulate) — upcasting in VMEM would burn VPU cycles every block;
    # mismatched dtypes are reconciled to the precision regime's dtype
    if a_ref.dtype == x_buf.dtype:
        cast = None
    elif precision == jax.lax.Precision.HIGHEST:
        cast = jnp.float32
    else:
        cast = jnp.bfloat16

    # fully unrolled over the (static, small) nz-slot count: the per-block
    # work is ~0.1 us of MXU time, so loop control and DMA bookkeeping
    # dominate — unrolling removes the loop scalar overhead entirely
    acc = jnp.zeros((bs, mt), jnp.float32)
    for b in range(nb):
        slot = b % depth
        get_dma(slot, b).wait()
        a_b, x_b = a_ref[0, b], x_buf[slot]
        if cast is not None:
            a_b, x_b = a_b.astype(cast), x_b.astype(cast)
        acc = acc + jnp.dot(a_b, x_b,
                            preferred_element_type=jnp.float32,
                            precision=precision)
        if b + depth < nb:
            get_dma(slot, b + depth).start()

    # accumulate fp32; one cast on the final store — bf16 callers get a
    # bf16 output block (half the o-write bytes and no post-kernel cast)
    o_ref[:] = acc.astype(out_dtype)


def _spmm_kernel_super(ucols_ref, a_ref, x_hbm, o_ref,
                       xbuf0, sem0, xbuf1, sem1,
                       *, rows_per_super, precision, out_dtype, n_mt):
    """Super-row SpMM: one grid step covers R row-blocks; their x
    block-column UNION is DMAed once into a ping-pong VMEM union buffer:

    - buffers alternate by grid-step parity; each body first starts the
      NEXT step's union DMAs into the other buffer (freed by the previous
      step), so the next step's x traffic overlaps this step's compute;
    - every slot is then waited UNCONDITIONALLY (predicated `pl.when`
      starts/waits measured ~4 µs of scalar overhead per body — more than
      the ~1 µs the skipped work costs);
    - each row is ONE deep matmul: the union buffer is a single
      [max_u*bs, mt] matrix (slot DMAs land at static row offsets) and row
      r's A blocks are pre-concatenated to [bs, max_u*bs], so
      y_r = A_r @ X_union runs at full MXU depth (a per-slot loop of
      shallow [bs,bs]@[bs,mt] matmuls measured ~2x slower).

    EVERY vector-memory and semaphore index in the kernel is STATIC (the
    parity split duplicates the body under `pl.when` instead of indexing
    buffers dynamically): this Pallas/Mosaic version hangs on
    dynamically-indexed DMA semaphores and silently miscompiles
    dynamically-indexed VMEM reads that feed the MXU (and >4-D BlockSpec
    blocks). Scalars steer only HBM source addresses, which is supported.
    """
    s = pl.program_id(0)
    m = pl.program_id(1)
    R = rows_per_super
    bs = a_ref.shape[2]
    mt = o_ref.shape[1]
    max_u = a_ref.shape[3] // bs
    n_s = pl.num_programs(0)
    lin = s * n_mt + m
    s_nxt = (lin + 1) // n_mt
    m_nxt = (lin + 1) % n_mt

    def union_dma(buf, sem_, slot, s_, m_):
        c = ucols_ref[s_, slot]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * bs, bs), pl.ds(m_ * mt, mt)],
            buf.at[pl.ds(slot * bs, bs)],
            sem_.at[slot],
        )

    def start_all(buf, sem_, s_, m_):
        for u in range(max_u):          # static, unconditional
            union_dma(buf, sem_, u, s_, m_).start()

    if a_ref.dtype == xbuf0.dtype:
        cast = None
    elif precision == jax.lax.Precision.HIGHEST:
        cast = jnp.float32
    else:
        cast = jnp.bfloat16

    def body(cur_buf, cur_sem, oth_buf, oth_sem):
        # the first body starts its own union; every body then prefetches
        # the next step's union into the other buffer before computing
        @pl.when(lin == 0)
        def _():
            start_all(cur_buf, cur_sem, s, m)

        @pl.when(lin + 1 < n_s * n_mt)
        def _():
            start_all(oth_buf, oth_sem, s_nxt, m_nxt)

        # wait all slots (started by the previous body — normally done by
        # now, so these are cheap semaphore decrements)
        for u in range(max_u):
            union_dma(cur_buf, cur_sem, u, s, m).wait()

        x_all = cur_buf[:]              # [max_u*bs, mt]
        a_all = a_ref[0].reshape(R * bs, max_u * bs)
        if cast is not None:
            x_all = x_all.astype(cast)
            a_all = a_all.astype(cast)
        # ONE [R*bs, max_u*bs] @ [max_u*bs, mt] matmul for the whole
        # super-row (see _spmm_kernel_super_sched)
        o_ref[...] = jnp.dot(
            a_all, x_all, preferred_element_type=jnp.float32,
            precision=precision).astype(out_dtype)

    @pl.when(lin % 2 == 0)
    def _():
        body(xbuf0, sem0, xbuf1, sem1)

    @pl.when(lin % 2 == 1)
    def _():
        body(xbuf1, sem1, xbuf0, sem0)


def _spmm_kernel_super_sched(sched_ref, a_ref, x_hbm, o_ref,
                             xbuf0, sem0, xbuf1, sem1,
                             *, rows_per_super, precision, out_dtype):
    """Slot-scheduled super-row SpMM (see `_slot_schedule`).

    Differences from `_spmm_kernel_super`:
    - the grid is (n_mt, n_s) with SUPER-ROWS FASTEST, so consecutive grid
      steps walk adjacent super-rows of the same m-pass and the ping-pong
      buffers carry residency across steps (m-fast order would invalidate
      the cache every step: different m tiles read different x columns);
    - per super-row the kernel executes only the host-packed schedule:
      n_new HBM DMAs plus n_cp VMEM->VMEM copies from the other parity
      buffer, via dynamic-trip-count `fori_loop`s steered by the
      scalar-prefetched table (both verified to compile and run correctly
      on this Mosaic: shared DMA semaphore, scalar-steered HBM sources,
      scalar-steered VMEM source AND destination offsets);
    - STAY blocks (resident from step s-2) cost nothing and appear in no
      loop: the scheduler pinned them to their old slots;
    - schedule rows 0 and 1 are cold (all NEW / no stays), which also
      makes every m-pass boundary correct: s wraps to 0 with the new m.

    Ordering invariant: each body WAITS its own transfers BEFORE starting
    the next step's — the next step's copies read this buffer, which is
    only final after this body's waits (the plain kernel starts first;
    here that would race).
    """
    m = pl.program_id(0)
    s = pl.program_id(1)
    n_mt = pl.num_programs(0)
    n_s = pl.num_programs(1)
    R = rows_per_super
    bs = a_ref.shape[2]
    mt = o_ref.shape[1]
    max_u = a_ref.shape[3] // bs
    lin = m * n_s + s
    s_nxt = (lin + 1) % n_s
    m_nxt = (lin + 1) // n_s

    def start_new(oth_buf, oth_sem, s_, m_):
        # new blocks: HBM -> scheduled slot of the destination buffer.
        # Issued only after this step's waits (see body): an earlier
        # variant issued them pre-wait and raced the previous step's
        # in-flight copies reading the destination buffer
        w0 = sched_ref[s_, 0]
        n_new = w0 % _SCHED_RADIX

        def new_body(j, carry):
            v = sched_ref[s_, 1 + j]
            c = v // max_u
            sl = v % max_u
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(c * bs, bs), pl.ds(m_ * mt, mt)],
                oth_buf.at[pl.ds(sl * bs, bs)],
                oth_sem.at[0]).start()
            return carry

        lax.fori_loop(0, n_new, new_body, 0)

    def start_cp(cur_buf, oth_buf, oth_sem, s_):
        # overlap blocks: VMEM -> VMEM from the other parity buffer.
        # These READ cur_buf, which is only final after this step's waits
        w0 = sched_ref[s_, 0]
        n_new = w0 % _SCHED_RADIX
        n_cp = w0 // _SCHED_RADIX

        def cp_body(j, carry):
            v = sched_ref[s_, 1 + n_new + j]
            src = v // max_u
            dst = v % max_u
            pltpu.make_async_copy(
                cur_buf.at[pl.ds(src * bs, bs)],
                oth_buf.at[pl.ds(dst * bs, bs)],
                oth_sem.at[0]).start()
            return carry

        lax.fori_loop(0, n_cp, cp_body, 0)

    def wait_sched(cur_buf, cur_sem):
        # all transfers are [bs, mt] in x's dtype, so one same-shaped
        # descriptor serves every wait on the shared byte-counting sem
        w0 = sched_ref[s, 0]
        total = w0 % _SCHED_RADIX + w0 // _SCHED_RADIX
        if _BATCHED_WAIT:
            # ONE semaphore wait for the whole schedule: the shared DMA
            # sem counts bytes, every transfer is [bs, mt], so waiting
            # total * bs * mt * itemsize bytes is exactly equivalent to
            # the per-transfer wait loop — minus `total`-1 scalar-core
            # wait ops on the issue-bound DMA side (the round-4 analysis
            # batched-waits lever, docs/benchmarks/README.md)
            esize = jnp.dtype(xbuf0.dtype).itemsize
            pltpu.semaphore_wait(cur_sem.at[0], total * bs * mt * esize)
        else:
            def wait_body(j, carry):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, bs), pl.ds(0, mt)],
                    cur_buf.at[pl.ds(0, bs)],
                    cur_sem.at[0]).wait()
                return carry

            lax.fori_loop(0, total, wait_body, 0)

    if a_ref.dtype == xbuf0.dtype:
        cast = None
    elif precision == jax.lax.Precision.HIGHEST:
        cast = jnp.float32
    else:
        cast = jnp.bfloat16

    def body(cur_buf, cur_sem, oth_buf, oth_sem):
        @pl.when(lin == 0)
        def _():
            start_new(cur_buf, cur_sem, s, m)
            start_cp(oth_buf, cur_buf, cur_sem, s)   # rows 0/1: no copies

        wait_sched(cur_buf, cur_sem)

        # next step's transfers are issued only AFTER this step's waits:
        # the waits cover the COPY DMAs issued last step, which READ the
        # other parity buffer — a NEW DMA whose destination slot equals an
        # in-flight copy's source slot would corrupt that read (a real
        # write-after-read DMA race: 1 of 12 news collides in the first
        # HEALPix-16 knn-20 m-pass). Issuing news before the waits
        # measured perf-neutral anyway (round-3 notes,
        # docs/benchmarks/README.md), so ordering buys safety for free.
        @pl.when(lin + 1 < n_mt * n_s)
        def _():
            start_new(oth_buf, oth_sem, s_nxt, m_nxt)
            start_cp(cur_buf, oth_buf, oth_sem, s_nxt)

        a_all = a_ref[0].reshape(R * bs, max_u * bs)
        if cast is not None:
            a_all = a_all.astype(cast)
        # ONE [R*bs, max_u*bs] @ [max_u*bs, mt] matmul for the whole
        # super-row: deeper M fills the MXU pipeline better than R
        # separate per-row matmuls (and loads x_all once).
        # DSW_SPMM_MM_CHUNK splits it along mt so the operand staging of
        # chunk k+1 can overlap the MXU of chunk k (experiment knob; 0 =
        # single matmul)
        chunk = mt if not _MM_CHUNK or mt % _MM_CHUNK else _MM_CHUNK
        for c0 in range(0, mt, chunk):
            x_c = cur_buf[:, c0:c0 + chunk]
            if cast is not None:
                x_c = x_c.astype(cast)
            o_ref[:, c0:c0 + chunk] = jnp.dot(
                a_all, x_c, preferred_element_type=jnp.float32,
                precision=precision).astype(out_dtype)

    @pl.when(lin % 2 == 0)
    def _():
        body(xbuf0, sem0, xbuf1, sem1)

    @pl.when(lin % 2 == 1)
    def _():
        body(xbuf1, sem1, xbuf0, sem0)


def _super_m_tile(max_u: int, R: int, bs: int, m_pad: int,
                  x_dtype, a_dtype, cap: int,
                  budget: int = 15 << 20) -> int:
    """Largest lane-aligned m-tile whose VMEM footprint fits the budget.

    Terms: ping-pong union x buffers, double-buffered A super-row,
    double-buffered output tile, PLUS the kernel's value copies — loading
    `cur_buf[:]` for the deep matmul materializes a full union-buffer
    copy on the scoped-VMEM stack, and the per-row A loads add up to one
    more A-sized copy (an earlier model without those terms OOMed scoped
    vmem on the fp32 path at 12k nodes). When A's stored dtype differs
    from x's, the kernel casts the A rows to the precision regime's dtype
    (fp32 for fp32 x / Precision.HIGHEST, bf16 otherwise — always x's
    dtype), and the resulting value copies are allocated in BOTH parity
    branches of the ping-pong kernel (Mosaic sizes the scoped stack as
    the sum over `pl.when` branches: a bf16-A/fp32-x compile measured
    20.8M of stack against the 16M limit with single-branch terms).
    Branch doubling applies to every dtype combination EXCEPT matched
    bf16: an fp32/fp32 compile at HEALPix-16 (max_u=10, mt=512) measured
    16.34M of stack — exactly the single-branch model (12.84M) plus a
    second set of x/A copies (the fp32 MXU's multi-pass matmul is the
    suspected source) — while matched-bf16 mt=1024 at HEALPix-64
    compiles and runs within the limit, confirming its single-branch
    lowering."""
    x_dt, a_dt = jnp.dtype(x_dtype), jnp.dtype(a_dtype)
    xb, ab = x_dt.itemsize, a_dt.itemsize
    # mirrors the cast selection in _spmm_kernel_super (matvec picks
    # Precision.HIGHEST exactly when x is not bf16)
    a_cast_b = 0 if a_dt == x_dt else xb
    branches = 1 if a_dt == x_dt == jnp.dtype(jnp.bfloat16) else 2
    a_bytes = 2 * R * max_u * bs * bs * ab
    a_copy = branches * R * max_u * bs * bs * (ab + a_cast_b)
    for mt in (1024, 512, 256, 128):
        if mt > cap or m_pad % mt:
            continue
        x_buffers = 2 * max_u * bs * mt * xb
        x_copy = branches * max_u * bs * mt * xb
        out_buffers = 2 * R * bs * mt * xb
        total = x_buffers + x_copy + a_bytes + a_copy + out_buffers
        if total <= budget:
            return mt
    return 128


def _bcsr_super_matmul(svals, steer, x, m_tile,
                       precision=jax.lax.Precision.HIGHEST,
                       scheduled=False):
    """y = A @ x with A in super-row BCSR; x: [n_pad, M] (M % m_tile == 0).
    Output has n_s * R * bs rows (>= n_pad; caller truncates).

    `steer` is the scalar-prefetched DMA-control table: the packed
    stay/copy/new schedule when `scheduled` (slot-resident kernel — full
    rows only: schedule continuity assumes super-row s-1/s-2 ran on this
    device), else the per-slot block-column table `ucols` (slot-order-
    agnostic union kernel — safe under row sharding). Only the chosen
    table is prefetched: SMEM is the scarce resource (prefetching the
    build-time metadata arrays alongside overflowed it at HEALPix-128:
    n_s=768).
    """
    n_s, R, bs, ubs = svals.shape
    max_u = ubs // bs
    n_pad, M = x.shape
    n_mt = M // m_tile
    out_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    cost = pl.CostEstimate(
        flops=2 * n_s * R * bs * ubs * M,
        bytes_accessed=(svals.size * svals.dtype.itemsize * n_mt
                        + n_s * max_u * bs * M * x.dtype.itemsize
                        + n_pad * M * jnp.dtype(out_dtype).itemsize),
        transcendentals=0,
    )
    scratch_shapes = [
        pltpu.VMEM((max_u * bs, m_tile), x.dtype),  # union ping
        pltpu.SemaphoreType.DMA((1 if scheduled else max_u,)),
        pltpu.VMEM((max_u * bs, m_tile), x.dtype),  # union pong
        pltpu.SemaphoreType.DMA((1 if scheduled else max_u,)),
    ]
    if scheduled:
        # super-rows are the FAST grid axis (residency across steps)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_mt, n_s),
            in_specs=[
                pl.BlockSpec((1, R, bs, ubs),
                             lambda m, s, *_: (s, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            ],
            out_specs=pl.BlockSpec((R * bs, m_tile),
                                   lambda m, s, *_: (s, m)),
            scratch_shapes=scratch_shapes,
        )
        kernel_fn = functools.partial(
            _spmm_kernel_super_sched, rows_per_super=R,
            precision=precision, out_dtype=out_dtype)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_s, n_mt),
            in_specs=[
                pl.BlockSpec((1, R, bs, ubs),
                             lambda s, m, *_: (s, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            ],
            out_specs=pl.BlockSpec((R * bs, m_tile), lambda s, m, *_: (s, m)),
            scratch_shapes=scratch_shapes,
        )
        kernel_fn = functools.partial(
            _spmm_kernel_super, rows_per_super=R,
            precision=precision, out_dtype=out_dtype, n_mt=n_mt)
    kernel = pl.pallas_call(
        kernel_fn,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_s * R * bs, M), out_dtype),
        cost_estimate=cost,
    )
    return kernel(steer, svals, x)


def _ring_depth(max_nb: int, bs: int, m_tile: int, dtype) -> int:
    """x-block DMA ring depth: ≤8 outstanding copies within a ~4 MB budget."""
    slot_bytes = bs * m_tile * jnp.dtype(dtype).itemsize
    return max(2, min(max_nb, 8, (4 << 20) // slot_bytes))


def _bcsr_matmul(vals: jnp.ndarray, cols: jnp.ndarray, x: jnp.ndarray,
                 m_tile: int = 256, interpret: bool = False,
                 precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """y = A @ x with A in padded BCSR; x: [n_pad, M] (M multiple of m_tile).

    Output has n_rb*bs rows — A's row extent, which under SPMD row
    sharding is the LOCAL slice while x stays replicated (full rows).

    Grid order (row_block, m_tile, nz_slot): the accumulation dimension is
    INNERMOST so every revisit of an output block is consecutive — the
    Pallas output-revisiting contract for accumulate-in-VMEM patterns.
    """
    n_rb, max_nb, bs, _ = vals.shape
    n_pad, M = x.shape
    n_mt = M // m_tile
    cost = pl.CostEstimate(
        flops=2 * n_rb * max_nb * n_mt * bs * bs * m_tile,
        bytes_accessed=(vals.size * vals.dtype.itemsize
                        + x.size * x.dtype.itemsize + n_pad * M * 4),
        transcendentals=0,
    )

    # bf16 x -> bf16 output (fp32 accumulation stays inside the kernel)
    out_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    if interpret:
        # interpreter path (CPU tests): grid over nz slots, no manual DMA
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rb, n_mt, max_nb),
            in_specs=[
                pl.BlockSpec((1, 1, bs, bs),
                             lambda i, m, b, cols_ref: (i, b, 0, 0)),
                pl.BlockSpec((bs, m_tile),
                             lambda i, m, b, cols_ref: (cols_ref[i, b], m)),
            ],
            out_specs=pl.BlockSpec((bs, m_tile),
                                   lambda i, m, b, cols_ref: (i, m)),
        )
        kernel = pl.pallas_call(
            _spmm_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rb * bs, M), jnp.float32),
            interpret=True,
            cost_estimate=cost,
        )
        return kernel(cols, vals, x).astype(out_dtype)

    # compiled path: one grid step per (row_block, m_tile); the kernel
    # double-buffers x-block DMAs from HBM itself (fp32 accumulator)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rb, n_mt),
        in_specs=[
            # the whole row block of A (all nz slots)
            pl.BlockSpec((1, max_nb, bs, bs),
                         lambda i, m, cols_ref: (i, 0, 0, 0)),
            # x stays in HBM; the kernel DMAs the blocks it needs
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bs, m_tile), lambda i, m, cols_ref: (i, m)),
        scratch_shapes=[
            # DMA ring: enough outstanding x-block copies to hide HBM
            # latency (the per-block compute is far shorter than one DMA),
            # budgeted so the ring leaves VMEM (~16 MB/core) for the
            # double-buffered A row-block and output tile
            pltpu.VMEM((_ring_depth(max_nb, bs, m_tile, x.dtype), bs, m_tile),
                       x.dtype),
            pltpu.SemaphoreType.DMA((_ring_depth(max_nb, bs, m_tile,
                                                 x.dtype),)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_spmm_kernel_dma, precision=precision,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rb * bs, M), out_dtype),
        cost_estimate=cost,
    )
    return kernel(cols, vals, x)


def _pick_tile(m_local: int, cap: int) -> int:
    """Largest lane-aligned m-tile <= cap dividing m_local.

    The cap is the globally-chosen tile (VMEM-budgeted for the super
    kernel by `_super_m_tile`; every smaller lane tile fits the same
    budget, so re-picking for a shard's narrower local M stays safe)."""
    return max(t for t in (1024, 512, 256, 128)
               if t <= max(cap, 128) and m_local % t == 0)


def _shard_axes(spec, dim, mesh, extent):
    """Mesh axes a proposed PartitionSpec shards `dim` over, or None.

    Returns None (replicate) when the dim is unsharded, when `extent`
    does not divide evenly over the axes, or when any axis is missing
    from the mesh (manual/auto axes)."""
    if spec is None or len(spec) <= dim or spec[dim] is None:
        return None
    axes = spec[dim] if isinstance(spec[dim], tuple) else (spec[dim],)
    try:
        n = int(np.prod([mesh.shape[a] for a in axes]))
    except KeyError:
        return None
    return spec[dim] if n > 1 and extent % n == 0 else None


@functools.lru_cache(maxsize=None)
def _partitioned_spmm(kind: str, w: int, m_cap: int, interpret: bool,
                      precision):
    """Build the SPMD-partitionable (and vmappable) SpMM entry point.

    The Pallas launchers are opaque to XLA's sharding propagation: without
    this wrapper a node- (row-) or data- (column-) sharded activation
    forces a fully replicated SpMM on every device — the exact regime
    (HEALPix-64+) where spatial sharding matters (SURVEY.md §5.7). The
    `custom_partitioning` rule declares the op's true algebra instead:

    - rows: x rows, A rows (axis 0 of svals/vals and ucols/cols) and out
      rows all carry one factor `s` — a row-sharded activation yields a
      row-sharded output, each shard holding its row-slice of A. The
      per-shard lowering needs the FULL x (ucols/cols hold global block
      columns), so `partition` declares x row-replicated and the SPMD
      partitioner inserts the all-gather (ICI-ring on a TPU mesh).
    - columns: factor `m` passes through — a batch-sharded x keeps each
      device on its own column slice (the matvec is columnwise
      independent) instead of replicating the whole matmul.

    vmap (ensemble members over one shared operator) folds the mapped
    axis into the columns via `custom_vmap` — the matvec is linear per
    column, so this is exact, and wide M is the kernel's best regime.

    For `kind == "super"`, a1 is the COMBINED steering table
    [ucols | sched] (both row-indexed, so row sharding slices them
    together). The default lowering (full rows on every device) slices
    out the packed schedule and runs the slot-resident kernel; a
    row-sharded lowering slices out ucols and runs the slot-order-
    agnostic union kernel, because schedule continuity (stay/copy from
    super-rows s-1/s-2) breaks at shard boundaries.

    Cached per static config: the returned callable is reused across
    traces so jit caches stay warm.
    """
    if kind == "super":
        def steer_split(a0, a1):
            max_u = a0.shape[3] // a0.shape[2]
            return a1[:, :max_u], a1[:, max_u:]

        def local_fn(a0, a1, x):
            mt = _pick_tile(x.shape[1], m_cap)
            _ucols, sched = steer_split(a0, a1)
            return _bcsr_super_matmul(a0, sched, x, mt, precision,
                                      scheduled=True)

        def rowsharded_fn(a0, a1, x):
            mt = _pick_tile(x.shape[1], m_cap)
            ucols, _sched = steer_split(a0, a1)
            return _bcsr_super_matmul(a0, ucols, x, mt, precision,
                                      scheduled=False)
    else:
        def local_fn(a0, a1, x):
            mt = _pick_tile(x.shape[1], m_cap)
            return _bcsr_matmul(a0, a1, x, mt, interpret, precision)

        rowsharded_fn = local_fn

    f = custom_partitioning(local_fn)

    def _axes(arg_shapes, result_shape, mesh):
        def spec_of(s):
            sharding = getattr(s, "sharding", None)
            return getattr(sharding, "spec", None)
        n_s = arg_shapes[0].shape[0]
        m = arg_shapes[2].shape[1]
        row = (_shard_axes(spec_of(arg_shapes[2]), 0, mesh, n_s)
               or _shard_axes(spec_of(result_shape), 0, mesh, n_s)
               or _shard_axes(spec_of(arg_shapes[0]), 0, mesh, n_s))
        # column shards must leave a lane-aligned local M
        def col_ok(axes):
            if axes is None:
                return None
            t = axes if isinstance(axes, tuple) else (axes,)
            n = int(np.prod([mesh.shape[a] for a in t]))
            return axes if (m // n) % 128 == 0 else None
        col = (col_ok(_shard_axes(spec_of(arg_shapes[2]), 1, mesh, m))
               or col_ok(_shard_axes(spec_of(result_shape), 1, mesh, m)))
        # one mesh axis cannot shard both dims
        rowset = set(row if isinstance(row, tuple) else (row,))
        colset = set(col if isinstance(col, tuple) else (col,))
        if rowset & colset - {None}:
            col = None
        return row, col

    def partition(mesh, arg_shapes, result_shape):
        row, col = _axes(arg_shapes, result_shape, mesh)
        arg_shardings = (
            NamedSharding(mesh, PartitionSpec(row, None, None, None)),
            NamedSharding(mesh, PartitionSpec(row, None)),
            NamedSharding(mesh, PartitionSpec(None, col)),
        )
        out_sharding = NamedSharding(mesh, PartitionSpec(row, col))

        def lower_fn(a0, a1, x):
            # row-sharded shards hold contiguous super-row slices without
            # their schedule predecessors -> union kernel; full-row shards
            # (row is None) keep the slot-resident schedule
            return (rowsharded_fn if row is not None else local_fn)(
                a0, a1, x)

        return mesh, lower_fn, out_sharding, arg_shardings

    def infer(mesh, arg_shapes, result_shape):
        # GSPMD fallback (shardy uses sharding_rule instead)
        row, col = _axes(arg_shapes, result_shape, mesh)
        return NamedSharding(mesh, PartitionSpec(row, col))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="s a b c, s q, (s w) m -> (s w) m",
        need_replication_factors=("a", "b", "c", "q"),
        w=w,
    )

    @custom_vmap
    def g(a0, a1, x):
        return f(a0, a1, x)

    @g.def_vmap
    def _vmap_rule(axis_size, in_batched, a0, a1, x):
        a0_b, a1_b, x_b = in_batched
        if a0_b or a1_b or not x_b:
            raise NotImplementedError(
                "vmap over BlockSparseOperator arrays themselves is not "
                "supported (one shared operator per vmap is: the mapped "
                "axis folds into the matvec columns)")
        k = axis_size
        n, m = x.shape[1], x.shape[2]
        y = g(a0, a1, jnp.moveaxis(x, 0, 1).reshape(n, k * m))
        return jnp.moveaxis(y.reshape(y.shape[0], k, m), 1, 0), True

    return g


class BlockSparseOperator:
    """Symmetric-by-default block-sparse operator with custom VJP.

    matvec(x): [V, M] -> [V, M]; pads V and M to tile multiples internally.
    """

    def __init__(self, vals, cols, n: int, n_pad: int, m_tile: int = 1024,
                 interpret: bool = False,
                 vals_t=None, cols_t=None, sup=None, sup_t=None):
        # vals/cols may be None when the super format fully serves the
        # compiled path (from_scipy drops them to save HBM)
        if vals is None and (sup is None or interpret):
            raise ValueError("vals/cols required unless a super format "
                             "serves the compiled path")
        self.vals = jnp.asarray(vals) if vals is not None else None
        self.cols = jnp.asarray(cols) if cols is not None else None
        self.vals_t = jnp.asarray(vals_t) if vals_t is not None else None
        self.cols_t = jnp.asarray(cols_t) if cols_t is not None else None
        self.sup = tuple(jnp.asarray(a) for a in sup) if sup else None
        self.sup_t = tuple(jnp.asarray(a) for a in sup_t) if sup_t else None
        self.n = int(n)
        self.n_pad = int(n_pad)
        self.m_tile = int(m_tile)
        self.interpret = bool(interpret)

    @classmethod
    def from_scipy(cls, mat, symmetric: bool = True, m_tile: int = 1024,
                   interpret: bool = False, dtype=np.float32,
                   block_size: int = _BS, rows_per_super: int = 2):
        """`dtype=bf16` halves the A-block HBM reads — use it when the
        activations are bf16 (the single-pass MXU rounds operands to bf16
        there anyway, so stored-bf16 A loses no additional precision).
        `block_size`: 128 and 256 measure equal on knn graphs at
        HEALPix-64 (deep DMA ring hides the issue overhead either way);
        512 blows the VMEM budget. `rows_per_super` > 1 additionally builds
        the super-row format (union x DMAs shared across adjacent
        row-blocks — the main x-traffic saving); 0/None disables it."""
        vals, cols, n_pad = bcsr_from_scipy(mat, block_size=block_size,
                                            dtype=dtype)
        sup = sup_t = None
        if rows_per_super and rows_per_super > 1:
            sup = bcsr_super_from_scipy(mat, block_size=block_size,
                                        rows_per_super=rows_per_super,
                                        dtype=dtype,
                                        _bcsr=(vals, cols, n_pad))[:6]
        if symmetric:
            vals_t = cols_t = None
        else:
            matT = mat.T.tocsr()
            vals_t, cols_t, _ = bcsr_from_scipy(matT, block_size=block_size,
                                                dtype=dtype)
            if sup is not None:
                sup_t = bcsr_super_from_scipy(
                    matT, block_size=block_size,
                    rows_per_super=rows_per_super, dtype=dtype,
                    _bcsr=(vals_t, cols_t, n_pad))[:6]
        if sup is not None and not interpret:
            # the compiled path only ever reads the super format; keeping
            # the plain padded BCSR would pin ~1 GB of dead HBM per
            # operator at HEALPix-128
            vals = cols = None
            if sup_t is not None:
                vals_t = cols_t = None
        return cls(vals, cols, mat.shape[0], n_pad, m_tile=m_tile,
                   interpret=interpret, vals_t=vals_t, cols_t=cols_t,
                   sup=sup, sup_t=sup_t)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        n, m = x.shape
        # adaptive m tile: the largest lane-aligned tile (<= m_tile cap)
        # dividing the padded width — wide tiles amortize the A-block DMA
        # over more MXU columns (measured 8.7 -> 5.1 ms/matvec at
        # HEALPix-64 going from 256 to 1024)
        m_pad = ((m + 127) // 128) * 128
        # m_tile is a CAP (floored at the 128-lane minimum)
        cap = max(self.m_tile, 128)
        mt = max(t for t in (1024, 512, 256, 128)
                 if t <= cap and m_pad % t == 0)
        use_super = self.sup is not None and not self.interpret
        if use_super:
            svals, _use, _wait_row, ucols, _ucount, _sched = self.sup
            max_u = ucols.shape[1]
            # the backward pass runs the SAME m_tile against the transposed
            # super format, whose union can be wider for non-symmetric
            # operators — size the tile for the wider of the two
            if self.sup_t is not None:
                max_u = max(max_u, self.sup_t[3].shape[1])
            R, bs = svals.shape[1], svals.shape[2]
            mt = _super_m_tile(max_u, R, bs, m_pad,
                               x.dtype, svals.dtype, cap)
        # fp32 callers get exact fp32 matmuls; bf16 activations keep the
        # fast single-pass MXU default AND stay bf16 through the x DMA and
        # the output store (the kernel is HBM-bandwidth-bound; halving
        # those bytes is the main lever — accumulation stays fp32 in VMEM).
        if x.dtype == jnp.bfloat16:
            precision = jax.lax.Precision.DEFAULT
            x_pad = jnp.pad(x, ((0, self.n_pad - n), (0, m_pad - m)))
        else:
            precision = jax.lax.Precision.HIGHEST
            x_pad = jnp.pad(x, ((0, self.n_pad - n),
                                (0, m_pad - m))).astype(jnp.float32)
        out = _mv((mt, self.interpret, precision, str(x_pad.dtype),
                   use_super),
                  self.vals, self.cols, self.vals_t, self.cols_t,
                  self.sup, self.sup_t, x_pad)
        return out[: n, : m]

    def tree_flatten(self):
        return ((self.vals, self.cols, self.vals_t, self.cols_t,
                 self.sup, self.sup_t),
                (self.n, self.n_pad, self.m_tile, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.vals, obj.cols, obj.vals_t, obj.cols_t,
         obj.sup, obj.sup_t) = children
        obj.n, obj.n_pad, obj.m_tile, obj.interpret = aux
        return obj


jax.tree_util.register_pytree_node(
    BlockSparseOperator, BlockSparseOperator.tree_flatten,
    BlockSparseOperator.tree_unflatten,
)


# The operator arrays are EXPLICIT custom_vjp arguments (not closed over):
# geometry flows through jitted steps as an argument pytree, so vals/cols
# are tracers there — closing over tracers inside custom_vjp is illegal.
def _fit_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Zero-pad or truncate axis 0 to exactly `rows`."""
    if x.shape[0] == rows:
        return x
    if x.shape[0] > rows:
        return x[:rows]
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


def _run_mv(static, vals, cols, sup, x_pad, n_out):
    """Dispatch one matvec: super-row kernel when available, else v2 —
    both through the SPMD-partitionable `_partitioned_spmm` wrappers.
    x is first padded/truncated to the operator's own row count (the
    partitioning rule ties x rows, A rows and out rows to one factor;
    mixed super-forward/plain-backward row counts differ by super-row
    padding only, and the extra rows are zeros no block references).
    Output padded/truncated to n_out rows."""
    m_tile, interpret, precision, _xdt, use_super = static
    if use_super and sup is not None:
        svals, _use, _wait_row, ucols, _ucount, sched = sup
        rows = svals.shape[0] * svals.shape[1] * svals.shape[2]
        mm = _partitioned_spmm("super", svals.shape[1] * svals.shape[2],
                               m_tile, False, precision)
        # combined steering table [ucols | sched]: the wrapper picks the
        # half its lowering needs (scheduled kernel on full rows, union
        # kernel under row sharding)
        table = jnp.concatenate([ucols, sched], axis=1)
        return _fit_rows(mm(svals, table, _fit_rows(x_pad, rows)), n_out)
    rows = vals.shape[0] * vals.shape[2]
    mm = _partitioned_spmm("v2", vals.shape[2], m_tile, interpret, precision)
    return _fit_rows(mm(vals, cols, _fit_rows(x_pad, rows)), n_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mv(static, vals, cols, vals_t, cols_t, sup, sup_t, x_pad):
    return _run_mv(static, vals, cols, sup, x_pad, x_pad.shape[0])


def _mv_fwd(static, vals, cols, vals_t, cols_t, sup, sup_t, x_pad):
    return (_mv(static, vals, cols, vals_t, cols_t, sup, sup_t, x_pad),
            (vals, cols, vals_t, cols_t, sup, sup_t))


def _transpose_arrays(vals, cols, vals_t, cols_t, sup, sup_t):
    """Pick the arrays that compute A^T @ g for the backward matvec.

    Symmetric operators (vals_t None) reuse the forward arrays (including
    the super format). Non-symmetric operators use the transposed BCSR,
    and the transposed super format ONLY if one was built — the forward
    super arrays would silently compute A@g instead of A^T@g, so without
    sup_t the dispatch falls back to the plain transposed BCSR (v2
    kernel) by returning ts=None."""
    tv = vals if vals_t is None else vals_t
    tc = cols if cols_t is None else cols_t
    if sup_t is not None:
        ts = sup_t
    elif vals_t is None:
        ts = sup
    else:
        ts = None
    return tv, tc, ts


def _mv_bwd(static, res, g):
    vals, cols, vals_t, cols_t, sup, sup_t = res
    _m_tile, _interpret, _precision, xdt, _use_super = static
    tv, tc, ts = _transpose_arrays(vals, cols, vals_t, cols_t, sup, sup_t)
    # run the transpose matvec at the primal's dtype (bf16 primal ->
    # bf16 cotangent DMA, same bandwidth saving as the forward)
    gx = _run_mv(static, tv, tc, ts, g.astype(jnp.dtype(xdt)),
                 g.shape[0]).astype(jnp.dtype(xdt))

    def zero_ct(a):
        if a is None:
            return None
        if isinstance(a, tuple):
            return tuple(zero_ct(x) for x in a)
        if jnp.issubdtype(a.dtype, jnp.integer):
            return np.zeros(a.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(a)

    return (zero_ct(vals), zero_ct(cols), zero_ct(vals_t), zero_ct(cols_t),
            zero_ct(sup), zero_ct(sup_t), gx)


_mv.defvjp(_mv_fwd, _mv_bwd)
