"""Ops tests: Chebyshev conv vs scipy golden values, pooling semantics,
block-sparse SpMM vs dense."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from deepsphere_weather_tpu.ops.cheb import ChebOperator, cheb_conv
from deepsphere_weather_tpu.ops.conv2d import equiangular_conv2d
from deepsphere_weather_tpu.ops import pool as pool_ops
from deepsphere_weather_tpu.ops.pallas_spmm import BlockSparseOperator, bcsr_from_scipy
from deepsphere_weather_tpu.sphere import build_graph, build_sampling


def _numpy_cheb_conv(L, x, weight):
    """Golden reference: dense numpy Chebyshev conv (same math as
    reference modules/layers.py:113-180)."""
    B, V, Fin = x.shape
    _, K, Fout = weight.shape
    xs = [x]
    if K > 1:
        xs.append(np.einsum("uv,bvf->buf", L, x))
    for _ in range(2, K):
        xs.append(2 * np.einsum("uv,bvf->buf", L, xs[-1]) - xs[-2])
    basis = np.stack(xs, axis=-1)  # [B, V, Fin, K]
    return np.einsum("bvfk,fko->bvo", basis, weight)


@pytest.fixture(scope="module")
def graph():
    return build_graph("healpix", {"subdivisions": 4, "nest": True}, k=8)


class TestChebConv:
    def test_dense_matches_numpy(self, graph):
        rng = np.random.default_rng(0)
        B, V, Fin, K, Fout = 3, graph.n_nodes, 5, 3, 7
        x = rng.standard_normal((B, V, Fin)).astype(np.float32)
        w = rng.standard_normal((Fin, K, Fout)).astype(np.float32) * 0.1
        expected = _numpy_cheb_conv(graph.L.toarray(), x, w)
        op = ChebOperator.from_graph(graph, mode="dense")
        out = cheb_conv(op, jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)

    def test_ell_matches_dense(self, graph):
        rng = np.random.default_rng(1)
        B, V, Fin, K, Fout = 2, graph.n_nodes, 4, 3, 6
        x = rng.standard_normal((B, V, Fin)).astype(np.float32)
        w = rng.standard_normal((Fin, K, Fout)).astype(np.float32) * 0.1
        dense_op = ChebOperator.from_graph(graph, mode="dense")
        ell_op = ChebOperator.from_graph(graph, mode="ell")
        out_d = cheb_conv(dense_op, jnp.asarray(x), jnp.asarray(w))
        out_e = cheb_conv(ell_op, jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_e), atol=2e-4)

    def test_clenshaw_output_side_matches_numpy(self, graph):
        # Fout < Fin triggers the Clenshaw output-side evaluation (matvecs
        # on the narrow channel side); must equal the explicit T_k(L) basis
        rng = np.random.default_rng(7)
        for Fin, Fout, K in [(8, 3, 3), (16, 1, 4), (6, 2, 2)]:
            B, V = 2, graph.n_nodes
            x = rng.standard_normal((B, V, Fin)).astype(np.float32)
            w = rng.standard_normal((Fin, K, Fout)).astype(np.float32) * 0.1
            expected = _numpy_cheb_conv(graph.L.toarray(), x, w)
            op = ChebOperator.from_graph(graph, mode="dense")
            out = cheb_conv(op, jnp.asarray(x), jnp.asarray(w))
            np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)

    def test_bfloat16_compute_close_to_fp32(self, graph):
        rng = np.random.default_rng(8)
        B, V, Fin, K, Fout = 2, graph.n_nodes, 6, 3, 4
        x = rng.standard_normal((B, V, Fin)).astype(np.float32)
        w = rng.standard_normal((Fin, K, Fout)).astype(np.float32) * 0.1
        op = ChebOperator.from_graph(graph, mode="dense")
        out32 = cheb_conv(op, jnp.asarray(x), jnp.asarray(w))
        out16 = cheb_conv(op, jnp.asarray(x, jnp.bfloat16), jnp.asarray(w))
        assert out16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out16, np.float32),
                                   np.asarray(out32), atol=0.15, rtol=0.1)

    def test_bias_and_k1(self, graph):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, graph.n_nodes, 3)).astype(np.float32)
        w = rng.standard_normal((3, 1, 4)).astype(np.float32)
        b = rng.standard_normal(4).astype(np.float32)
        op = ChebOperator.from_graph(graph, mode="dense")
        out = cheb_conv(op, jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        expected = np.einsum("bvf,fo->bvo", x, w[:, 0]) + b
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)

    def test_matches_reference_torch_stack(self, graph):
        # Cross-framework parity with the REFERENCE stack itself: the
        # torch.sparse.mm Chebyshev recurrence + flattened [B*V, Fin*K] @
        # [Fin*K, Fout] dense mix of modules/layers.py:113-180, run on the
        # identical rescaled Laplacian and weights.
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(11)
        B, V, Fin, K, Fout = 3, graph.n_nodes, 5, 3, 4
        x = rng.standard_normal((B, V, Fin)).astype(np.float32)
        w = rng.standard_normal((Fin, K, Fout)).astype(np.float32) * 0.1

        L = graph.L.tocoo()
        tl = torch.sparse_coo_tensor(
            np.stack([L.row, L.col]), L.data.astype(np.float64), L.shape)
        # reference conv_cheb: x0 [V, Fin*B], xs stacked over K, then
        # reorder to [B*V, Fin*K] and one dense mix
        x0 = torch.from_numpy(x).double().permute(1, 2, 0).reshape(V, Fin * B)
        xs = [x0]
        if K > 1:
            xs.append(torch.sparse.mm(tl, x0))
        for _ in range(2, K):
            xs.append(2 * torch.sparse.mm(tl, xs[-1]) - xs[-2])
        stack = torch.stack(xs)                       # [K, V, Fin*B]
        stack = stack.reshape(K, V, Fin, B).permute(3, 1, 2, 0)
        out_t = stack.reshape(B * V, Fin * K) @ \
            torch.from_numpy(w).double().reshape(Fin * K, Fout)
        expected = out_t.reshape(B, V, Fout).numpy()

        op = ChebOperator.from_graph(graph, mode="dense")
        out = cheb_conv(op, jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out), expected,
                                   atol=2e-4, rtol=2e-4)

    def test_grad_flows(self, graph):
        op = ChebOperator.from_graph(graph, mode="dense")
        w = jnp.ones((2, 3, 2)) * 0.1
        x = jnp.ones((1, graph.n_nodes, 2))

        def f(w):
            return jnp.sum(cheb_conv(op, x, w) ** 2)

        g = jax.grad(f)(w)
        assert np.all(np.isfinite(np.asarray(g)))


class TestBlockSparse:
    def test_bcsr_roundtrip(self, graph):
        vals, cols, n_pad = bcsr_from_scipy(graph.L)
        # reconstruct dense and compare
        n_rb, max_nb, bs, _ = vals.shape
        dense = np.zeros((n_pad, n_pad), dtype=np.float32)
        seen = set()
        for i in range(n_rb):
            for b in range(max_nb):
                c = cols[i, b]
                key = (i, int(c), b)
                dense[i * bs:(i + 1) * bs, c * bs:(c + 1) * bs] += vals[i, b]
        n = graph.n_nodes
        np.testing.assert_allclose(dense[:n, :n], graph.L.toarray(), atol=1e-6)

    def test_nonsymmetric_backward_uses_transpose(self):
        # the voronoi (M^-1 L cotan) Laplacian is NOT symmetric; the
        # operator must carry the transposed BCSR so d/dx sum((Lx)^2)
        # = 2 L^T L x (a symmetric-assuming backward would compute
        # 2 L L x). Regression for from_graph hardcoding symmetric=True.
        g = build_graph("healpix", {"subdivisions": 4, "nest": True},
                        k=8, graph_type="voronoi")
        assert not g.is_symmetric
        L = g.L
        asym = abs(L - L.T).max()
        assert asym > 1e-6  # premise: genuinely non-symmetric
        op = ChebOperator.from_graph(g, mode="bcsr")
        # from_graph must mark the operator non-symmetric: it carries
        # transpose arrays in SOME form (plain BCSR or super format)
        assert (op.bcsr.vals_t is not None) or (op.bcsr.sup_t is not None)
        # CPU: build the interpret-path twin (keeps the plain BCSR arrays)
        from deepsphere_weather_tpu.ops.pallas_spmm import BlockSparseOperator
        op_i = BlockSparseOperator.from_scipy(g.L, symmetric=False,
                                              interpret=True)
        assert op_i.vals_t is not None
        x = jnp.ones((g.n_nodes, 64))
        grad = jax.grad(lambda v: jnp.sum(op_i.matvec(v) ** 2))(x)
        ones = np.ones((g.n_nodes, 64), dtype=np.float32)
        expected = 2 * (L.T @ (L @ ones))
        wrong = 2 * (L @ (L @ ones))
        assert not np.allclose(expected, wrong, atol=1e-5)
        np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-3)
        # knn graphs stay symmetric (no transposed copy stored)
        g2 = build_graph("healpix", {"subdivisions": 4, "nest": True}, k=8)
        assert g2.is_symmetric

    def test_ell_operator_vmaps(self, graph):
        # the member-parallel paths (engine.make_member_train_step,
        # prob.make_ensemble_rollout) vmap the model; the ELL operator is
        # the documented vmappable choice at 12k+ nodes (compiled Pallas
        # BCSR rejects batched block specs with a loud lowering error)
        op = ChebOperator.from_graph(graph, mode="ell")
        rng = np.random.default_rng(11)
        x = rng.standard_normal((3, graph.n_nodes, 32)).astype(np.float32)
        y = jax.vmap(lambda v: op.matvec(v))(jnp.asarray(x))
        ref = np.stack([graph.L @ x[i] for i in range(3)])
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)

    def test_bcsr_super_roundtrip(self, graph):
        # super-row layout: A blocks stored per union slot; reconstructing
        # the dense matrix from (svals, use, ucols) must recover L exactly,
        # and the DMA-control tables must be mutually consistent
        from deepsphere_weather_tpu.ops.pallas_spmm import (
            bcsr_super_from_scipy,
        )

        for R in (2, 3, 4):
            svals, use, wait_row, ucols, ucount, sched, n_pad = \
                bcsr_super_from_scipy(graph.L, rows_per_super=R)
            n_s, R_, bs, ubs = svals.shape
            max_u = ucols.shape[1]
            assert R_ == R and ubs == max_u * bs
            dense = np.zeros((n_s * R * bs, n_pad), dtype=np.float32)
            for s in range(n_s):
                for u in range(max_u):
                    for r in range(R):
                        blk = svals[s, r, :, u * bs:(u + 1) * bs]
                        if not use[s, r * max_u + u]:
                            # unused slots must hold zero blocks (the deep
                            # matmul multiplies them; zeros keep it exact)
                            assert not np.any(blk)
                            continue
                        # every used slot is a real union member whose
                        # first-use row is <= r
                        assert wait_row[s, u] <= r
                        c = ucols[s, u]
                        row0 = (s * R + r) * bs
                        dense[row0:row0 + bs, c * bs:(c + 1) * bs] += blk
            n = graph.n_nodes
            np.testing.assert_allclose(dense[:n, :n], graph.L.toarray(),
                                       atol=1e-6)
            # exactly ucount[s] slots are used per super-row (the slot
            # POSITIONS are schedule-assigned, not contiguous)
            for s in range(n_s):
                used_slots = {u for u in range(max_u)
                              if wait_row[s, u] < R}
                assert len(used_slots) == int(ucount[s])
                # used slots hold distinct real columns
                assert len({int(ucols[s, u]) for u in used_slots}) \
                    == int(ucount[s])

    def test_super_schedule_consistency(self, graph):
        # replaying the packed stay/copy/new schedule through the kernel's
        # ping-pong buffer semantics must reproduce, at every super-row,
        # exactly the slot->column residency the svals layout assumes
        from deepsphere_weather_tpu.ops.pallas_spmm import (
            _SCHED_RADIX,
            bcsr_super_from_scipy,
        )

        for R in (2, 4):
            svals, use, wait_row, ucols, ucount, sched, n_pad = \
                bcsr_super_from_scipy(graph.L, rows_per_super=R)
            n_s = svals.shape[0]
            max_u = ucols.shape[1]
            bufs = [dict(), dict()]     # slot -> col, per parity
            for s in range(n_s):
                cur, oth = bufs[s % 2], bufs[1 - s % 2]
                w0 = int(sched[s, 0])
                n_new, n_cp = w0 % _SCHED_RADIX, w0 // _SCHED_RADIX
                for j in range(n_new):
                    v = int(sched[s, 1 + j])
                    cur[v % max_u] = v // max_u
                for j in range(n_cp):
                    v = int(sched[s, 1 + n_new + j])
                    src, dst = v // max_u, v % max_u
                    # copy source must be resident in the other buffer
                    assert src in oth
                    cur[dst] = oth[src]
                # rows 0 and 1 are cold (m-pass-boundary correctness) and
                # must FULLY initialize their parity buffer — unwritten
                # slots would be uninitialized VMEM whose NaNs poison the
                # zero-A-block multiplies
                if s == 0:
                    assert n_cp == 0
                if s <= 1:
                    assert set(cur.keys()) == set(range(max_u))
                # after the transfers, every USED slot holds its column
                for u in range(max_u):
                    if wait_row[s, u] < R:
                        assert cur.get(u) == int(ucols[s, u]), (s, u)

    def test_bcsr_builds_bf16(self, graph):
        # the builders take a vectorized bit-level path for bf16 (integer
        # views for the cast / nonzero-block mask / block fill — ml_dtypes
        # elementwise ops are ~100x slower); the result must equal a plain
        # astype of the fp32 build
        import ml_dtypes

        bf16 = np.dtype(ml_dtypes.bfloat16)
        vals32, cols32, n_pad32 = bcsr_from_scipy(graph.L)
        vals16, cols16, n_pad16 = bcsr_from_scipy(graph.L, dtype=bf16)
        assert vals16.dtype == bf16 and n_pad16 == n_pad32
        np.testing.assert_array_equal(cols16, cols32)
        np.testing.assert_array_equal(
            np.asarray(vals16, dtype=np.float32),
            np.asarray(vals32.astype(bf16), dtype=np.float32))

        from deepsphere_weather_tpu.ops.pallas_spmm import (
            bcsr_super_from_scipy,
        )
        s32 = bcsr_super_from_scipy(graph.L, rows_per_super=2)
        s16 = bcsr_super_from_scipy(graph.L, rows_per_super=2, dtype=bf16)
        svals32, svals16 = s32[0], s16[0]
        assert svals16.dtype == bf16
        np.testing.assert_array_equal(
            np.asarray(svals16, dtype=np.float32),
            np.asarray(svals32.astype(bf16), dtype=np.float32))
        for a32, a16 in zip(s32[1:], s16[1:]):
            np.testing.assert_array_equal(np.asarray(a32), np.asarray(a16))

    def test_super_m_tile_vmem_model(self):
        # regression for a scoped-VMEM OOM: Mosaic doubles the kernel's
        # stack copies across the ping-pong parity branches for every
        # dtype combination except matched bf16, so fp32/fp32 must pick a
        # smaller m-tile (an fp32 HEALPix-16 SWAG fine-tune compiled
        # 16.34M of stack against the 16M limit when the model assumed
        # single-branch for matched dtypes)
        import jax.numpy as jnp
        from deepsphere_weather_tpu.ops.pallas_spmm import _super_m_tile

        f32, bf16 = jnp.float32, jnp.bfloat16
        # the failing case: HEALPix-16 fp32 operator, max_u=10
        assert _super_m_tile(10, 2, 128, 1024, f32, f32, 1024) <= 256
        # hardware-validated choices must be preserved
        assert _super_m_tile(13, 2, 128, 1024, f32, f32, 1024) == 256
        assert _super_m_tile(13, 2, 128, 1024, bf16, bf16, 1024) == 1024
        assert _super_m_tile(13, 2, 128, 1024, f32, bf16, 1024) == 256

    def test_pallas_spmm_interpret(self, graph):
        op = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                            m_tile=128, interpret=True)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((graph.n_nodes, 96)).astype(np.float32)
        out = op.matvec(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), graph.L @ x, atol=1e-4)

    def test_pallas_spmm_grad(self, graph):
        op = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                            m_tile=128, interpret=True)
        x = jnp.ones((graph.n_nodes, 64))
        g = jax.grad(lambda x: jnp.sum(op.matvec(x) ** 2))(x)
        # d/dx sum((Lx)^2) = 2 L^T L x
        expected = 2 * graph.L.T @ (graph.L @ np.ones((graph.n_nodes, 64),
                                                      dtype=np.float32))
        np.testing.assert_allclose(np.asarray(g), expected, atol=1e-3)

    def test_pallas_spmm_operator_as_jit_argument(self, graph):
        # the engine passes geometry (incl. the BCSR operator) as a jit
        # ARGUMENT, so vals/cols are tracers inside the step — the custom
        # VJP must not close over them (regression: VerificationError /
        # "No constant handler for DynamicJaxprTracer" at HEALPix-64)
        op = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                            m_tile=128, interpret=True)
        x = jnp.ones((graph.n_nodes, 64))

        @jax.jit
        def loss(op, x):
            return jnp.sum(op.matvec(x) ** 2)

        g = jax.jit(jax.grad(loss, argnums=1))(op, x)
        expected = 2 * graph.L.T @ (graph.L @ np.ones(
            (graph.n_nodes, 64), dtype=np.float32))
        np.testing.assert_allclose(np.asarray(g), expected, atol=1e-3)

    def test_pallas_spmm_bf16_activations(self, graph):
        # bf16 activations: fp32 accumulation inside the kernel, bf16
        # output store (half the o-write bytes; callers stay in bf16)
        op = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                            m_tile=128, interpret=True)
        rng = np.random.default_rng(5)
        x = rng.standard_normal((graph.n_nodes, 96)).astype(np.float32)
        out = op.matvec(jnp.asarray(x, jnp.bfloat16))
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   graph.L @ x, atol=0.05, rtol=0.05)

    def test_bf16_model_builds_bf16_bcsr_operator(self):
        # the wiring: numeric_precision='bfloat16' + a graph above the
        # dense threshold must store the BCSR Laplacian blocks in bf16
        from deepsphere_weather_tpu.models.geometry import build_model_geometry

        geom = build_model_geometry(
            sampling="healpix", sampling_kwargs={"subdivisions": 4,
                                                 "nest": True},
            depth=2, knn=8, dense_threshold=16, use_pallas=True,
            operator_dtype=jnp.bfloat16)
        assert geom.cheb_ops[0].bcsr is not None
        # compiled operators carry only the super format (plain BCSR is
        # dropped to save HBM) — the bf16 request lands on its svals
        assert geom.cheb_ops[0].bcsr.sup[0].dtype == jnp.bfloat16

    def test_pallas_spmm_bf16_stored_operator(self, graph):
        # bf16-stored A blocks (the bf16-model configuration): results match
        # the exact product at bf16 tolerance, and the operator pytree
        # carries bf16 leaves (half the A-block HBM traffic)
        op = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                            m_tile=128, interpret=True,
                                            dtype=jnp.bfloat16)
        assert op.vals.dtype == jnp.bfloat16
        rng = np.random.default_rng(7)
        x = rng.standard_normal((graph.n_nodes, 96)).astype(np.float32)
        out = op.matvec(jnp.asarray(x, jnp.bfloat16))
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   graph.L @ x, atol=0.05, rtol=0.05)


class TestGeneralPooling:
    @pytest.fixture(scope="class")
    def samplings(self):
        src = build_sampling("healpix", {"subdivisions": 8, "nest": True})
        dst = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        return src, dst

    def test_interp_pool_constant(self, samplings):
        src, dst = samplings
        pool, unpool = pool_ops.build_pool_unpool("interp", src, dst, cache=False)
        x = jnp.ones((2, src.n_nodes, 3))
        y, idx = pool(x)
        assert y.shape == (2, dst.n_nodes, 3)
        np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-5)
        z = unpool(y, idx)
        assert z.shape == (2, src.n_nodes, 3)
        np.testing.assert_allclose(np.asarray(z), 1.0, rtol=1e-5)

    def test_maxarea_pool_selects_values(self, samplings):
        src, dst = samplings
        pool, unpool = pool_ops.build_pool_unpool("maxarea", src, dst, cache=False)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, src.n_nodes, 2)).astype(np.float32))
        y, _ = pool(x)
        # every pooled value must be one of the source values
        assert np.all(np.isin(np.round(np.asarray(y), 5),
                              np.round(np.asarray(x), 5)))

    def test_maxval_pool_unpool(self, samplings):
        src, dst = samplings
        pool, unpool = pool_ops.build_pool_unpool("maxval", src, dst, cache=False)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, src.n_nodes, 3)).astype(np.float32))
        y, idx = pool(x)
        assert y.shape == (2, dst.n_nodes, 3)
        z = unpool(y, idx)
        assert z.shape == (2, src.n_nodes, 3)
        # scattered-back values land at their argmax source positions
        nz = np.asarray(z) != 0
        assert nz.sum() > 0


class TestHierarchicalPooling:
    def test_healpix_avg_pool_unpool(self):
        pool, unpool = pool_ops.HealpixAvgPool(4), pool_ops.HealpixAvgUnpool(4)
        x = jnp.arange(2 * 48 * 3, dtype=jnp.float32).reshape(2, 48, 3)
        y, _ = pool(x)
        assert y.shape == (2, 12, 3)
        np.testing.assert_allclose(
            np.asarray(y[0, 0, 0]), np.asarray(x[0, :4, 0]).mean(), rtol=1e-6)
        z = unpool(y, None)
        assert z.shape == (2, 48, 3)

    def test_healpix_max_pool_unpool_inverts_at_argmax(self):
        pool, unpool = pool_ops.HealpixMaxPool(4), pool_ops.HealpixMaxUnpool(4)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 48, 2)).astype(np.float32))
        y, idx = pool(x)
        z = unpool(y, idx)
        # max positions hold the original values, others zero
        xa, za = np.asarray(x), np.asarray(z)
        g = xa.reshape(1, 12, 4, 2)
        am = g.argmax(axis=2)
        for d in range(12):
            for c in range(2):
                j = am[0, d, c]
                assert za[0, d * 4 + j, c] == pytest.approx(g[0, d, j, c])
        assert (za != 0).sum() == 12 * 2

    def test_equiangular_pool_unpool(self):
        pool = pool_ops.EquiangularAvgPool(8, 16, kernel_size=4)
        unpool = pool_ops.EquiangularAvgUnpool(4, 8, kernel_size=4)
        x = jnp.ones((2, 128, 3))
        y, _ = pool(x)
        assert y.shape == (2, 32, 3)
        z = unpool(y, None)
        assert z.shape == (2, 128, 3)

        mpool = pool_ops.EquiangularMaxPool(8, 16, kernel_size=4)
        munpool = pool_ops.EquiangularMaxUnpool(4, 8, kernel_size=4)
        rng = np.random.default_rng(3)
        # positive values so zeros introduced by max-unpool never win the re-pool
        x = jnp.asarray(rng.random((1, 128, 2)).astype(np.float32) + 0.5)
        y, idx = mpool(x)
        z = munpool(y, idx)
        assert z.shape == (1, 128, 2)
        # pooling the unpooled max field recovers the pooled field
        y2, _ = mpool(z)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)

    def test_equiangular_odd_dims(self):
        # odd grid dims (Equiangular_400km_tropics coarsens 23x46 -> 11x23):
        # pool floor-crops (MaxPool2d/AvgPool2d semantics), unpool resizes
        # back to the exact fine grid
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.random((2, 23 * 46, 3)).astype(np.float32) + 0.5)
        pool = pool_ops.EquiangularAvgPool(23, 46, kernel_size=4)
        unpool = pool_ops.EquiangularAvgUnpool(11, 23, kernel_size=4,
                                               fine_nlat=23, fine_nlon=46)
        y, _ = pool(x)
        assert y.shape == (2, 11 * 23, 3)
        # pooled values ignore the cropped last row (torch parity)
        g = np.asarray(x).reshape(2, 23, 46, 3)
        exp = g[:, :22, :].reshape(2, 11, 2, 23, 2, 3).mean(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(y).reshape(2, 11, 23, 3), exp,
                                   atol=1e-6)
        z = unpool(y, None)
        assert z.shape == (2, 23 * 46, 3)
        # nearest-resize index map (F.interpolate nearest semantics):
        # fine row i reads coarse row floor(i * 11 / 23)
        zz = np.asarray(z).reshape(2, 23, 46, 3)
        rows = (np.arange(23) * 11 // 23)
        cols = (np.arange(46) * 23 // 46)
        np.testing.assert_allclose(zz, exp[:, rows][:, :, cols], atol=1e-6)

        mpool = pool_ops.EquiangularMaxPool(23, 46, kernel_size=4)
        munpool = pool_ops.EquiangularMaxUnpool(11, 23, kernel_size=4,
                                                fine_nlat=23, fine_nlon=46)
        ym, idx = mpool(x)
        zm = munpool(ym, idx)
        assert zm.shape == (2, 23 * 46, 3)
        ym2, _ = mpool(zm)
        np.testing.assert_allclose(np.asarray(ym2), np.asarray(ym), atol=1e-6)
        # the cropped fine row receives zeros
        assert np.all(np.asarray(zm).reshape(2, 23, 46, 3)[:, 22] == 0)


class TestEquiangularConv:
    def test_shapes_and_periodicity(self):
        rng = np.random.default_rng(4)
        nlat, nlon = 8, 16
        x = jnp.asarray(rng.standard_normal((2, nlat * nlon, 3)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 5)).astype(np.float32) * 0.1)
        out = equiangular_conv2d(x, k, None, nlat, nlon, periodic_padding=True)
        assert out.shape == (2, nlat * nlon, 5)
        # longitude periodicity: rolling input by one lon column rolls output
        g = np.asarray(x).reshape(2, nlat, nlon, 3)
        g_rolled = np.roll(g, 1, axis=2).reshape(2, -1, 3)
        out_rolled = equiangular_conv2d(jnp.asarray(g_rolled), k, None, nlat, nlon,
                                        periodic_padding=True)
        expected = np.roll(np.asarray(out).reshape(2, nlat, nlon, 5), 1, axis=2)
        np.testing.assert_allclose(np.asarray(out_rolled).reshape(2, nlat, nlon, 5),
                                   expected, atol=1e-5)


class TestBlockSparseDispatch:
    """Regressions for the backward dispatch and VMEM-budget model."""

    def test_transpose_dispatch(self):
        from deepsphere_weather_tpu.ops.pallas_spmm import _transpose_arrays

        V, C, VT, CT = "v", "c", "vt", "ct"
        SUP, SUPT = ("sup",), ("sup_t",)
        # symmetric: forward arrays (and forward super) ARE the transpose
        assert _transpose_arrays(V, C, None, None, SUP, None) == (V, C, SUP)
        # non-symmetric with a transposed super format: use it
        assert _transpose_arrays(V, C, VT, CT, SUP, SUPT) == (VT, CT, SUPT)
        # non-symmetric WITHOUT sup_t must NOT fall back to the forward
        # super (that computes A@g, not A^T@g) — v2 path via ts=None
        assert _transpose_arrays(V, C, VT, CT, SUP, None) == (VT, CT, None)

    def test_super_m_tile_models_cast_and_transpose_width(self):
        import jax.numpy as jnp
        from deepsphere_weather_tpu.ops.pallas_spmm import _super_m_tile

        # bf16-stored A with fp32 x casts A rows to fp32 inside the
        # kernel: the modeled footprint must not be smaller than the
        # matched-fp32 case's a-copy term, so the chosen tile can only
        # shrink (never grow) relative to matched dtypes
        for max_u in (8, 16, 24, 32):
            mt_matched = _super_m_tile(max_u, 2, 128, 4096,
                                       jnp.float32, jnp.float32, 1024)
            mt_cast = _super_m_tile(max_u, 2, 128, 4096,
                                    jnp.float32, jnp.bfloat16, 1024)
            assert mt_cast <= mt_matched
        # a wider union must never produce a larger tile
        mts = [_super_m_tile(u, 2, 128, 4096, jnp.float32, jnp.float32, 1024)
               for u in (4, 8, 16, 32, 64)]
        assert mts == sorted(mts, reverse=True)

    def test_from_scipy_drops_plain_arrays_for_compiled_super(self, graph):
        from deepsphere_weather_tpu.ops.pallas_spmm import BlockSparseOperator

        # compiled super path: plain BCSR would be dead HBM weight
        op = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                            rows_per_super=2, interpret=False)
        assert op.sup is not None and op.vals is None and op.cols is None
        # interpret path still carries (and uses) the plain arrays
        op_i = BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                              rows_per_super=2, interpret=True)
        assert op_i.vals is not None
        import numpy as _np
        x = _np.random.default_rng(5).standard_normal(
            (graph.n_nodes, 64)).astype(_np.float32)
        _np.testing.assert_allclose(_np.asarray(op_i.matvec(jnp.asarray(x))),
                                    graph.L @ x, atol=1e-4)
        # constructing with neither plain arrays nor a compiled super
        # format is rejected loudly
        import pytest as _pytest
        with _pytest.raises(ValueError):
            BlockSparseOperator(None, None, 8, 128, interpret=True)

    def test_from_graph_rejects_unknown_mode(self, graph):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="unknown ChebOperator mode"):
            ChebOperator.from_graph(graph, mode="bscr")


class TestBlockSparsePartitioned:
    """The SPMD/vmap wrapper around the BCSR kernels: row (node)
    sharding, column (batch) sharding and ensemble vmap must all match
    the scipy reference (the Pallas launchers are opaque to XLA's
    sharding propagation; `_partitioned_spmm` declares the op's
    algebra — SURVEY.md §5.7 node-dimension sharding)."""

    def _op(self, graph):
        return BlockSparseOperator.from_scipy(graph.L, symmetric=True,
                                              m_tile=128, interpret=True)

    def test_row_sharded_matvec(self, graph):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        op = self._op(graph)
        rng = np.random.default_rng(11)
        # pre-pad rows to the operator's padded extent so the node split
        # lands on 128-row block boundaries (2 blocks over 2 devices)
        x = np.zeros((op.n_pad, 256), np.float32)
        x[: graph.n_nodes] = rng.standard_normal(
            (graph.n_nodes, 256)).astype(np.float32)
        mesh = Mesh(np.array(jax.devices()[:2]), ("node",))
        sh = NamedSharding(mesh, P("node", None))
        out = jax.jit(op.matvec, in_shardings=sh, out_shardings=sh)(
            jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out)[: graph.n_nodes],
            graph.L @ x[: graph.n_nodes], atol=1e-4)

    def test_column_sharded_matvec(self, graph):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        op = self._op(graph)
        rng = np.random.default_rng(12)
        x = rng.standard_normal((graph.n_nodes, 256)).astype(np.float32)
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        sh = NamedSharding(mesh, P(None, "data"))
        out = jax.jit(op.matvec, in_shardings=sh)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), graph.L @ x, atol=1e-4)

    def test_vmap_members_matches_loop(self, graph):
        # ensemble members over ONE shared operator: custom_vmap folds
        # the member axis into the matvec columns (exact — linear per
        # column); this is the SWAG/DeepEnsemble member-parallel path
        op = self._op(graph)
        rng = np.random.default_rng(13)
        xs = rng.standard_normal((3, graph.n_nodes, 128)).astype(np.float32)
        out = jax.vmap(op.matvec)(jnp.asarray(xs))
        assert out.shape == xs.shape
        for i in range(3):
            np.testing.assert_allclose(np.asarray(out[i]),
                                       graph.L @ xs[i], atol=1e-4)

    def test_cheb_conv_bcsr_vmaps_over_members(self, graph):
        # the DeepEnsemble/SWAG member-parallel path: member-stacked
        # weights AND activations vmapped over ONE shared BCSR operator
        # (previously required use_pallas=False; the custom_vmap rule
        # lifted that)
        op = ChebOperator(bcsr=self._op(graph))
        rng = np.random.default_rng(14)
        M, B, V, Fin, K, Fout = 3, 2, graph.n_nodes, 4, 3, 5
        xs = rng.standard_normal((M, B, V, Fin)).astype(np.float32)
        ws = rng.standard_normal((M, Fin, K, Fout)).astype(np.float32) * 0.1
        out = jax.vmap(cheb_conv, in_axes=(None, 0, 0))(
            op, jnp.asarray(xs), jnp.asarray(ws))
        for m in range(M):
            expected = _numpy_cheb_conv(graph.L.toarray(), xs[m], ws[m])
            np.testing.assert_allclose(np.asarray(out[m]), expected,
                                       atol=2e-4)

    def test_vmap_grad(self, graph):
        op = self._op(graph)
        xs = jnp.ones((2, graph.n_nodes, 64))
        g = jax.vmap(jax.grad(lambda x: jnp.sum(op.matvec(x) ** 2)))(xs)
        expected = 2 * graph.L.T @ (graph.L @ np.ones(
            (graph.n_nodes, 64), dtype=np.float32))
        for i in range(2):
            np.testing.assert_allclose(np.asarray(g[i]), expected, atol=1e-3)
