"""On-hardware validation of the compiled Pallas SpMM paths.

The pytest suite runs on a CPU mesh and exercises the Pallas kernels only
in interpreter mode; this script validates the COMPILED kernels on a real
TPU — run it after touching ops/pallas_spmm.py:

    python scripts/validate_tpu_kernels.py [--subdivisions 64] [--knn 20]

Checks, against scipy golden values:
  1. v2 BCSR kernel (per-row-block DMA ring), fp32 exact + bf16
  2. super-row kernel (union DMA + ping-pong + deep matmul), fp32 + bf16,
     R in {2, 4}
  3. backward pass through the custom VJP (d/dx sum((Lx)^2) = 2 L^T L x),
     symmetric and non-symmetric (voronoi) operators
  4. steady-state matvec timing, super vs v2 (informational)

Exit code 0 = all checks passed.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

# Runnable as `python scripts/validate_tpu_kernels.py` from anywhere:
# python puts scripts/ (not the repo root) on sys.path for direct execution.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=64)
    ap.add_argument("--knn", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepsphere_weather_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from deepsphere_weather_tpu.ops.pallas_spmm import BlockSparseOperator
    from deepsphere_weather_tpu.sphere.graph import build_graph

    interpret = jax.default_backend() == "cpu"
    if interpret:
        print("WARNING: CPU backend — kernels run in INTERPRET mode (the "
              "super-row format falls back to the v2 path); compiled-"
              "kernel coverage needs a TPU", file=sys.stderr)

    g = build_graph("healpix",
                    {"subdivisions": args.subdivisions, "nest": True},
                    k=args.knn)
    n = g.n_nodes
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((n, 1024)).astype(np.float32)
    ref = g.L @ x_np
    scale = np.abs(ref).max()
    failures = 0

    mv = jax.jit(lambda o, v: o.matvec(v))
    results = {}

    def check(tag, y, tol):
        nonlocal failures
        err = np.abs(np.asarray(y, np.float32) - ref).max() / scale
        ok = err < tol
        failures += not ok
        results[tag] = {"rel_err": float(err), "ok": bool(ok)}
        print(f"{tag}: rel_err {err:.2e} {'OK' if ok else 'FAIL'}",
              flush=True)

    # 1-2. forward kernels
    for dt, xdt, tol, name in [(np.float32, jnp.float32, 1e-5, "fp32"),
                               (jnp.bfloat16, jnp.bfloat16, 2e-2, "bf16")]:
        x = jnp.asarray(x_np, dtype=xdt)
        op = BlockSparseOperator.from_scipy(g.L, symmetric=True, dtype=dt,
                                            rows_per_super=0,
                                            interpret=interpret)
        check(f"v2 {name}", mv(op, x), tol)
        for R in (2, 4):
            op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                                dtype=dt, rows_per_super=R,
                                                interpret=interpret)
            check(f"super R={R} {name}", mv(op, x), tol)

    # 2a2. the slot-order-agnostic UNION kernel (what the row-sharded SPMD
    # lowering runs; matvec's default full-row path picks the slot-
    # scheduled kernel, so this variant needs its own compiled check)
    if not interpret:
        from deepsphere_weather_tpu.ops.pallas_spmm import (
            _bcsr_super_matmul, _super_m_tile)
        op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                            dtype=jnp.bfloat16,
                                            rows_per_super=2)
        svals, _use, _wr, ucols, _uc, sched = op.sup
        mtile = _super_m_tile(ucols.shape[1], 2, 128, 1024,
                              jnp.bfloat16, svals.dtype, 1024)
        xb16 = jnp.asarray(x_np, dtype=jnp.bfloat16)
        xp = jnp.pad(xb16, ((0, op.n_pad - n), (0, 0)))
        y_u = jax.jit(lambda a, t, v: _bcsr_super_matmul(
            a, t, v, mtile, jax.lax.Precision.DEFAULT,
            scheduled=False))(svals, ucols, xp)
        check("union-kernel (row-sharded path) bf16", y_u[:n], 2e-2)
        y_s = jax.jit(lambda a, t, v: _bcsr_super_matmul(
            a, t, v, mtile, jax.lax.Precision.DEFAULT,
            scheduled=True))(svals, sched, xp)
        check("scheduled-kernel (explicit) bf16", y_s[:n], 2e-2)

    # 2a3. the custom_partitioning SPMD path under a REAL device mesh
    # (VERDICT r3 #7: previously validated only in interpret mode on the
    # virtual CPU mesh). Sharded operands route the matvec through
    # _partitioned_spmm's partition rule, so the COMPILED partitioned
    # lowering executes on silicon. With one chip the rule resolves
    # row=None (no >1-way shard exists) and picks the slot-scheduled
    # lowering — a real multi-chip run would additionally exercise the
    # row-sharded union lowering + the x all-gather over ICI (that kernel
    # is compiled-checked standalone in 2a2 above, and the collective
    # algebra on the 8-way virtual mesh by tests/test_parallel.py).
    if not interpret:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        devs = np.array(jax.devices())
        mesh = Mesh(devs.reshape(-1), ("node",))
        op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                            dtype=jnp.bfloat16)
        xsh = NamedSharding(mesh, PartitionSpec("node", None))
        x_sharded = jax.device_put(jnp.asarray(x_np, dtype=jnp.bfloat16),
                                   xsh)
        op_rep = jax.device_put(
            op, NamedSharding(mesh, PartitionSpec()))
        y_mesh = jax.jit(lambda o, v: o.matvec(v),
                         out_shardings=xsh)(op_rep, x_sharded)
        check(f"partitioned matvec on {devs.size}-chip mesh bf16",
              y_mesh, 2e-2)

    # 2b. mixed dtypes: bf16-stored A with fp32 activations exercises the
    # kernel's A-row casts and the branch-doubled VMEM copy model
    # (regression: this combination OOMed scoped VMEM at compile time)
    op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                        dtype=jnp.bfloat16,
                                        interpret=interpret)
    check("super bf16-A/fp32-x", mv(op, jnp.asarray(x_np)), 2e-2)

    # 2c. compiled vmap (ensemble-member) path: the custom_vmap rule folds
    # the member axis into the matvec columns of ONE shared operator —
    # this is the SWAG/DeepEnsemble member-parallel regime
    op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                        interpret=interpret)
    xm = jnp.asarray(np.stack([x_np[:, :256]] * 3) *
                     np.array([1.0, -0.5, 2.0],
                              np.float32)[:, None, None])
    # op goes through as a jit ARGUMENT (closing over it would bake the
    # operator arrays into the HLO as constants — oversized compile
    # payloads on tunneled runtimes)
    ym = jax.jit(jax.vmap(lambda o, v: o.matvec(v),
                          in_axes=(None, 0)))(op, xm)
    refm = np.stack([g.L @ np.asarray(xm[i]) for i in range(3)])
    errm = np.abs(np.asarray(ym) - refm).max() / np.abs(refm).max()
    okm = errm < 1e-5
    failures += not okm
    print(f"vmap x3 members fp32: rel_err {errm:.2e} "
          f"{'OK' if okm else 'FAIL'}", flush=True)

    # 3. backward (fp32, small width)
    xg = jnp.asarray(x_np[:, :256])
    op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                        interpret=interpret)
    grad = jax.jit(jax.grad(lambda o, v: jnp.sum(o.matvec(v) ** 2),
                            argnums=1))(op, xg)
    exp = 2 * (g.L.T @ (g.L @ x_np[:, :256]))
    err = np.abs(np.asarray(grad) - exp).max() / np.abs(exp).max()
    ok = err < 1e-4
    failures += not ok
    print(f"backward symmetric: rel_err {err:.2e} {'OK' if ok else 'FAIL'}")

    gv = build_graph("healpix", {"subdivisions": min(args.subdivisions, 32),
                                 "nest": True},
                     k=args.knn, graph_type="voronoi")
    if not gv.is_symmetric:
        opv = BlockSparseOperator.from_scipy(gv.L, symmetric=False,
                                             interpret=interpret)
        xv = jnp.ones((gv.n_nodes, 256))
        gradv = jax.jit(jax.grad(lambda o, v: jnp.sum(o.matvec(v) ** 2),
                                 argnums=1))(opv, xv)
        ones = np.ones((gv.n_nodes, 256), dtype=np.float32)
        expv = 2 * (gv.L.T @ (gv.L @ ones))
        errv = np.abs(np.asarray(gradv) - expv).max() / np.abs(expv).max()
        okv = errv < 1e-4
        failures += not okv
        print(f"backward non-symmetric (voronoi): rel_err {errv:.2e} "
              f"{'OK' if okv else 'FAIL'}")

    # 4. timing (informational; chained matvecs). A scalar device->host
    # fetch is the only real sync on tunneled runtimes — bare
    # block_until_ready returns before execution and measures nothing
    # (utils.profiling._force_sync).
    from deepsphere_weather_tpu.utils.profiling import _force_sync
    xb = jnp.asarray(x_np, dtype=jnp.bfloat16)
    chain = jax.jit(lambda o, v: o.matvec(o.matvec(o.matvec(o.matvec(v)))))
    for tag, R in [("super R=2", 2), ("v2", 0)]:
        op = BlockSparseOperator.from_scipy(g.L, symmetric=True,
                                            dtype=jnp.bfloat16,
                                            rows_per_super=R,
                                            interpret=interpret)
        _force_sync(chain(op, xb))        # compile + queue drain
        t0 = time.perf_counter()
        r = xb
        for _ in range(20):
            r = chain(op, r)
        _force_sync(r)
        print(f"{tag} bf16: {(time.perf_counter()-t0)/20/4*1e3:.2f} "
              f"ms/matvec (incl. one sync RTT over 80 matvecs)",
              flush=True)

    # committed artifact: what ran compiled on this hardware, with errors
    if not interpret:
        import json

        art = Path(__file__).resolve().parent.parent / "docs" / \
            "benchmarks" / "tpu_kernel_validation.json"
        art.write_text(json.dumps({
            "backend": jax.default_backend(),
            "n_devices": len(jax.devices()),
            "subdivisions": args.subdivisions,
            "knn": args.knn,
            "checks": results,
            "failures": failures,
        }, indent=1))
        print(f"wrote {art}")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
