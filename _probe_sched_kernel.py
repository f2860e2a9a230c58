"""On-chip validation + timing: scheduled vs plain super-row kernel."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from deepsphere_weather_tpu.sphere.graph import build_graph
from deepsphere_weather_tpu.ops.pallas_spmm import (
    bcsr_super_from_scipy, _bcsr_super_matmul, _super_m_tile,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(subdiv, M, dtype, R=2):
    g = build_graph("healpix", {"subdivisions": subdiv, "nest": True}, k=20)
    L = g.L
    import ml_dtypes
    if dtype == "bf16":
        adt = np.dtype(ml_dtypes.bfloat16)
        xdt = jnp.bfloat16
        prec = jax.lax.Precision.DEFAULT
    else:
        adt = np.float32
        xdt = jnp.float32
        prec = jax.lax.Precision.HIGHEST
    svals, use, wait_row, ucols, ucount, sched, n_pad = \
        bcsr_super_from_scipy(L, rows_per_super=R, dtype=adt)
    max_u = ucols.shape[1]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_pad, M)).astype(np.float32)
    xj = jnp.asarray(x, dtype=xdt)
    mt = _super_m_tile(max_u, R, 128, M, xdt, jnp.asarray(svals).dtype, 1024)
    log(f"HP-{subdiv} M={M} {dtype}: max_u={max_u} mt={mt} n_mt={M//mt}")

    log("  correctness: compiling sched")
    f_sched = jax.jit(lambda a, t, v: _bcsr_super_matmul(
        a, t, v, mt, prec, scheduled=True))
    f_plain = jax.jit(lambda a, t, v: _bcsr_super_matmul(
        a, t, v, mt, prec, scheduled=False))

    sv, uc, sc = jnp.asarray(svals), jnp.asarray(ucols), jnp.asarray(sched)
    log("  run sched")
    y_s = np.asarray(f_sched(sv, sc, xj)[:L.shape[0]], dtype=np.float32)
    log("  run plain")
    y_p = np.asarray(f_plain(sv, uc, xj)[:L.shape[0]], dtype=np.float32)
    ref = L @ (np.asarray(xj, dtype=np.float32))
    tol = 2e-2 if dtype == "bf16" else 2e-5
    es = np.abs(y_s - ref).max() / (np.abs(ref).max() + 1e-9)
    ep = np.abs(y_p - ref).max() / (np.abs(ref).max() + 1e-9)
    log(f"  rel-err sched={es:.2e} plain={ep:.2e} "
        f"{'OK' if es < tol and ep < tol else 'FAIL'}")
    assert es < tol, "scheduled kernel WRONG"

    # chain matvecs inside ONE jit: per-dispatch tunnel latency (~2 ms on
    # this axon-tunneled chip) would otherwise swamp the kernel time
    NCH = 32

    def chain(scheduled):
        def f(a, t, v):
            def step(c, _):
                y = _bcsr_super_matmul(a, t, c, mt, prec,
                                       scheduled=scheduled)
                return y[:n_pad].astype(xdt), 0.0

            out, _ = jax.lax.scan(step, v, None, length=NCH)
            return out
        return jax.jit(f)

    def bench(f, t, v):
        # D2H scalar fetch is the only real sync on this tunneled runtime
        # (block_until_ready returns before execution)
        float(f(sv, t, v)[0, 0])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            f(sv, t, v)
        float(f(sv, t, v)[0, 0])
        return (time.perf_counter() - t0) / (reps * NCH) * 1e3

    log("  bench sched")
    ts = bench(chain(True), sc, xj)
    log("  bench plain")
    tp = bench(chain(False), uc, xj)
    log(f"  time sched={ts:.3f} ms plain={tp:.3f} ms speedup={tp/ts:.2f}x")


if __name__ == "__main__":
    cases = sys.argv[1:] or ["16,1024,bf16"]
    for c in cases:
        parts = c.split(",")
        sd, m, dt = int(parts[0]), int(parts[1]), parts[2]
        R = int(parts[3]) if len(parts) > 3 else 2
        run(sd, m, dt, R=R)
