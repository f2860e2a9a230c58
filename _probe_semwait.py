"""What does a DMA completion increment its semaphore by? (hang-free probe)

Starts NCP same-size DMAs on one shared sem, burns scalar+vector time,
then NON-BLOCKING semaphore_read -> o_ref[0,0]; then drains with the
known-good per-descriptor waits and writes the gathered sum (correctness
check). unit = read_value / NCP.

A candidate single `semaphore_wait(sem, guess)` with a wrong guess would
deadlock and wedge the tunneled chip for ~20+ min, so measure first.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS, MT, NBLK, NCP = 128, 256, 4, 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel(sched_ref, x_hbm, o_ref, buf, sem, scratch):
    s = pl.program_id(0)

    def descr(j):
        c = sched_ref[s, j]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * BS, BS), :],
            buf.at[pl.ds(j * BS, BS)],
            sem.at[0])

    for j in range(NCP):
        descr(j).start()

    # spin on effectful reads (sequenced, can't be hoisted): the LAST
    # read lands well after the DMAs complete
    acc = scratch[:]
    v = lax.fori_loop(
        0, 2000, lambda i, c: pltpu.semaphore_read(sem.at[0]) | (0 & c), 0)

    for j in range(NCP):
        descr(j).wait()

    out = jnp.zeros((BS, MT), jnp.float32)
    for j in range(NCP):
        out = out + buf[pl.ds(j * BS, BS)]
    # row 0: sem_value broadcast (scatter is unsupported; mask instead)
    row = lax.broadcasted_iota(jnp.int32, (BS, MT), 0)
    out = jnp.where(row == 0, v.astype(jnp.float32), out)
    out = out + 0.0 * acc[0, 0]
    o_ref[:] = out


def run():
    x = np.arange(NBLK * BS * MT, dtype=np.float32).reshape(NBLK * BS, MT) % 251
    sched = np.array([[1, 3, 0], [2, 0, 1]], np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BS, MT), lambda s, *_: (s, 0)),
        scratch_shapes=[pltpu.VMEM((NCP * BS, MT), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,)),
                        pltpu.VMEM((MT, MT), jnp.float32)],
    )
    k = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((2 * BS, MT),
                                                      jnp.float32))
    y = np.asarray(jax.jit(k)(jnp.asarray(sched), jnp.asarray(x)))
    ref0 = x[BS:2*BS] + x[3*BS:4*BS] + x[0:BS]
    ref1 = x[2*BS:3*BS] + x[0:BS] + x[BS:2*BS]
    ok = (np.allclose(y[1:BS], ref0[1:])
          and np.allclose(y[BS+1:], ref1[1:]))
    per_dma = y[0, 0] / NCP
    nbytes = BS * MT * 4
    log(f"sem value after {NCP} DMAs: {y[0,0]:.0f} (per-DMA {per_dma:.1f}; "
        f"transfer bytes={nbytes}) data {'OK' if ok else 'FAIL'}")
    log(f"  -> unit = {'BYTES' if abs(per_dma - nbytes) < 1 else 'COUNT' if abs(per_dma - 1) < 0.1 else 'OTHER'}")


if __name__ == "__main__":
    run()
