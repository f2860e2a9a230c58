"""Decompose the flagship (HEALPix-16 AR6 batch-16 bf16) train step.

Times each stage with chained data-dependent pipelined calls and a single
device->host scalar sync (the only valid timing method on this tunneled
runtime — see docs/benchmarks/README.md):
  - full train_step (loss + grad + adam)
  - value_and_grad only
  - AR6 loss forward only
  - one model.apply forward
  - encoder-only forward
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deepsphere_weather_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from deepsphere_weather_tpu.data.ar import ARIndexer
from deepsphere_weather_tpu.engine.loss import AreaWeights
from deepsphere_weather_tpu.engine.step import (make_context, make_train_step,
                                                make_ar_loss_fn)
from deepsphere_weather_tpu.models import UNetSpherical
from deepsphere_weather_tpu.sphere import build_sampling

SUBDIV, BATCH, AR_ITERS, KNN = 16, 16, 6, 20
N_NODE = 12 * SUBDIV ** 2
N_SCAN = AR_ITERS + 1
IN_FEAT, OUT_FEAT, IN_TIME = 7, 2, 3

tensor_info = {
    "input_n_feature": IN_FEAT, "output_n_feature": OUT_FEAT,
    "input_n_time": IN_TIME, "output_n_time": 1,
    "input_shape_info": {"dynamic": {"node": N_NODE}},
    "output_shape_info": {"dynamic": {"node": N_NODE}},
    "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
}

model = UNetSpherical(
    tensor_info=tensor_info, sampling="healpix",
    sampling_kwargs={"subdivisions": SUBDIV, "nest": True},
    knn=KNN, pool_method="max", increment_learning=True,
    numeric_precision="bfloat16")
params = jax.device_put(model.init(jax.random.key(0)))
indexer = ARIndexer.build([-3, -2, -1], [0], 1, AR_ITERS)
samp = build_sampling("healpix", {"subdivisions": SUBDIV, "nest": True})
area_w = AreaWeights(samp)
optimizer = optax.adam(1e-3, eps=1e-7)
opt_state = jax.device_put(optimizer.init(params))
ctx = make_context(model, area_w)
train_step = make_train_step(model, indexer, optimizer,
                             n_scan_iterations=N_SCAN,
                             ar_training_strategy="RNN")
loss_fn = make_ar_loss_fn(model, indexer, N_SCAN, "RNN")

rng = np.random.default_rng(0)
W = indexer.window_size
batch = jax.device_put({
    "dynamic": rng.standard_normal(
        (BATCH, W, N_NODE, OUT_FEAT)).astype(np.float32),
    "bc": rng.standard_normal((BATCH, W, N_NODE, 1)).astype(np.float32),
    "static": rng.standard_normal(
        (N_NODE, IN_FEAT - OUT_FEAT - 1)).astype(np.float32),
})
w = jnp.ones(N_SCAN) / N_SCAN

geom = jax.device_put(model.geometry_pytree())
x1 = jax.device_put(rng.standard_normal(
    (BATCH, IN_TIME, N_NODE, IN_FEAT)).astype(np.float32))

N = 30


def report(name, dt):
    print(f"{name:28s} {dt * 1e3:8.2f} ms")


# --- full train step: chains through (params, opt_state) naturally -------
# (train_step donates params/opt_state — give it its own copies)
p = jax.device_put(model.init(jax.random.key(1)))
o = jax.device_put(optimizer.init(p))
p, o, tot, _ = train_step(p, o, batch, w, ctx)
_ = float(tot)
t0 = time.perf_counter()
for _ in range(N):
    p, o, tot, _ = train_step(p, o, batch, w, ctx)
_ = float(tot)
report("train_step (full)", (time.perf_counter() - t0) / N)

# The chain perturbation must live INSIDE the jitted function: a separate
# host-dispatched `b + 0*val` op between calls serializes every iteration
# on the tunnel's dispatch RTT and measures ~3x too high.

# --- value_and_grad: loss scalar chained into the batch in-jit ------------
@jax.jit
def vg_chain(pp, b):
    val, g = jax.value_and_grad(lambda q: loss_fn(q, b, w, ctx)[0])(pp)
    # fold the grads into the chain output — returning them unused lets
    # XLA dead-code-eliminate the entire backward pass
    gsum = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))
    return val, dict(b, dynamic=b["dynamic"] + 0.0 * (val + gsum))


b = batch
val, b = vg_chain(params, b)
_ = float(val)
t0 = time.perf_counter()
for _ in range(N):
    val, b = vg_chain(params, b)
_ = float(val)
report("value_and_grad", (time.perf_counter() - t0) / N)

# --- loss forward only -----------------------------------------------------
@jax.jit
def loss_chain(pp, b):
    val = loss_fn(pp, b, w, ctx)[0]
    return val, dict(b, dynamic=b["dynamic"] + 0.0 * val)


b = batch
val, b = loss_chain(params, b)
_ = float(val)
t0 = time.perf_counter()
for _ in range(N):
    val, b = loss_chain(params, b)
_ = float(val)
report("AR6 loss forward", (time.perf_counter() - t0) / N)


# --- one forward / encoder-only: output chained into input in-jit ---------
@jax.jit
def apply_chain(pp, x):
    y = model.apply(pp, x, geom=geom)
    return jnp.sum(y), x + 0.0 * jnp.mean(y).astype(x.dtype)


@jax.jit
def encode_chain(pp, x):
    y = model.encode(pp, x, geom=geom)[0]
    return jnp.sum(y).astype(jnp.float32), \
        x + 0.0 * jnp.mean(y).astype(x.dtype)


for name, fn in [("model.apply x1", apply_chain),
                 ("model.encode x1", encode_chain)]:
    xa = x1
    s, xa = fn(params, xa)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(2 * N):
        s, xa = fn(params, xa)
    _ = float(s)
    report(name, (time.perf_counter() - t0) / (2 * N))
