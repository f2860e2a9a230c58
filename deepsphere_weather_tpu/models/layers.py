"""Functional model building blocks: ConvBlock, ResBlock.

Pure-functional re-design of the reference's torch blocks
(reference: modules/my_models_graph.py:26-216): parameters live in nested
dict pytrees, apply functions are pure, so the whole model composes with
jit / grad / vmap (ensemble members) / lax.scan (AR rollout).

Initialization reproduces the reference's activation-aware He/Glorot table
(reference: modules/layers.py:253-343): scale 2 for ReLU-family
activations, 1 for linear-family; fan='in' = in_channels * kernel_size;
normal distribution; zero bias.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cheb import ChebOperator, cheb_conv
from ..ops.conv2d import equiangular_conv2d

__all__ = ["get_activation", "init_cheb_weight", "ConvBlock", "ResBlock",
           "block_has_batch_norm", "block_norm_kwargs"]

_RELU_FAMILY = {
    "relu", "celu", "selu", "prelu", "hardswish", "mish", "silu", "swish",
    "gelu", "softplus", "softmax", "logsigmoid", "relu6", "rrelu", "rrlu",
    "leaky_relu", "elu",
}
_LINEAR_FAMILY = {
    "linear", "identity", "hardshrink", "sigmoid", "hardsigmoid", "tanh",
    "hardtanh", "softsign",
}

_ACT_MAP = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "softplus": jax.nn.softplus,
    "leaky_relu": jax.nn.leaky_relu,
    "logsigmoid": jax.nn.log_sigmoid,
    "sigmoid": jax.nn.sigmoid,
    "hardsigmoid": jax.nn.hard_sigmoid,
    "tanh": jnp.tanh,
    "hardtanh": jax.nn.hard_tanh,
    "softsign": jax.nn.soft_sign,
    "hardswish": jax.nn.hard_swish,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "hardshrink": lambda x: jnp.where(jnp.abs(x) > 0.5, x, 0.0),
    # torch PReLU initializes its slope at 0.25; the functional stand-in
    # is a fixed-slope leaky relu. RReLU in eval mode uses the mean slope
    # (1/8 + 1/3) / 2 (torch defaults).
    "prelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.25),
    "rrelu": lambda x: jax.nn.leaky_relu(
        x, negative_slope=(1 / 8 + 1 / 3) / 2),
    "rrlu": lambda x: jax.nn.leaky_relu(        # legacy misspelled alias
        x, negative_slope=(1 / 8 + 1 / 3) / 2),
    "linear": lambda x: x,
    "identity": lambda x: x,
}


def get_activation(name: str) -> Callable:
    """Resolve an activation-function name (reference uses torch.nn.functional
    names, modules/my_models_graph.py:103)."""
    key = name.lower()
    if key not in _ACT_MAP:
        raise ValueError(f"unknown activation_fun {name!r}")
    return _ACT_MAP[key]


def _he_scale(activation: str) -> float:
    key = activation.lower()
    if key in _RELU_FAMILY:
        return 2.0
    if key in _LINEAR_FAMILY:
        return 1.0
    raise ValueError(f"Unknown activation {activation!r} for init scale")


def init_cheb_weight(rng, in_channels: int, out_channels: int, kernel_size: int,
                     activation: str = "relu", fan: str = "in",
                     distribution: str = "normal") -> jnp.ndarray:
    """He/Glorot init for a [Fin, K, Fout] Chebyshev weight
    (reference: modules/layers.py:253-343)."""
    if fan == "in":
        fan_v = in_channels * kernel_size
    elif fan == "out":
        fan_v = out_channels * kernel_size
    elif fan == "avg":
        fan_v = (in_channels + out_channels) / 2 * kernel_size
    else:
        raise ValueError("unknown fan")
    scale = _he_scale(activation)
    shape = (in_channels, kernel_size, out_channels)
    if distribution == "normal":
        std = np.sqrt(scale / fan_v)
        return std * jax.random.normal(rng, shape, dtype=jnp.float32)
    if distribution == "uniform":
        limit = np.sqrt(3 * scale / fan_v)
        return jax.random.uniform(rng, shape, minval=-limit, maxval=limit,
                                  dtype=jnp.float32)
    raise ValueError("unknown distribution")


class ConvBlock:
    """conv -> [norm] -> activation -> [norm] (reference my_models_graph.py:26-118).

    conv_type='graph' uses the Chebyshev conv over the level's Laplacian;
    conv_type='image' uses the equiangular 2D conv.

    Normalization (`batch_norm`):
    - True / 'batch': TRUE BatchNorm matching torch.nn.BatchNorm1d
      semantics (reference my_models_graph.py:97-99): per-channel stats
      over (batch, node); training normalizes with the batch's own
      (biased) statistics, evaluation with running statistics supplied via
      `norm_state` (collected by `prob.bn.bn_update`, the reference's SWAG
      bn_update pass — utils_swag.py:58-165). eps 1e-5.
    - 'layer': stateless LayerNorm over channels — the TPU-preferred
      alternative (no cross-batch state inside the AR scan, vmap-safe;
      SURVEY.md §7 hard part 5). This was what batch_norm=True meant
      before round 2; it remains available behind the explicit name.
    - False: no normalization (every shipped reference config).
    """

    def __init__(self, in_channels: int, out_channels: int,
                 cheb_op: Optional[ChebOperator],
                 kernel_size: int = 3, conv_type: str = "graph",
                 bias: bool = True, batch_norm=False,
                 batch_norm_before_activation: bool = False,
                 activation: bool = True, activation_fun: str = "relu",
                 periodic_padding: bool = True,
                 nlat: Optional[int] = None, nlon: Optional[int] = None):
        if batch_norm is True or batch_norm == "batch":
            self.norm_kind: Optional[str] = "batch"
        elif batch_norm in ("layer", "layernorm"):
            self.norm_kind = "layer"
        elif not batch_norm:
            self.norm_kind = None
        else:
            raise ValueError(f"batch_norm must be bool, 'batch' or 'layer'; "
                             f"got {batch_norm!r}")
        if self.norm_kind:
            bias = False
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.cheb_op = cheb_op
        self.kernel_size = kernel_size
        self.conv_type = conv_type
        self.bias = bias
        self.norm = self.norm_kind is not None
        self.norm_before_act = batch_norm_before_activation
        self.act = activation
        self.act_name = activation_fun
        self.act_fun = get_activation(activation_fun)
        self.periodic_padding = periodic_padding
        self.nlat, self.nlon = nlat, nlon

    def init(self, rng) -> Dict:
        k_w, k_b = jax.random.split(rng)
        act_for_init = self.act_name if self.act else "linear"
        params: Dict = {}
        if self.conv_type == "graph":
            params["weight"] = init_cheb_weight(
                k_w, self.in_channels, self.out_channels, self.kernel_size,
                activation=act_for_init)
        else:
            # HWIO kernel for the equiangular image conv
            fan_v = self.in_channels * self.kernel_size ** 2
            std = np.sqrt(_he_scale(act_for_init) / fan_v)
            params["weight"] = std * jax.random.normal(
                k_w, (self.kernel_size, self.kernel_size,
                      self.in_channels, self.out_channels), dtype=jnp.float32)
        if self.bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype=jnp.float32)
        if self.norm:
            params["norm_scale"] = jnp.ones((self.out_channels,), dtype=jnp.float32)
            params["norm_bias"] = jnp.zeros((self.out_channels,), dtype=jnp.float32)
        return params

    def init_norm_state(self) -> Optional[Dict]:
        """Running statistics for 'batch' normalization (torch BN buffers);
        None for stateless kinds."""
        if self.norm_kind != "batch":
            return None
        return {"mean": jnp.zeros((self.out_channels,), dtype=jnp.float32),
                "var": jnp.ones((self.out_channels,), dtype=jnp.float32)}

    def _apply_norm(self, params, x, norm_state=None, train=True,
                    stats_out: Optional[Dict] = None):
        # normalization statistics in fp32 regardless of compute dtype
        x32 = x.astype(jnp.float32)
        if self.norm_kind == "layer":
            mean = x32.mean(axis=-1, keepdims=True)
            var = x32.var(axis=-1, keepdims=True)
        elif train or norm_state is None:
            # torch BN training mode: per-channel biased stats over all
            # leading (batch, node) axes
            axes = tuple(range(x32.ndim - 1))
            mean = x32.mean(axis=axes)
            var = x32.var(axis=axes)
            if stats_out is not None:
                # unbiased variance for the RUNNING update (torch semantics)
                n = x32.size // x32.shape[-1]
                stats_out["mean"] = mean
                stats_out["var"] = var * (n / max(n - 1, 1))
        else:
            mean = norm_state["mean"]
            var = norm_state["var"]
        xn = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (xn * params["norm_scale"]
                + params["norm_bias"]).astype(x.dtype)

    def apply(self, params: Dict, x: jnp.ndarray,
              cheb_op: Optional[ChebOperator] = None,
              norm_state: Optional[Dict] = None, train: bool = True,
              stats_out: Optional[Dict] = None) -> jnp.ndarray:
        """cheb_op, when given, overrides the stored operator — the engine
        passes geometry as a jit ARGUMENT (device-resident) because
        closure-captured constants are re-uploaded per call on tunneled
        TPU runtimes.

        norm_state/train/stats_out only matter for 'batch' normalization:
        eval (train=False) consumes running stats from norm_state; a
        bn_update pass passes a dict as stats_out to collect this call's
        batch statistics (traced values, returned through the jit output).
        """
        bias = params.get("bias")
        if self.conv_type == "graph":
            x = cheb_conv(cheb_op if cheb_op is not None else self.cheb_op,
                          x, params["weight"], bias)
        else:
            x = equiangular_conv2d(x, params["weight"], bias,
                                   self.nlat, self.nlon, self.periodic_padding)
        if self.norm and self.norm_before_act:
            x = self._apply_norm(params, x, norm_state, train, stats_out)
        if self.act:
            x = self.act_fun(x)
        if self.norm and not self.norm_before_act:
            x = self._apply_norm(params, x, norm_state, train, stats_out)
        return x


class ResBlock:
    """Stack of ConvBlocks + ReZero residual (reference my_models_graph.py:121-216).

    The last ConvBlock has no activation; the residual connection is identity
    when channels match, else a Linear projection; the branch is scaled by a
    zero-initialized ReZero weight.
    """

    def __init__(self, in_channels: int, out_channels, cheb_op,
                 convblock_kwargs: Dict):
        if isinstance(out_channels, int):
            out_channels = [out_channels]
        self.in_channels = in_channels
        self.out_channels = list(out_channels)
        self.blocks = []
        tmp_in = in_channels
        n = len(self.out_channels)
        for i, tmp_out in enumerate(self.out_channels):
            kw = dict(convblock_kwargs)
            if i == n - 1:
                kw["activation"] = False
            self.blocks.append(ConvBlock(tmp_in, tmp_out, cheb_op, **kw))
            tmp_in = tmp_out
        self.needs_projection = in_channels != self.out_channels[-1]

    def init(self, rng) -> Dict:
        keys = jax.random.split(rng, len(self.blocks) + 2)
        params: Dict = {
            f"convblock{i + 1}": blk.init(keys[i])
            for i, blk in enumerate(self.blocks)
        }
        if self.blocks[-1].norm_kind == "batch":
            # reference zero-inits the LAST BN's weight and bias in each
            # residual branch so the block starts as identity
            # (my_models_graph.py:198-201)
            last = params[f"convblock{len(self.blocks)}"]
            last["norm_scale"] = jnp.zeros_like(last["norm_scale"])
            last["norm_bias"] = jnp.zeros_like(last["norm_bias"])
        params["rezero_weight"] = jnp.zeros((1,), dtype=jnp.float32)
        if self.needs_projection:
            # torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            limit = 1.0 / np.sqrt(self.in_channels)
            params["res_kernel"] = jax.random.uniform(
                keys[-1], (self.in_channels, self.out_channels[-1]),
                minval=-limit, maxval=limit, dtype=jnp.float32)
            params["res_bias"] = jnp.zeros((self.out_channels[-1],),
                                           dtype=jnp.float32)
        return params

    def init_norm_state(self) -> Optional[Dict]:
        """Running-stat buffers for 'batch' normalization, keyed like
        params; None when the block has no stateful norm."""
        state = {f"convblock{i + 1}": blk.init_norm_state()
                 for i, blk in enumerate(self.blocks)}
        if all(v is None for v in state.values()):
            return None
        return state

    def apply(self, params: Dict, x: jnp.ndarray,
              cheb_op: Optional[ChebOperator] = None,
              norm_state: Optional[Dict] = None, train: bool = True,
              stats_out: Optional[Dict] = None) -> jnp.ndarray:
        out = x
        for i, blk in enumerate(self.blocks):
            key = f"convblock{i + 1}"
            sub_stats = None
            if stats_out is not None and blk.norm_kind == "batch":
                sub_stats = stats_out.setdefault(key, {})
            out = blk.apply(params[key], out, cheb_op=cheb_op,
                            norm_state=(norm_state or {}).get(key),
                            train=train, stats_out=sub_stats)
        out = out * params["rezero_weight"].astype(out.dtype)
        if self.needs_projection:
            res = (jnp.dot(x, params["res_kernel"].astype(x.dtype),
                           preferred_element_type=jnp.float32).astype(x.dtype)
                   + params["res_bias"].astype(x.dtype))
        else:
            res = x
        return out + res


def block_has_batch_norm(block) -> bool:
    """True when a ConvBlock — or any ConvBlock inside a ResBlock — uses
    stateful 'batch' normalization (and therefore needs norm_state at
    eval time)."""
    if isinstance(block, ResBlock):
        return any(b.norm_kind == "batch" for b in block.blocks)
    return block.norm_kind == "batch"


def block_norm_kwargs(block, name: str, norm_state: Optional[Dict],
                      train: bool, stats_out: Optional[Dict]) -> Dict:
    """Per-block norm_state/train/stats_out kwargs for ConvBlock/ResBlock
    apply() calls — the one place the norm_state routing convention lives
    (shared by every architecture)."""
    kw: Dict = {"norm_state": (norm_state or {}).get(name), "train": train}
    if stats_out is not None and block_has_batch_norm(block):
        kw["stats_out"] = stats_out.setdefault(name, {})
    return kw
