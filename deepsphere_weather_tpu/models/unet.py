"""UNetSpherical — the flagship architecture.

Faithful re-design of the reference 3-level spherical UNet
(reference: modules/my_models_graph.py:220-564) as a pure-functional JAX
model:

- channel plan: enc ResBlocks (64,128) -> (192,256) -> (512,256);
  dec (256,128), (128,64); final ResBlock to output channels
  (reference :438-485)
- stack skip connections (concat on the channel axis, reference :528-542)
- ReZero residual scaling per ResBlock (reference :192-213)
- optional increment learning: predict the delta from the most recent
  input timestep's dynamic features, scaled by a zero-initialized
  res_increment parameter (reference :500, :558-562). The reference
  hard-codes the dynamic-feature slice to the last 2 channels; here it is
  the last `output_n_feature` channels (same thing for z500/t850).
- input contract [sample, time, node, feature] -> internally
  [sample, node, time*feature] (reference :504-511 named-dim reorder)

The model is a plain object holding static geometry + an explicit params
pytree, so it composes directly with jit / grad / vmap over ensemble
members / lax.scan over AR iterations.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .geometry import ModelGeometry, build_model_geometry
from .layers import ResBlock, block_norm_kwargs

__all__ = ["UNetSpherical"]


class UNetSpherical:
    """3-level spherical UNet over any supported sampling."""

    def __init__(
        self,
        tensor_info: Dict,
        sampling: str,
        sampling_kwargs: Dict,
        # Convolution options
        kernel_size_conv: int = 3,
        conv_type: str = "graph",
        graph_type: str = "knn",
        knn: int = 20,
        periodic_padding: bool = True,
        # ConvBlock options
        bias: bool = True,
        batch_norm: bool = False,
        batch_norm_before_activation: bool = False,
        activation: bool = True,
        activation_fun: str = "relu",
        # Pooling options
        pool_method: str = "max",
        kernel_size_pooling: int = 4,
        # Architecture options
        skip_connection: str = "stack",
        increment_learning: bool = False,
        # TPU options
        numeric_precision: str = "float32",
        dense_threshold: Optional[int] = None,
        use_pallas=None,
        geometry: Optional[ModelGeometry] = None,
    ):
        self.input_n_feature = tensor_info["input_n_feature"]
        self.output_n_feature = tensor_info["output_n_feature"]
        self.input_n_time = tensor_info["input_n_time"]
        self.output_n_time = tensor_info["output_n_time"]
        self.input_n_node = tensor_info["input_shape_info"]["dynamic"]["node"]
        self.output_n_node = tensor_info["output_shape_info"]["dynamic"]["node"]
        self.input_channels = self.input_n_feature * self.input_n_time
        self.output_channels = self.output_n_feature * self.output_n_time
        self.increment_learning = increment_learning
        # mixed precision: params/loss stay fp32, the network computes in
        # compute_dtype (bf16 is the TPU-native MXU dtype; 'float16' maps
        # to bf16 — TPUs have no fp16 units)
        self.compute_dtype = {
            "float32": jnp.float32, "float64": jnp.float32,
            "bfloat16": jnp.bfloat16, "float16": jnp.bfloat16,
        }[str(numeric_precision)]

        if geometry is None:
            geometry = build_model_geometry(
                sampling=sampling,
                sampling_kwargs={**sampling_kwargs},
                depth=3,
                knn=knn,
                graph_type=graph_type,
                conv_type=conv_type,
                pool_method=pool_method,
                kernel_size_pooling=kernel_size_pooling,
                dense_threshold=dense_threshold,
                use_pallas=use_pallas,
                # bf16 models store the BCSR Laplacian blocks in bf16
                # (halves the SpMM A-block HBM reads; the single-pass MXU
                # rounds operands to bf16 regardless)
                operator_dtype=(jnp.bfloat16
                                if self.compute_dtype == jnp.bfloat16
                                else None),
            )
        self.geometry = geometry
        assert geometry.n_nodes[0] == self.input_n_node, (
            f"sampling nodes {geometry.n_nodes[0]} != tensor_info node "
            f"{self.input_n_node}")

        convblock_kwargs = dict(
            kernel_size=kernel_size_conv,
            conv_type=geometry.conv_type,
            bias=bias,
            batch_norm=batch_norm,
            batch_norm_before_activation=batch_norm_before_activation,
            activation=activation,
            activation_fun=activation_fun,
            periodic_padding=periodic_padding,
        )

        def res(level, cin, couts):
            kw = dict(convblock_kwargs)
            if geometry.conv_type == "image":
                samp_kw = geometry.samplings[level].kwargs_dict
                kw["nlat"], kw["nlon"] = samp_kw["nlat"], samp_kw["nlon"]
            return ResBlock(cin, couts, geometry.cheb_ops[level], kw)

        # skip-connection mode: 'stack' (reference concat, :530), 'sum',
        # 'avg', or 'none' — encoder/decoder widths already match at each
        # level, so sum/avg/none only narrow the decoder conv inputs
        # (previously the argument was accepted but silently ignored)
        from ..sphere.samplings import check_skip_connection
        self.skip_connection = check_skip_connection(skip_connection)
        mult = 2 if self.skip_connection == "stack" else 1

        # Channel plan (reference my_models_graph.py:438-485)
        self.conv1 = res(0, self.input_channels, (32 * 2, 64 * 2))
        self.conv2 = res(1, 64 * 2, (96 * 2, 128 * 2))
        self.conv3 = res(2, 128 * 2, (256 * 2, 128 * 2))
        self.uconv2 = res(1, 128 * 2 * mult, (128 * 2, 64 * 2))
        self.uconv1 = res(0, 64 * 2 * mult, (64 * 2, 32 * 2))
        self.uconv1_final = res(0, 32 * 2, self.output_channels)
        self._blocks = {
            "conv1": self.conv1, "conv2": self.conv2, "conv3": self.conv3,
            "uconv2": self.uconv2, "uconv1": self.uconv1,
            "uconv1_final": self.uconv1_final,
        }

    @property
    def has_batch_norm(self) -> bool:
        """True when the model uses stateful ('batch') normalization — eval
        passes then need a norm_state from `prob.bn.bn_update`."""
        return any(blk.norm_kind == "batch"
                   for rb in self._blocks.values() for blk in rb.blocks)

    def init_norm_state(self) -> Dict:
        """Fresh running-stat buffers (torch BN semantics: mean 0, var 1),
        keyed like params. Empty dict when the model has no BatchNorm."""
        state = {}
        for name, rb in self._blocks.items():
            s = rb.init_norm_state()
            if s is not None:
                state[name] = s
        return state

    def _skip(self, h, enc):
        if self.skip_connection == "stack":
            return jnp.concatenate((h, enc), axis=2)
        if self.skip_connection == "sum":
            return h + enc
        if self.skip_connection == "avg":
            return (h + enc) * 0.5
        return h                                       # 'none'

    # ------------------------------------------------------------------
    def init(self, rng) -> Dict:
        keys = jax.random.split(rng, len(self._blocks) + 1)
        params = {name: blk.init(k)
                  for (name, blk), k in zip(self._blocks.items(), keys)}
        if self.increment_learning:
            params["res_increment"] = jnp.zeros((1,), dtype=jnp.float32)
        # learned pooling: trainable logits over the remap sparsity
        # (reference leaves this NotImplemented, modules/layers.py:1107-1133)
        from ..ops.pool import GeneralLearnPool, GeneralLearnUnpool
        for lvl, (p, u) in enumerate(zip(self.geometry.pools,
                                         self.geometry.unpools)):
            if isinstance(p, GeneralLearnPool):
                params[f"pool{lvl}"] = p.init()
            if isinstance(u, GeneralLearnUnpool):
                params[f"unpool{lvl}"] = u.init()
        return params

    # ------------------------------------------------------------------
    def geometry_pytree(self) -> Dict:
        """Geometry as a pytree to pass as a jit ARGUMENT.

        Closure-captured device constants are re-uploaded on every call on
        tunneled TPU runtimes (~50 MB/step for HEALPix-16), so the engine
        device_puts this pytree once and threads it through every jitted
        step. `apply(params, x)` without `geom` still works (tests,
        single-shot use) but pays the constant-upload cost.
        """
        return {
            "cheb_ops": list(self.geometry.cheb_ops),
            "pools": list(self.geometry.pools),
            "unpools": list(self.geometry.unpools),
        }

    def encode(self, params: Dict, x: jnp.ndarray, geom: Optional[Dict] = None,
               norm_state: Optional[Dict] = None, train: bool = True,
               stats_out: Optional[Dict] = None):
        """x: [B, T_in, V, F_in] -> encoder states."""
        if geom is None:
            geom = self.geometry_pytree()
        ops, pools = geom["cheb_ops"], geom["pools"]

        def nkw(name):
            return block_norm_kwargs(self._blocks[name], name, norm_state,
                                     train, stats_out)
        B = x.shape[0]
        # last timestep's dynamic features, for increment learning
        x_last = x[:, -1:, :, -self.output_n_feature:]
        # [B, T, V, F] -> [B, V, T*F]  (time-major flatten, reference :504-511)
        h = jnp.transpose(x, (0, 2, 1, 3)).reshape(
            B, self.input_n_node, self.input_channels).astype(
                self.compute_dtype)

        x_enc1 = self.conv1.apply(params["conv1"], h, cheb_op=ops[0],
                                  **nkw("conv1"))
        x_enc2_ini, idx1 = (pools[0](x_enc1, w=params["pool0"])
                            if "pool0" in params else pools[0](x_enc1))
        x_enc2 = self.conv2.apply(params["conv2"], x_enc2_ini,
                                  cheb_op=ops[1], **nkw("conv2"))
        x_enc3_ini, idx2 = (pools[1](x_enc2, w=params["pool1"])
                            if "pool1" in params else pools[1](x_enc2))
        x_enc3 = self.conv3.apply(params["conv3"], x_enc3_ini,
                                  cheb_op=ops[2], **nkw("conv3"))
        return x_enc3, x_enc2, x_enc1, idx2, idx1, x_last

    def decode(self, params: Dict, x_enc3, x_enc2, x_enc1, idx2, idx1, x_last,
               geom: Optional[Dict] = None,
               norm_state: Optional[Dict] = None, train: bool = True,
               stats_out: Optional[Dict] = None):
        if geom is None:
            geom = self.geometry_pytree()
        ops, unpools = geom["cheb_ops"], geom["unpools"]

        def nkw(name):
            return block_norm_kwargs(self._blocks[name], name, norm_state,
                                     train, stats_out)
        h = (unpools[1](x_enc3, idx2, w=params["unpool1"])
             if "unpool1" in params else unpools[1](x_enc3, idx2))
        h = self._skip(h, x_enc2)                     # reference :530
        h = self.uconv2.apply(params["uconv2"], h, cheb_op=ops[1],
                              **nkw("uconv2"))

        h = (unpools[0](h, idx1, w=params["unpool0"])
             if "unpool0" in params else unpools[0](h, idx1))
        h = self._skip(h, x_enc1)
        h = self.uconv1.apply(params["uconv1"], h, cheb_op=ops[0],
                              **nkw("uconv1"))
        h = self.uconv1_final.apply(params["uconv1_final"], h, cheb_op=ops[0],
                                    **nkw("uconv1_final"))

        B = h.shape[0]
        # [B, V, T*F] -> [B, T_out, V, F_out]; back to fp32 at the model
        # boundary (loss / AR feedback stay full precision)
        h = h.astype(jnp.float32)
        h = h.reshape(B, self.output_n_node, self.output_n_time,
                      self.output_n_feature)
        h = jnp.transpose(h, (0, 2, 1, 3))
        if self.increment_learning:
            h = h * params["res_increment"] + x_last
        return h

    def apply(self, params: Dict, x: jnp.ndarray,
              geom: Optional[Dict] = None,
              norm_state: Optional[Dict] = None, train: bool = True,
              stats_out: Optional[Dict] = None) -> jnp.ndarray:
        """Forward pass: [B, T_in, V, F_in] -> [B, T_out, V, F_out].

        With 'batch' normalization: train=True (default) normalizes with
        the batch's own statistics (torch training mode); train=False
        consumes running stats from norm_state (see prob.bn.bn_update).
        stats_out, when a dict, collects this call's batch statistics.
        """
        if geom is None:
            geom = self.geometry_pytree()
        enc = self.encode(params, x, geom=geom, norm_state=norm_state,
                          train=train, stats_out=stats_out)
        return self.decode(params, *enc, geom=geom, norm_state=norm_state,
                           train=train, stats_out=stats_out)

    __call__ = apply
