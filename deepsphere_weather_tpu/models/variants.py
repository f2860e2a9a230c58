"""Alternative architectures: ResNetSpherical, EPDNetSpherical,
ConvNetSpherical, DownscalingNetSpherical.

Parity with the reference's plug-in architecture family selected by
`architecture_name` (reference: modules/my_models_graph_old.py:834-1624):

- ResNetSpherical: 4 ResBlocks (each 4x128 convs back to input channels)
  + 4 ConvBlocks at 128 features + final conv (ref :990-1092)
- EPDNetSpherical: encode (2 convs to 128) -> process (4 ResBlocks at 128)
  -> decode (1 conv) -> final conv (ref :1270-1368)
- ConvNetSpherical: 6 stacked ConvBlocks at 128 features + final conv
  (ref :1540-1608)
- DownscalingNetSpherical: realizes the reference's DownscalingNet ABC
  (modules/models.py:134-145, decode-only forward; the concrete model was
  left as a TODO at my_models_graph_old.py:18): coarse-sampling input ->
  convs on the coarse graph -> conservative-interp unpool to the fine
  sampling -> ResBlock + final conv on the fine graph.

All share the [B, T, V, F] contract and geometry-as-argument convention
of UNetSpherical.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from .geometry import build_model_geometry
from .layers import (ConvBlock, ResBlock, block_has_batch_norm,
                     block_norm_kwargs)

__all__ = ["ResNetSpherical", "EPDNetSpherical", "ConvNetSpherical",
           "DownscalingNetSpherical"]


class _SingleLevelModel:
    """Shared scaffolding for single-level spherical architectures."""

    def __init__(self, tensor_info: Dict, sampling: str, sampling_kwargs: Dict,
                 kernel_size_conv: int = 3, conv_type: str = "graph",
                 graph_type: str = "knn", knn: int = 20,
                 periodic_padding: bool = True, bias: bool = True,
                 batch_norm: bool = False,
                 batch_norm_before_activation: bool = False,
                 activation: bool = True, activation_fun: str = "relu",
                 dense_threshold: Optional[int] = None, use_pallas=None,
                 numeric_precision: str = "float32",
                 **_ignored):
        self.input_n_feature = tensor_info["input_n_feature"]
        self.output_n_feature = tensor_info["output_n_feature"]
        self.input_n_time = tensor_info["input_n_time"]
        self.output_n_time = tensor_info["output_n_time"]
        self.input_n_node = tensor_info["input_shape_info"]["dynamic"]["node"]
        self.output_n_node = tensor_info["output_shape_info"]["dynamic"]["node"]
        self.input_channels = self.input_n_feature * self.input_n_time
        self.output_channels = self.output_n_feature * self.output_n_time
        self.increment_learning = False
        # same mixed-precision contract as UNetSpherical: fp32 params and
        # loss/AR feedback, compute in bf16 when requested ('float16'
        # maps to bf16 — TPUs have no fp16 units). Silently ignoring the
        # flag ran these architectures at 2x the requested HBM traffic.
        import jax.numpy as _jnp
        self.compute_dtype = {
            "float32": _jnp.float32, "float64": _jnp.float32,
            "bfloat16": _jnp.bfloat16, "float16": _jnp.bfloat16,
        }[str(numeric_precision)]

        self.geometry = build_model_geometry(
            sampling=sampling, sampling_kwargs={**sampling_kwargs},
            depth=1, knn=knn, graph_type=graph_type, conv_type=conv_type,
            pool_method="interp" if conv_type == "graph" else "avg",
            dense_threshold=dense_threshold, use_pallas=use_pallas,
            operator_dtype=(_jnp.bfloat16
                            if self.compute_dtype == _jnp.bfloat16
                            else None))

        self.convblock_kwargs = dict(
            kernel_size=kernel_size_conv, conv_type=self.geometry.conv_type,
            bias=bias, batch_norm=batch_norm,
            batch_norm_before_activation=batch_norm_before_activation,
            activation=activation, activation_fun=activation_fun,
            periodic_padding=periodic_padding)
        if self.geometry.conv_type == "image":
            kw = self.geometry.samplings[0].kwargs_dict
            self.convblock_kwargs["nlat"] = kw["nlat"]
            self.convblock_kwargs["nlon"] = kw["nlon"]
        self._op = self.geometry.cheb_ops[0]

    def geometry_pytree(self) -> Dict:
        return {"cheb_ops": list(self.geometry.cheb_ops),
                "pools": [], "unpools": []}

    def _final_kwargs(self) -> Dict:
        kw = dict(self.convblock_kwargs)
        kw["batch_norm"] = False
        kw["activation"] = False
        return kw

    def _reshape_in(self, x):
        B = x.shape[0]
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(
            B, self.input_n_node, self.input_channels).astype(
                self.compute_dtype)

    def _reshape_out(self, h):
        B = h.shape[0]
        h = h.astype(jnp.float32)     # fp32 loss / AR feedback contract
        h = h.reshape(B, self.output_n_node, self.output_n_time,
                      self.output_n_feature)
        return jnp.transpose(h, (0, 2, 1, 3))

    def init(self, rng) -> Dict:
        keys = jax.random.split(rng, len(self._blocks))
        return {name: blk.init(k)
                for (name, blk), k in zip(self._blocks.items(), keys)}

    @property
    def has_batch_norm(self) -> bool:
        """True when the model uses stateful ('batch') normalization — eval
        passes then need a norm_state from `prob.bn.bn_update` (same
        contract as UNetSpherical)."""
        return any(block_has_batch_norm(b) for b in self._blocks.values())

    def init_norm_state(self) -> Dict:
        """Fresh running-stat buffers keyed like params; empty dict when the
        model has no BatchNorm."""
        state = {}
        for name, blk in self._blocks.items():
            s = blk.init_norm_state()
            if s is not None:
                state[name] = s
        return state

    def apply(self, params: Dict, x: jnp.ndarray,
              geom: Optional[Dict] = None,
              norm_state: Optional[Dict] = None, train: bool = True,
              stats_out: Optional[Dict] = None) -> jnp.ndarray:
        if geom is None:
            geom = self.geometry_pytree()
        op = geom["cheb_ops"][0]
        h = self._reshape_in(x)
        for name in self._order:
            h = self._blocks[name].apply(
                params[name], h, cheb_op=op,
                **block_norm_kwargs(self._blocks[name], name, norm_state,
                                    train, stats_out))
        return self._reshape_out(h)

    __call__ = apply


class ResNetSpherical(_SingleLevelModel):
    """4 ResBlocks + 4 ConvBlocks + final (ref my_models_graph_old.py:834-1092)."""

    def __init__(self, tensor_info, sampling, sampling_kwargs, **kwargs):
        super().__init__(tensor_info, sampling, sampling_kwargs, **kwargs)
        n_feat = 128
        res_shape = [n_feat] * 4 + [self.input_channels]
        blocks = {}
        for i in range(1, 5):
            blocks[f"resblock{i}"] = ResBlock(
                self.input_channels, res_shape, self._op,
                self.convblock_kwargs)
        blocks["conv1"] = ConvBlock(self.input_channels, n_feat, self._op,
                                    **self.convblock_kwargs)
        for i in range(2, 5):
            blocks[f"conv{i}"] = ConvBlock(n_feat, n_feat, self._op,
                                           **self.convblock_kwargs)
        blocks["conv_final"] = ConvBlock(n_feat, self.output_channels,
                                         self._op, **self._final_kwargs())
        self._blocks = blocks
        self._order = ["resblock1", "resblock2", "resblock3", "resblock4",
                       "conv1", "conv2", "conv3", "conv4", "conv_final"]


class EPDNetSpherical(_SingleLevelModel):
    """Encode-process-decode (ref my_models_graph_old.py:1111-1368)."""

    def __init__(self, tensor_info, sampling, sampling_kwargs, **kwargs):
        super().__init__(tensor_info, sampling, sampling_kwargs, **kwargs)
        n_feat = 128
        res_shape = [n_feat] * 3
        blocks = {
            "enc_conv1": ConvBlock(self.input_channels, n_feat, self._op,
                                   **self.convblock_kwargs),
            "enc_conv2": ConvBlock(n_feat, n_feat, self._op,
                                   **self.convblock_kwargs),
        }
        for i in range(1, 5):
            blocks[f"resblock{i}"] = ResBlock(n_feat, res_shape, self._op,
                                              self.convblock_kwargs)
        blocks["dec_conv1"] = ConvBlock(n_feat, n_feat, self._op,
                                        **self.convblock_kwargs)
        blocks["conv_final"] = ConvBlock(n_feat, self.output_channels,
                                         self._op, **self._final_kwargs())
        self._blocks = blocks
        self._order = ["enc_conv1", "enc_conv2", "resblock1", "resblock2",
                       "resblock3", "resblock4", "dec_conv1", "conv_final"]


class DownscalingNetSpherical:
    """Decode-only downscaler: coarse-sampling input -> fine-sampling output.

    Realizes the reference's DownscalingNet ABC (modules/models.py:134-145):
    forward(x) = decode(x). `sampling_kwargs` describes the FINE (output)
    sampling; the coarse (input) sampling is its `kernel_size_pooling`-fold
    coarsening, matching the UNet pyramid rule (utils_models.py:91-102).
    tensor_info's input node count must equal the coarse sampling size.
    """

    def __init__(self, tensor_info: Dict, sampling: str, sampling_kwargs: Dict,
                 kernel_size_conv: int = 3, conv_type: str = "graph",
                 graph_type: str = "knn", knn: int = 20,
                 periodic_padding: bool = True, bias: bool = True,
                 batch_norm: bool = False,
                 batch_norm_before_activation: bool = False,
                 activation: bool = True, activation_fun: str = "relu",
                 kernel_size_pooling: int = 4,
                 dense_threshold: Optional[int] = None, use_pallas=None,
                 numeric_precision: str = "float32",
                 **_ignored):
        self.input_n_feature = tensor_info["input_n_feature"]
        self.output_n_feature = tensor_info["output_n_feature"]
        self.input_n_time = tensor_info["input_n_time"]
        self.output_n_time = tensor_info["output_n_time"]
        self.input_n_node = tensor_info["input_shape_info"]["dynamic"]["node"]
        self.output_n_node = tensor_info["output_shape_info"]["dynamic"]["node"]
        self.input_channels = self.input_n_feature * self.input_n_time
        self.output_channels = self.output_n_feature * self.output_n_time
        self.increment_learning = False
        import jax.numpy as _jnp
        self.compute_dtype = {
            "float32": _jnp.float32, "float64": _jnp.float32,
            "bfloat16": _jnp.bfloat16, "float16": _jnp.bfloat16,
        }[str(numeric_precision)]

        # depth=2 pyramid over the FINE sampling: level 0 = fine (output),
        # level 1 = coarse (input); unpools[0] interpolates coarse -> fine.
        self.geometry = build_model_geometry(
            sampling=sampling, sampling_kwargs={**sampling_kwargs},
            depth=2, knn=knn, graph_type=graph_type, conv_type=conv_type,
            pool_method="interp" if conv_type == "graph" else "avg",
            kernel_size_pooling=kernel_size_pooling,
            dense_threshold=dense_threshold, use_pallas=use_pallas,
            operator_dtype=(_jnp.bfloat16
                            if self.compute_dtype == _jnp.bfloat16
                            else None))
        assert self.geometry.n_nodes[1] == self.input_n_node, (
            f"coarse sampling nodes {self.geometry.n_nodes[1]} != "
            f"tensor_info input node {self.input_n_node}")
        assert self.geometry.n_nodes[0] == self.output_n_node, (
            f"fine sampling nodes {self.geometry.n_nodes[0]} != "
            f"tensor_info output node {self.output_n_node}")

        ck = dict(kernel_size=kernel_size_conv,
                  conv_type=self.geometry.conv_type, bias=bias,
                  batch_norm=batch_norm,
                  batch_norm_before_activation=batch_norm_before_activation,
                  activation=activation, activation_fun=activation_fun,
                  periodic_padding=periodic_padding)

        def level_kwargs(level):
            kw = dict(ck)
            if self.geometry.conv_type == "image":
                skw = self.geometry.samplings[level].kwargs_dict
                kw["nlat"], kw["nlon"] = skw["nlat"], skw["nlon"]
            return kw

        n_feat = 128
        final_kw = level_kwargs(0)
        final_kw["batch_norm"] = False
        final_kw["activation"] = False
        self._blocks = {
            "conv_coarse1": ConvBlock(self.input_channels, n_feat,
                                      self.geometry.cheb_ops[1],
                                      **level_kwargs(1)),
            "conv_coarse2": ConvBlock(n_feat, n_feat,
                                      self.geometry.cheb_ops[1],
                                      **level_kwargs(1)),
            "res_fine": ResBlock(n_feat, (n_feat, n_feat),
                                 self.geometry.cheb_ops[0], level_kwargs(0)),
            "conv_final": ConvBlock(n_feat, self.output_channels,
                                    self.geometry.cheb_ops[0], **final_kw),
        }

    def geometry_pytree(self) -> Dict:
        return {"cheb_ops": list(self.geometry.cheb_ops),
                "pools": list(self.geometry.pools),
                "unpools": list(self.geometry.unpools)}

    def init(self, rng) -> Dict:
        keys = jax.random.split(rng, len(self._blocks))
        return {name: blk.init(k)
                for (name, blk), k in zip(self._blocks.items(), keys)}

    @property
    def has_batch_norm(self) -> bool:
        return any(block_has_batch_norm(b) for b in self._blocks.values())

    def init_norm_state(self) -> Dict:
        state = {}
        for name, blk in self._blocks.items():
            s = blk.init_norm_state()
            if s is not None:
                state[name] = s
        return state

    def decode(self, params: Dict, x: jnp.ndarray,
               geom: Optional[Dict] = None,
               norm_state: Optional[Dict] = None, train: bool = True,
               stats_out: Optional[Dict] = None) -> jnp.ndarray:
        if geom is None:
            geom = self.geometry_pytree()
        ops, unpools = geom["cheb_ops"], geom["unpools"]

        def nkw(name):
            return block_norm_kwargs(self._blocks[name], name, norm_state,
                                     train, stats_out)
        B = x.shape[0]
        h = jnp.transpose(x, (0, 2, 1, 3)).reshape(
            B, self.input_n_node, self.input_channels).astype(
                self.compute_dtype)
        h = self._blocks["conv_coarse1"].apply(params["conv_coarse1"], h,
                                               cheb_op=ops[1],
                                               **nkw("conv_coarse1"))
        h = self._blocks["conv_coarse2"].apply(params["conv_coarse2"], h,
                                               cheb_op=ops[1],
                                               **nkw("conv_coarse2"))
        h = unpools[0](h, None)
        h = self._blocks["res_fine"].apply(params["res_fine"], h,
                                           cheb_op=ops[0], **nkw("res_fine"))
        h = self._blocks["conv_final"].apply(params["conv_final"], h,
                                             cheb_op=ops[0],
                                             **nkw("conv_final"))
        h = h.astype(jnp.float32)     # fp32 loss / AR feedback contract
        h = h.reshape(B, self.output_n_node, self.output_n_time,
                      self.output_n_feature)
        return jnp.transpose(h, (0, 2, 1, 3))

    def apply(self, params: Dict, x: jnp.ndarray,
              geom: Optional[Dict] = None,
              norm_state: Optional[Dict] = None, train: bool = True,
              stats_out: Optional[Dict] = None) -> jnp.ndarray:
        """forward = decode (reference models.py:141-145)."""
        return self.decode(params, x, geom=geom, norm_state=norm_state,
                           train=train, stats_out=stats_out)

    __call__ = apply


class ConvNetSpherical(_SingleLevelModel):
    """6 stacked ConvBlocks + final (ref my_models_graph_old.py:1387-1608)."""

    def __init__(self, tensor_info, sampling, sampling_kwargs, **kwargs):
        super().__init__(tensor_info, sampling, sampling_kwargs, **kwargs)
        n_feat = 128
        blocks = {}
        order: List[str] = []
        tmp_in = self.input_channels
        for i in range(1, 7):
            name = f"conv{i}"
            blocks[name] = ConvBlock(tmp_in, n_feat, self._op,
                                     **self.convblock_kwargs)
            order.append(name)
            tmp_in = n_feat
        blocks["conv_final"] = ConvBlock(n_feat, self.output_channels,
                                         self._op, **self._final_kwargs())
        order.append("conv_final")
        self._blocks = blocks
        self._order = order
