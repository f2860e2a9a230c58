"""Numerical-parity rig: the JAX framework vs a PyTorch reference-stack
twin, at IDENTICAL weights.

The north star demands "z500/t850 RMSE parity" with the reference
(BASELINE.md). The reference stack itself (torch + external pygsp/CDO
binaries) does not run here, so this rig re-expresses its exact model
semantics (reference: modules/layers.py:113-376, my_models_graph.py:26-564
— torch.sparse.mm Chebyshev recurrence, MaxPool1d/MaxUnpool1d on nested
HEALPix, ReZero ResBlocks with Linear residual projections, increment
learning, area-weighted MSE 'mean' reduction, RNN-strategy AR feedback) in
~200 lines of torch, loads the SAME weights into both models, and asserts:

1. per-block forward agreement (ResBlock by ResBlock)
2. full-model forward agreement
3. backward agreement (gradients of the AR loss w.r.t. every parameter)
4. same-trajectory training: N Adam steps on identical batches produce
   matching loss curves

Run `python scripts/run_parity.py` to execute everything and regenerate
docs/PARITY_NUMERIC.md; tests/test_parity.py runs the fast subset in CI.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import torch


# ---------------------------------------------------------------------------
# Reference-semantics torch blocks
# ---------------------------------------------------------------------------

def conv_cheb_torch(lap: torch.Tensor, x: torch.Tensor, weight: torch.Tensor,
                    bias: Optional[torch.Tensor]) -> torch.Tensor:
    """K-term Chebyshev conv, direct recurrence (reference layers.py:113-180).

    lap: sparse [V, V]; x: [B, V, Fin]; weight: [Fin, K, Fout].
    out = sum_k T_k(L) x W_k  with T_0 = I, T_1 = L, T_k = 2 L T_{k-1} - T_{k-2}.
    """
    B, V, Fin = x.shape
    _, K, Fout = weight.shape
    x0 = x.permute(1, 2, 0).reshape(V, Fin * B)         # [V, Fin*B]
    xs = [x0]
    if K > 1:
        xs.append(torch.sparse.mm(lap, x0))
    for _ in range(2, K):
        xs.append(2.0 * torch.sparse.mm(lap, xs[-1]) - xs[-2])
    xk = torch.stack(xs, dim=0).reshape(K, V, Fin, B)
    xk = xk.permute(3, 1, 2, 0)                          # [B, V, Fin, K]
    out = torch.einsum("bvfk,fko->bvo", xk, weight)
    if bias is not None:
        out = out + bias
    return out


class TorchConvBlock(torch.nn.Module):
    """conv -> [bn] -> activation -> [bn]
    (reference my_models_graph.py:26-118; conv bias dropped when
    batch_norm, BN applied on [batch, channel, node] via permute exactly
    like the reference's forward :105-118)."""

    def __init__(self, fin: int, fout: int, K: int = 3, act: bool = True,
                 batch_norm: bool = False):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.zeros(fin, K, fout))
        self.bias = (None if batch_norm
                     else torch.nn.Parameter(torch.zeros(fout)))
        self.bn = torch.nn.BatchNorm1d(fout) if batch_norm else None
        self.act = act

    def forward(self, lap, x):
        x = conv_cheb_torch(lap, x, self.weight, self.bias)
        if self.act:
            x = torch.relu(x)
        if self.bn is not None:
            # reference: batch_norm_before_activation=False default
            x = self.bn(x.permute(0, 2, 1)).permute(0, 2, 1)
        return x


class TorchResBlock(torch.nn.Module):
    """ConvBlock stack + ReZero residual (reference my_models_graph.py:121-216):
    last ConvBlock unactivated, branch scaled by zero-init rezero weight,
    identity residual when channels match else Linear projection. With
    batch_norm, the LAST ConvBlock's BN weight/bias are zero-initialized
    (reference :198-201)."""

    def __init__(self, fin: int, fouts, K: int = 3, batch_norm: bool = False):
        super().__init__()
        if isinstance(fouts, int):
            fouts = [fouts]
        chans = [fin] + list(fouts)
        self.convs = torch.nn.ModuleList([
            TorchConvBlock(chans[i], chans[i + 1], K=K,
                           act=(i < len(fouts) - 1), batch_norm=batch_norm)
            for i in range(len(fouts))
        ])
        if batch_norm:
            torch.nn.init.constant_(self.convs[-1].bn.weight, 0)
            torch.nn.init.constant_(self.convs[-1].bn.bias, 0)
        self.rezero = torch.nn.Parameter(torch.zeros(1))
        self.proj = (torch.nn.Linear(fin, fouts[-1])
                     if fin != fouts[-1] else None)

    def forward(self, lap, x):
        out = x
        for c in self.convs:
            out = c(lap, out)
        out = out * self.rezero
        res = self.proj(x) if self.proj is not None else x
        return out + res


def healpix_max_pool(x: torch.Tensor, k: int = 4):
    B, V, C = x.shape
    g = x.reshape(B, V // k, k, C)
    pooled, idx = g.max(dim=2)
    return pooled, idx


def healpix_max_unpool(x: torch.Tensor, idx: torch.Tensor, k: int = 4):
    B, D, C = x.shape
    out = x.new_zeros(B, D, k, C)
    out.scatter_(2, idx.unsqueeze(2), x.unsqueeze(2))
    return out.reshape(B, D * k, C)


class TorchUNetSpherical(torch.nn.Module):
    """Reference-semantics UNetSpherical twin of models/unet.py.

    laps: list of 3 torch sparse Laplacians (finest first) — built from the
    SAME scipy matrices the JAX model uses, so any output difference is
    arithmetic, not geometry.
    """

    def __init__(self, laps: List[torch.Tensor], in_channels: int,
                 out_channels: int, out_feat: int,
                 increment_learning: bool = True,
                 batch_norm: bool = False):
        super().__init__()
        self.laps = laps
        self.out_feat = out_feat
        self.increment = increment_learning
        bn = batch_norm
        self.conv1 = TorchResBlock(in_channels, (64, 128), batch_norm=bn)
        self.conv2 = TorchResBlock(128, (192, 256), batch_norm=bn)
        self.conv3 = TorchResBlock(256, (512, 256), batch_norm=bn)
        self.uconv2 = TorchResBlock(512, (256, 128), batch_norm=bn)
        self.uconv1 = TorchResBlock(256, (128, 64), batch_norm=bn)
        self.uconv1_final = TorchResBlock(64, out_channels, batch_norm=bn)
        if increment_learning:
            self.res_increment = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        """x: [B, T_in, V, F_in] -> [B, T_out, V, F_out] (same contract as
        the JAX model; reference named-dim reorder my_models_graph.py:504-511)."""
        B, T, V, F = x.shape
        x_last = x[:, -1:, :, -self.out_feat:]
        h = x.permute(0, 2, 1, 3).reshape(B, V, T * F)

        e1 = self.conv1(self.laps[0], h)
        p1, i1 = healpix_max_pool(e1)
        e2 = self.conv2(self.laps[1], p1)
        p2, i2 = healpix_max_pool(e2)
        e3 = self.conv3(self.laps[2], p2)

        d = healpix_max_unpool(e3, i2)
        d = torch.cat([d, e2], dim=2)                   # stack skip
        d = self.uconv2(self.laps[1], d)
        d = healpix_max_unpool(d, i1)
        d = torch.cat([d, e1], dim=2)
        d = self.uconv1(self.laps[0], d)
        d = self.uconv1_final(self.laps[0], d)

        out_ch = d.shape[-1]
        n_time_out = out_ch // self.out_feat
        d = d.reshape(B, V, n_time_out, self.out_feat).permute(0, 2, 1, 3)
        if self.increment:
            d = d * self.res_increment + x_last
        return d


# ---------------------------------------------------------------------------
# Weight transfer: JAX params pytree -> torch module
# ---------------------------------------------------------------------------

def _load_resblock(tblk: TorchResBlock, p: Dict) -> None:
    with torch.no_grad():
        for i, conv in enumerate(tblk.convs):
            cp = p[f"convblock{i + 1}"]
            conv.weight.copy_(torch.from_numpy(np.asarray(cp["weight"])))
            if conv.bias is not None:
                conv.bias.copy_(torch.from_numpy(np.asarray(cp["bias"])))
            if conv.bn is not None:
                conv.bn.weight.copy_(
                    torch.from_numpy(np.asarray(cp["norm_scale"])))
                conv.bn.bias.copy_(
                    torch.from_numpy(np.asarray(cp["norm_bias"])))
        tblk.rezero.copy_(torch.from_numpy(np.asarray(p["rezero_weight"])))
        if tblk.proj is not None:
            # JAX res_kernel is [in, out]; torch Linear weight is [out, in]
            tblk.proj.weight.copy_(
                torch.from_numpy(np.asarray(p["res_kernel"])).T)
            tblk.proj.bias.copy_(torch.from_numpy(np.asarray(p["res_bias"])))


def torch_running_stats(tmodel: "TorchUNetSpherical") -> Dict:
    """The torch twin's BN running statistics as a norm_state-shaped
    pytree (models/unet.py::init_norm_state layout) — golden values for
    the jitted running update (engine/step.py::fold_running_stats)."""
    state: Dict = {}
    for name in ("conv1", "conv2", "conv3", "uconv2", "uconv1",
                 "uconv1_final"):
        blk = getattr(tmodel, name)
        if blk.convs[0].bn is None:
            continue
        state[name] = {
            f"convblock{i + 1}": {
                "mean": conv.bn.running_mean.detach().numpy().copy(),
                "var": conv.bn.running_var.detach().numpy().copy(),
            }
            for i, conv in enumerate(blk.convs)
        }
    return state


def load_running_stats_into_torch(tmodel: "TorchUNetSpherical",
                                  norm_state: Dict) -> None:
    """Copy a JAX norm_state pytree into the torch twin's BN buffers."""
    with torch.no_grad():
        for name, blk_state in norm_state.items():
            blk = getattr(tmodel, name)
            for i, conv in enumerate(blk.convs):
                s = blk_state[f"convblock{i + 1}"]
                conv.bn.running_mean.copy_(
                    torch.from_numpy(np.asarray(s["mean"])))
                conv.bn.running_var.copy_(
                    torch.from_numpy(np.asarray(s["var"])))


def load_params_into_torch(tmodel: TorchUNetSpherical, params: Dict) -> None:
    """Copy a JAX UNetSpherical params pytree into the torch twin."""
    for name in ("conv1", "conv2", "conv3", "uconv2", "uconv1",
                 "uconv1_final"):
        _load_resblock(getattr(tmodel, name), params[name])
    if tmodel.increment:
        with torch.no_grad():
            tmodel.res_increment.copy_(
                torch.from_numpy(np.asarray(params["res_increment"])))


def torch_laplacians(sampling_kwargs: Dict, knn: int,
                     depth: int = 3) -> List[torch.Tensor]:
    """The SAME Laplacians the JAX geometry uses, as torch sparse COO.

    Reads through the geometry disk cache (models/geometry.py) so the
    torch twin gets the bit-identical matrix the JAX model operates
    with — a fresh build_graph would re-run the lmax estimate and any
    estimator drift would masquerade as model disagreement."""
    from deepsphere_weather_tpu.models.geometry import (
        _cached_graph_laplacian)

    laps = []
    sub = sampling_kwargs["subdivisions"]
    for _ in range(depth):
        _, L = _cached_graph_laplacian(
            "healpix", {"subdivisions": sub, "nest": True}, knn, "knn")
        coo = L.tocoo()
        idx = torch.from_numpy(
            np.stack([coo.row, coo.col]).astype(np.int64))
        laps.append(torch.sparse_coo_tensor(
            idx, torch.from_numpy(coo.data.astype(np.float32)),
            coo.shape).coalesce())
        sub //= 2
    return laps


# ---------------------------------------------------------------------------
# Reference loss + AR training step (RNN strategy)
# ---------------------------------------------------------------------------

def weighted_mse_torch(pred, target, weights) -> torch.Tensor:
    """WeightedMSELoss 'mean' semantics (reference modules/loss.py:118-156):
    sum(w*se) / sum(w) / n_datapoints / n_features."""
    se = (pred - target) ** 2
    w = weights.reshape((1,) * (se.ndim - 2) + (-1, 1))
    n_points = int(np.prod(se.shape[:-2]))
    return (se * w).sum() / weights.sum() / n_points / se.shape[-1]


def ar_loss_torch(tmodel, batch: Dict[str, torch.Tensor], indexer,
                  n_scan: int, ar_weights: torch.Tensor,
                  area_w: torch.Tensor):
    """Multi-step AR loss with stack_most_recent_prediction feedback
    (engine/step.py::make_ar_loss_fn semantics; reference
    get_aligned_ar_batch + AR_Scheduler weighting)."""
    dyn = batch["dynamic"]
    bc = batch.get("bc")
    static = batch.get("static")
    buf = dyn.clone()
    B = dyn.shape[0]
    losses = []
    for i in range(n_scan):
        pin = indexer.input_pos[i]
        parts = []
        x_dyn = buf[:, pin]                               # [B, n_in, V, Fd]
        T = x_dyn.shape[1]
        if static is not None:
            parts.append(static.unsqueeze(0).unsqueeze(0).expand(
                B, T, *static.shape))
        if bc is not None:
            parts.append(bc[:, pin])
        parts.append(x_dyn)
        x = torch.cat(parts, dim=-1)
        y_pred = tmodel(x)
        y_true = dyn[:, indexer.output_pos[i]]
        losses.append(weighted_mse_torch(y_pred, y_true, area_w))
        buf = buf.clone()
        buf[:, indexer.output_pos[i]] = y_pred            # RNN: grads flow
    losses_t = torch.stack(losses)
    w = ar_weights[:n_scan]
    w = w / w.sum().clamp_min(1e-12)
    return (losses_t * w).sum(), losses_t
