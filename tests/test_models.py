"""Model tests: UNetSpherical shapes, init distribution, jit/grad, variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_weather_tpu.models import UNetSpherical, get_model


def make_tensor_info(n_node, in_feat=4, out_feat=2, in_time=2, out_time=1):
    return {
        "input_n_feature": in_feat,
        "output_n_feature": out_feat,
        "input_n_time": in_time,
        "output_n_time": out_time,
        "input_shape_info": {"dynamic": {"node": n_node}},
        "output_shape_info": {"dynamic": {"node": n_node}},
        "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
    }


@pytest.fixture(scope="module")
def model():
    # HEALPix-8 keeps CPU tests fast; pooling pyramid 768 -> 192 -> 48
    return UNetSpherical(
        tensor_info=make_tensor_info(768),
        sampling="healpix",
        sampling_kwargs={"subdivisions": 8, "nest": True},
        knn=8,
        pool_method="max",
        increment_learning=True,
    )


class TestUNetSpherical:
    def test_forward_shape(self, model):
        params = model.init(jax.random.key(0))
        x = jnp.ones((2, 2, 768, 4))
        y = model.apply(params, x)
        assert y.shape == (2, 1, 768, 2)

    def test_rezero_makes_initial_output_residual_only(self, model):
        # With ReZero zero-init + increment learning, the initial model output
        # equals the last input timestep's dynamic features up to the final
        # residual projections (reference my_models_graph.py:192-213).
        params = model.init(jax.random.key(1))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 2, 768, 4)).astype(np.float32))
        y = model.apply(params, x)
        # res_increment = 0 -> output == x_last exactly
        np.testing.assert_allclose(
            np.asarray(y[:, 0]), np.asarray(x[:, -1, :, -2:]), atol=1e-6)

    def test_jit_and_grad(self, model):
        params = model.init(jax.random.key(2))
        x = jnp.ones((1, 2, 768, 4))
        y_target = jnp.zeros((1, 1, 768, 2))

        @jax.jit
        def loss_fn(p):
            return jnp.mean((model.apply(p, x) - y_target) ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # some gradient must be nonzero (rezero blocks grads through branches,
        # but res projections and rezero weights themselves get gradient)
        assert any(np.any(np.asarray(l) != 0) for l in leaves)

    def test_init_statistics(self, model):
        params = model.init(jax.random.key(3))
        w = np.asarray(params["conv1"]["convblock1"]["weight"])
        fin, K, fout = w.shape
        expected_std = np.sqrt(2.0 / (fin * K))  # He normal, relu
        assert abs(w.std() - expected_std) / expected_std < 0.1
        assert np.allclose(np.asarray(params["conv1"]["rezero_weight"]), 0.0)

    def test_vmap_over_members(self, model):
        # ensemble members as a vmapped axis — the TPU ensemble-parallel path
        keys = jax.random.split(jax.random.key(4), 3)
        params = jax.vmap(model.init)(keys)
        x = jnp.ones((1, 2, 768, 4))
        y = jax.vmap(lambda p: model.apply(p, x))(params)
        assert y.shape == (3, 1, 1, 768, 2)

    def test_registry(self):
        m = get_model(
            "UNetSpherical",
            make_tensor_info(192),
            sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=8,
            pool_method="interp",
            unknown_kwarg_is_filtered=True,
        )
        params = m.init(jax.random.key(0))
        y = m.apply(params, jnp.ones((1, 2, 192, 4)))
        assert y.shape == (1, 1, 192, 2)

    def test_equiangular_image_conv_variant(self):
        m = UNetSpherical(
            tensor_info=make_tensor_info(32 * 64),
            sampling="equiangular",
            sampling_kwargs={"nlat": 32, "nlon": 64},
            conv_type="image",
            pool_method="avg",
            knn=8,
        )
        params = m.init(jax.random.key(5))
        y = m.apply(params, jnp.ones((1, 2, 2048, 4)))
        assert y.shape == (1, 1, 2048, 2)

    def test_equiangular_image_conv_bf16_gradient(self):
        # regression: preferred_element_type=f32 inside the image conv
        # broke its VJP under bf16 (fp32 cotangent vs bf16 activations in
        # the transpose conv) — every bf16 conv_type=image TRAINING run
        # failed at step 1 while fp32 forward sweeps stayed green
        m = UNetSpherical(
            tensor_info=make_tensor_info(16 * 32),
            sampling="equiangular",
            sampling_kwargs={"nlat": 16, "nlon": 32},
            conv_type="image",
            pool_method="avg",
            knn=8,
            numeric_precision="bfloat16",
        )
        params = m.init(jax.random.key(5))
        x = jnp.ones((1, 2, 512, 4))

        def loss(p):
            return (m.apply(p, x) ** 2).sum()

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(v).all()) for v in flat)
        assert any(float(jnp.abs(v).max()) > 0 for v in flat)

    def test_maxval_pooling_variant(self):
        m = UNetSpherical(
            tensor_info=make_tensor_info(192),
            sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=8,
            pool_method="maxval",
        )
        params = m.init(jax.random.key(6))
        y = m.apply(params, jnp.ones((2, 2, 192, 4)))
        assert y.shape == (2, 1, 192, 2)

    def test_learn_pooling_variant(self):
        # 'learn' pooling is a real implementation here (the reference
        # raises NotImplementedError, modules/layers.py:1107-1133):
        # trainable softmax logits on the remap sparsity, initialized so
        # the forward pass matches 'interp' pooling exactly.
        kw = dict(
            tensor_info=make_tensor_info(192),
            sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=8,
        )
        m = UNetSpherical(pool_method="learn", **kw)
        params = m.init(jax.random.key(7))
        for name in ("pool0", "pool1", "unpool0", "unpool1"):
            assert name in params
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 2, 192, 4)),
            jnp.float32)
        y = m.apply(params, x)
        assert y.shape == (2, 1, 192, 2)

        m_interp = UNetSpherical(pool_method="interp", **kw)
        y_interp = m_interp.apply(m_interp.init(jax.random.key(7)), x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_interp),
                                   atol=1e-5)

        # gradients flow into the pooling logits
        g = jax.grad(lambda p: jnp.mean(m.apply(p, x) ** 2))(params)
        assert float(jnp.abs(g["pool0"]).sum()) > 0

    def test_mesh_graph_type_variant(self):
        m = UNetSpherical(
            tensor_info=make_tensor_info(192),
            sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=8,
            graph_type="mesh",
            pool_method="max",
        )
        params = m.init(jax.random.key(8))
        y = m.apply(params, jnp.ones((1, 2, 192, 4)))
        assert y.shape == (1, 1, 192, 2)
        assert bool(jnp.all(jnp.isfinite(y)))


class TestArchitectureVariants:
    @pytest.mark.parametrize("arch", ["ResNetSpherical", "EPDNetSpherical",
                                      "ConvNetSpherical"])
    def test_variant_forward_and_grad(self, arch):
        m = get_model(
            arch, make_tensor_info(192),
            sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=8)
        params = m.init(jax.random.key(0))
        geom = m.geometry_pytree()
        x = jnp.ones((2, 2, 192, 4))
        y = jax.jit(lambda p, g, x: m.apply(p, x, geom=g))(params, geom, x)
        assert y.shape == (2, 1, 192, 2)
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))

    def test_downscaling_net(self):
        # coarse (192-node healpix-4) input -> fine (768-node healpix-8)
        # output; realizes the reference DownscalingNet ABC
        # (modules/models.py:134-145)
        ti = make_tensor_info(192)
        ti["output_shape_info"]["dynamic"]["node"] = 768
        m = get_model(
            "DownscalingNetSpherical", ti,
            sampling="healpix",
            sampling_kwargs={"subdivisions": 8, "nest": True},
            knn=8)
        params = m.init(jax.random.key(1))
        geom = m.geometry_pytree()
        x = jnp.ones((2, 2, 192, 4))
        y = jax.jit(lambda p, g, x: m.apply(p, x, geom=g))(params, geom, x)
        assert y.shape == (2, 1, 768, 2)
        # forward == decode (decode-only ABC contract)
        np.testing.assert_array_equal(np.asarray(y),
                                      np.asarray(m.decode(params, x)))
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))


class TestProfiling:
    def test_profile_model(self):
        from deepsphere_weather_tpu.utils import profile_model, summarize_model

        m = UNetSpherical(
            tensor_info=make_tensor_info(192),
            sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=8, pool_method="max")
        out = profile_model(m, batch_size=2, n=3)
        assert out["median_s"] > 0
        assert "peak_memory_bytes" in out or "flops" in out
        s = summarize_model(m, m.init(jax.random.key(0)))
        assert "TOTAL" in s


class TestModelsReviewRegressions:
    def test_swish_and_rrelu_init(self):
        from deepsphere_weather_tpu.models.layers import (
            _he_scale, get_activation)

        # advertised activations must have an init scale (swish crashed)
        for name in ("swish", "rrelu", "rrlu"):
            get_activation(name)
            assert _he_scale(name) > 0

    def test_skip_connection_modes(self, tiny_tensor_info=None):
        import jax
        import jax.numpy as jnp

        from deepsphere_weather_tpu.models import UNetSpherical

        info = {
            "input_n_feature": 3, "output_n_feature": 2,
            "input_n_time": 2, "output_n_time": 1,
            "input_shape_info": {"dynamic": {"node": 192}},
            "output_shape_info": {"dynamic": {"node": 192}},
            "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
        }
        x = jnp.ones((2, 2, 192, 3))
        outs = {}
        for sc in ("stack", "sum", "avg", "none"):
            m = UNetSpherical(
                tensor_info=info, sampling="healpix",
                sampling_kwargs={"subdivisions": 4, "nest": True}, knn=8,
                pool_method="interp", skip_connection=sc)
            p = m.init(jax.random.key(0))
            y = m.apply(p, x)
            assert y.shape == (2, 1, 192, 2)
            outs[sc] = np.asarray(y)
        # the modes are genuinely different architectures
        assert not np.allclose(outs["stack"], outs["none"])
        assert not np.allclose(outs["sum"], outs["none"])
        with pytest.raises(ValueError):
            UNetSpherical(
                tensor_info=info, sampling="healpix",
                sampling_kwargs={"subdivisions": 4, "nest": True}, knn=8,
                pool_method="interp", skip_connection="bogus")

    def test_variants_honor_numeric_precision(self):
        import jax
        import jax.numpy as jnp

        from deepsphere_weather_tpu.models import get_model

        info = {
            "input_n_feature": 3, "output_n_feature": 2,
            "input_n_time": 2, "output_n_time": 1,
            "input_shape_info": {"dynamic": {"node": 192}},
            "output_shape_info": {"dynamic": {"node": 192}},
            "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
        }
        m = get_model("ResNetSpherical", info, sampling="healpix",
                      sampling_kwargs={"subdivisions": 4, "nest": True},
                      knn=8, numeric_precision="bfloat16")
        assert m.compute_dtype == jnp.bfloat16
        y = m.apply(m.init(jax.random.key(0)), jnp.ones((1, 2, 192, 3)))
        assert y.dtype == jnp.float32    # fp32 at the model boundary
        assert np.all(np.isfinite(np.asarray(y)))


class TestBatchNorm:
    """True BatchNorm parity with torch.nn.BatchNorm1d (VERDICT r1 #4;
    reference my_models_graph.py:97-99, utils_swag.py:58-165)."""

    def _convblock(self, **kw):
        from deepsphere_weather_tpu.models.layers import ConvBlock
        from deepsphere_weather_tpu.ops.cheb import ChebOperator
        from deepsphere_weather_tpu.sphere import build_graph

        g = build_graph("healpix", {"subdivisions": 4, "nest": True}, k=8)
        op = ChebOperator(dense=jnp.asarray(g.L.todense(), dtype=jnp.float32))
        blk = ConvBlock(5, 6, op, batch_norm=True, **kw)
        params = blk.init(jax.random.key(0))
        return g, blk, params

    def _torch_twin(self, g, blk, params, train):
        import sys
        from pathlib import Path

        import torch
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "scripts"))
        from parity_torch import conv_cheb_torch

        coo = g.L.tocoo()
        lap = torch.sparse_coo_tensor(
            torch.from_numpy(np.stack([coo.row, coo.col]).astype(np.int64)),
            torch.from_numpy(coo.data.astype(np.float32)),
            coo.shape).coalesce()
        bn = torch.nn.BatchNorm1d(6, eps=1e-5)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(np.asarray(
                params["norm_scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(params["norm_bias"])))
        bn.train(train)
        w = torch.from_numpy(np.asarray(params["weight"]))

        def fwd(x_np):
            x = conv_cheb_torch(lap, torch.from_numpy(x_np), w, None)
            # reference permutes [B, V, C] -> [B, C, V] for BatchNorm1d
            x = bn(x.permute(0, 2, 1)).permute(0, 2, 1)
            return torch.relu(x).detach().numpy()

        return fwd, bn

    def test_train_mode_matches_torch(self):
        g, blk, params = self._convblock(batch_norm_before_activation=True)
        # non-zero affine so the test is not trivially 0
        params["norm_scale"] = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.5, 6).astype(np.float32))
        fwd_t, _ = self._torch_twin(g, blk, params, train=True)
        x = np.random.default_rng(1).standard_normal(
            (3, 192, 5)).astype(np.float32)
        y_j = np.asarray(blk.apply(params, jnp.asarray(x), train=True))
        y_t = fwd_t(x)
        np.testing.assert_allclose(y_j, y_t, atol=2e-5)

    def test_eval_mode_matches_torch(self):
        import torch

        g, blk, params = self._convblock(batch_norm_before_activation=True)
        params["norm_scale"] = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.5, 6).astype(np.float32))
        fwd_t, bn = self._torch_twin(g, blk, params, train=False)
        mean = np.random.default_rng(2).standard_normal(6).astype(np.float32)
        var = np.random.default_rng(3).uniform(0.5, 2, 6).astype(np.float32)
        with torch.no_grad():
            bn.running_mean.copy_(torch.from_numpy(mean))
            bn.running_var.copy_(torch.from_numpy(var))
        x = np.random.default_rng(4).standard_normal(
            (3, 192, 5)).astype(np.float32)
        y_j = np.asarray(blk.apply(params, jnp.asarray(x), train=False,
                                   norm_state={"mean": jnp.asarray(mean),
                                               "var": jnp.asarray(var)}))
        np.testing.assert_allclose(y_j, fwd_t(x), atol=2e-5)

    def test_resblock_last_bn_zero_init(self):
        from deepsphere_weather_tpu.models.layers import ResBlock
        from deepsphere_weather_tpu.ops.cheb import ChebOperator
        from deepsphere_weather_tpu.sphere import build_graph

        g = build_graph("healpix", {"subdivisions": 4, "nest": True}, k=8)
        op = ChebOperator(dense=jnp.asarray(g.L.todense(), dtype=jnp.float32))
        rb = ResBlock(5, (8, 5), op, {"batch_norm": True})
        params = rb.init(jax.random.key(0))
        # reference zero-inits the LAST BN (my_models_graph.py:198-201):
        # identity-matching channels make the block start as identity
        assert np.all(np.asarray(params["convblock2"]["norm_scale"]) == 0)
        assert np.all(np.asarray(params["convblock2"]["norm_bias"]) == 0)
        assert np.all(np.asarray(params["convblock1"]["norm_scale"]) == 1)
        x = np.random.default_rng(0).standard_normal(
            (2, 192, 5)).astype(np.float32)
        y = np.asarray(rb.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(y, x, atol=1e-6)  # identity at init

    def test_bn_update_running_stats_match_torch(self, tmp_path):
        """bn_update's cumulative b/(n+b) running update reproduces the
        reference's momentum schedule (utils_swag.py:31-55) exactly."""
        import torch

        rng = np.random.default_rng(5)
        batches = [rng.standard_normal((4, 100, 6)).astype(np.float32)
                   for _ in range(3)]
        # torch reference: BatchNorm1d, momentum set to b/(n+b) per batch
        bn = torch.nn.BatchNorm1d(6)
        bn.train()
        n = 0
        for xb in batches:
            b = xb.shape[0]
            bn.momentum = b / (n + b)
            bn(torch.from_numpy(xb).permute(0, 2, 1))
            n += b
        # our host update on the same per-batch statistics
        state = {"mean": np.zeros(6, np.float32),
                 "var": np.ones(6, np.float32)}
        n = 0
        for xb in batches:
            b = xb.shape[0]
            m = b / (n + b)
            bm = xb.reshape(-1, 6).mean(0)
            cnt = xb.reshape(-1, 6).shape[0]
            bv = xb.reshape(-1, 6).var(0) * cnt / (cnt - 1)   # unbiased
            state["mean"] = (1 - m) * state["mean"] + m * bm
            state["var"] = (1 - m) * state["var"] + m * bv
            n += b
        np.testing.assert_allclose(state["mean"],
                                   bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(state["var"],
                                   bn.running_var.numpy(), atol=1e-5)

    def test_layer_norm_still_available(self):
        from deepsphere_weather_tpu.models.layers import ConvBlock
        from deepsphere_weather_tpu.ops.cheb import ChebOperator
        from deepsphere_weather_tpu.sphere import build_graph

        g = build_graph("healpix", {"subdivisions": 4, "nest": True}, k=8)
        op = ChebOperator(dense=jnp.asarray(g.L.todense(), dtype=jnp.float32))
        blk = ConvBlock(5, 6, op, batch_norm="layer")
        assert blk.norm_kind == "layer"
        params = blk.init(jax.random.key(0))
        x = np.random.default_rng(1).standard_normal(
            (3, 192, 5)).astype(np.float32)
        y = np.asarray(blk.apply(params, jnp.asarray(x)))
        assert np.isfinite(y).all()


class TestVariantBatchNorm:
    """Round-2 review regression: variants with batch_norm=True must expose
    the SAME eval-mode contract as UNetSpherical (has_batch_norm /
    init_norm_state / norm_state+train plumbing) — without it they silently
    predicted in train mode forever."""

    def _model(self, arch="ConvNetSpherical"):
        return get_model(arch, make_tensor_info(192),
                         sampling="healpix",
                         sampling_kwargs={"subdivisions": 4, "nest": True},
                         knn=8, batch_norm=True)

    @pytest.mark.parametrize("arch", ["ResNetSpherical", "EPDNetSpherical",
                                      "ConvNetSpherical"])
    def test_has_batch_norm_and_state(self, arch):
        m = self._model(arch)
        assert m.has_batch_norm
        state = m.init_norm_state()
        assert state
        # the final conv is norm-free by construction (_final_kwargs)
        assert "conv_final" not in state

    def test_eval_mode_is_batch_composition_independent(self):
        m = self._model()
        params = m.init(jax.random.key(0))
        state = m.init_norm_state()
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (3, 2, 192, 4)).astype(np.float32))
        y_train = np.asarray(m.apply(params, x, train=True))
        y_eval = np.asarray(m.apply(params, x, norm_state=state,
                                    train=False))
        # train mode uses the batch's own stats, eval the running (0, 1)
        # stats: they must differ on non-trivial input
        assert not np.allclose(y_train, y_eval)
        # eval-mode forecasts must not depend on batch composition
        y0 = np.asarray(m.apply(params, x[:1], norm_state=state,
                                train=False))
        np.testing.assert_allclose(y_eval[:1], y0, rtol=1e-5, atol=1e-5)

    def test_stats_out_collection_matches_state_tree(self):
        m = self._model("ResNetSpherical")     # mixes ResBlocks + ConvBlocks
        params = m.init(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 2, 192, 4)).astype(np.float32))
        stats = {}
        m.apply(params, x, train=True, stats_out=stats)
        assert set(stats) == set(m.init_norm_state())

    def test_running_update_mixed_nesting(self):
        # bn_update must walk BOTH 1-level (plain ConvBlock) and 2-level
        # (ResBlock) stats trees — the variants produce the mix
        from deepsphere_weather_tpu.prob.bn import _running_update
        state = {"conv1": {"mean": np.zeros(3), "var": np.ones(3)},
                 "res": {"convblock1": {"mean": np.zeros(2),
                                        "var": np.ones(2)}}}
        stats = {"conv1": {"mean": np.full(3, 2.0), "var": np.full(3, 4.0)},
                 "res": {"convblock1": {"mean": np.full(2, 6.0),
                                        "var": np.full(2, 8.0)}}}
        _running_update(state, stats, 0.5)
        np.testing.assert_allclose(state["conv1"]["mean"], 1.0)
        np.testing.assert_allclose(state["conv1"]["var"], 2.5)
        np.testing.assert_allclose(state["res"]["convblock1"]["mean"], 3.0)
        np.testing.assert_allclose(state["res"]["convblock1"]["var"], 4.5)
