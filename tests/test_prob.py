"""SWAG + ensemble tests: moment math vs numpy oracle, sampling statistics,
member-vmap path, ensemble store orchestration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_weather_tpu.prob import (
    SWAG,
    AutoregressiveSWAGPredictions,
    build_ensemble_store,
    ensemble_median,
)


def tiny_params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": {"w": jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32)),
              "b": jnp.asarray(rng.standard_normal(4).astype(np.float32))},
        "c": jnp.asarray(rng.standard_normal(5).astype(np.float32)),
    }


class TestSWAGMoments:
    def test_collect_matches_numpy_oracle(self):
        p0 = tiny_params(0)
        swag = SWAG(p0, max_num_models=5)
        snapshots = [tiny_params(s) for s in range(4)]
        for s in snapshots:
            swag.collect_model(s)

        def flat(t):
            return np.concatenate([np.ravel(l) for l in
                                   jax.tree_util.tree_leaves(t)])

        ws = np.stack([flat(s) for s in snapshots])
        np.testing.assert_allclose(np.asarray(swag.state.mean), ws.mean(0),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(swag.state.sq_mean),
                                   (ws ** 2).mean(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(swag.variance()),
                                   ws.var(0), rtol=1e-4, atol=1e-6)
        assert swag.state.n_models == 4 and swag.state.n_cols == 4

    def test_cov_ring_buffer_caps(self):
        p0 = tiny_params(0)
        swag = SWAG(p0, max_num_models=3)
        for s in range(7):
            swag.collect_model(tiny_params(s))
        assert swag.state.n_cols == 3
        assert swag.state.n_models == 7

    def test_sample_statistics(self):
        # With identical snapshots, variance is ~0 -> samples == mean
        p = tiny_params(1)
        swag = SWAG(p, max_num_models=4)
        for _ in range(4):
            swag.collect_model(p)
        s = swag.sample(jax.random.key(0), scale=1.0, cov=True)
        for l_s, l_m in zip(jax.tree_util.tree_leaves(s),
                            jax.tree_util.tree_leaves(swag.mean_params)):
            np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_m),
                                       atol=1e-3)
        # scale=0 collapses to the mean exactly
        s0 = swag.sample(jax.random.key(1), scale=0.0, cov=False)
        for l_s, l_m in zip(jax.tree_util.tree_leaves(s0),
                            jax.tree_util.tree_leaves(swag.mean_params)):
            np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_m),
                                       atol=1e-6)

    def test_sample_spread_scales(self):
        swag = SWAG(tiny_params(0), max_num_models=8)
        for s in range(8):
            swag.collect_model(tiny_params(s))
        draws = [swag.sample(jax.random.key(i), scale=1.0, cov=True)
                 for i in range(6)]
        flat = np.stack([np.concatenate([np.ravel(l) for l in
                                         jax.tree_util.tree_leaves(d)])
                         for d in draws])
        assert flat.std(0).mean() > 0.1  # nontrivial posterior spread

    def test_no_cov_guard(self):
        swag = SWAG(tiny_params(0), no_cov_mat=True, max_num_models=4)
        swag.collect_model(tiny_params(1))
        with pytest.raises(RuntimeError):
            swag.sample(jax.random.key(0), cov=True)
        swag.sample(jax.random.key(0), cov=False)  # works

    def test_save_load_roundtrip(self, tmp_path):
        swag = SWAG(tiny_params(0), max_num_models=4)
        for s in range(3):
            swag.collect_model(tiny_params(s))
        swag.save(tmp_path / "swag.npz")
        swag2 = SWAG(tiny_params(0), max_num_models=4)
        swag2.load(tmp_path / "swag.npz")
        np.testing.assert_allclose(np.asarray(swag2.state.mean),
                                   np.asarray(swag.state.mean))
        s1 = swag.sample(jax.random.key(5))
        s2 = swag2.sample(jax.random.key(5))
        for a, b in zip(jax.tree_util.tree_leaves(s1),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_vmapped_members(self):
        # member-stacked params evaluate under vmap (TPU ensemble path)
        swag = SWAG(tiny_params(0), max_num_models=4)
        for s in range(4):
            swag.collect_model(tiny_params(s))
        stacked = swag.sample_members(jax.random.key(0), 3)

        def f(p):
            return jnp.sum(p["a"]["w"]) + jnp.sum(p["c"])

        out = jax.vmap(f)(stacked)
        assert out.shape == (3,)
        assert len(set(np.round(np.asarray(out), 6))) == 3  # distinct members


class TestEnsemblePredictions:
    def test_swag_predictions_flow(self, tmp_path):
        from deepsphere_weather_tpu.data import (GlobalStandardScaler,
                                                 generate_toy_data)
        from deepsphere_weather_tpu.models import UNetSpherical

        dyn, bc, static = generate_toy_data(
            tmp_path / "d", sampling_kwargs={"subdivisions": 4, "nest": True},
            n_timesteps=60, seed=5)
        scaler = GlobalStandardScaler().fit_dataset(dyn)
        ti = {
            "input_n_feature": 7, "output_n_feature": 2,
            "input_n_time": 2, "output_n_time": 1,
            "input_shape_info": {"dynamic": {"node": 192}},
            "output_shape_info": {"dynamic": {"node": 192}},
            "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
        }
        model = UNetSpherical(
            tensor_info=ti, sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=4, pool_method="max")
        params = model.init(jax.random.key(0))
        swag = SWAG(params, max_num_models=3)
        for i in range(3):
            perturbed = jax.tree_util.tree_map(
                lambda x: x + 0.01 * i, params)
            swag.collect_model(perturbed)

        out = AutoregressiveSWAGPredictions(
            model, swag,
            rng=jax.random.key(1),
            nb_samples=2, sampling_scale=0.1,
            out_dir=tmp_path / "swag_pred",
            data_dynamic=dyn, data_bc=bc, data_static=static, scaler=scaler,
            input_k=[-2, -1], output_k=[0], forecast_cycle=1,
            ar_iterations=2,
            forecast_reference_times=dyn.time[[10, 20]],
            batch_size=2,
        )
        assert out["ensemble"].n_member == 2
        med = out["median"]
        assert med.n_frt == 2 and med.n_leadtime == 3
        x = med.read_leadtime(0)
        assert np.all(np.isfinite(x))
        # median of members equals numpy median of member stores
        m0 = out["members"][0].read_leadtime(0)
        m1 = out["members"][1].read_leadtime(0)
        np.testing.assert_allclose(x, np.median(np.stack([m0, m1]), axis=0),
                                   rtol=1e-6)


    def test_swag_predictions_with_batchnorm_runs_bn_update(self, tmp_path):
        """A batch_norm model flows bn_update state into every sampled
        member's eval-mode rollout (reference swag_predictions.py:59-91)."""
        from unittest import mock

        from deepsphere_weather_tpu.data import (GlobalStandardScaler,
                                                 generate_toy_data)
        from deepsphere_weather_tpu.models import UNetSpherical
        from deepsphere_weather_tpu.prob import bn as bn_mod

        dyn, bc, static = generate_toy_data(
            tmp_path / "d", sampling_kwargs={"subdivisions": 4, "nest": True},
            n_timesteps=40, seed=6)
        scaler = GlobalStandardScaler().fit_dataset(dyn)
        ti = {
            "input_n_feature": 7, "output_n_feature": 2,
            "input_n_time": 2, "output_n_time": 1,
            "input_shape_info": {"dynamic": {"node": 192}},
            "output_shape_info": {"dynamic": {"node": 192}},
            "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
        }
        model = UNetSpherical(
            tensor_info=ti, sampling="healpix",
            sampling_kwargs={"subdivisions": 4, "nest": True},
            knn=4, pool_method="max", batch_norm=True)
        assert model.has_batch_norm
        params = model.init(jax.random.key(0))
        swag = SWAG(params, max_num_models=3)
        for i in range(3):
            swag.collect_model(jax.tree_util.tree_map(
                lambda x: x + 0.01 * i, params))

        bn_data = dict(data_dynamic=dyn, data_bc=bc, data_static=static,
                       scaler=scaler, input_k=[-2, -1], output_k=[0],
                       forecast_cycle=1, ar_iterations=1, batch_size=4,
                       max_batches=2)
        calls = []
        real_bn_update = bn_mod.bn_update

        def spy(*a, **kw):
            out = real_bn_update(*a, **kw)
            calls.append(out)
            return out

        with mock.patch.object(bn_mod, "bn_update", side_effect=spy):
            out = AutoregressiveSWAGPredictions(
                model, swag,
                rng=jax.random.key(1),
                nb_samples=2, sampling_scale=0.1,
                out_dir=tmp_path / "swag_pred",
                bn_update_data=bn_data,
                data_dynamic=dyn, data_bc=bc, data_static=static,
                scaler=scaler,
                input_k=[-2, -1], output_k=[0], forecast_cycle=1,
                ar_iterations=2,
                forecast_reference_times=dyn.time[[10, 20]],
                batch_size=2,
            )
        # one bn_update per sampled member, each yielding real running stats
        assert len(calls) == 2
        for st in calls:
            assert "conv1" in st
        assert np.all(np.isfinite(out["median"].read_leadtime(0)))


class TestSWAGLoadReconcile:
    def test_mismatched_buffer_geometry(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from deepsphere_weather_tpu.prob import SWAG

        tmpl = {"w": jnp.zeros((5,))}
        src = SWAG(tmpl, max_num_models=4)
        for i in range(3):
            src.collect_model({"w": jnp.full((5,), float(i))})
        src.save(tmp_path / "swag.npz")

        # larger buffer: zero-padded, sampling works
        dst = SWAG(tmpl, max_num_models=8)
        dst.load(tmp_path / "swag.npz")
        s = dst.sample(jax.random.key(0), scale=0.5, cov=True)
        assert s["w"].shape == (5,) and np.all(np.isfinite(np.asarray(s["w"])))

        # smaller buffer than stored columns: loud error
        tiny = SWAG(tmpl, max_num_models=2)
        with pytest.raises(ValueError, match="covariance columns"):
            tiny.load(tmp_path / "swag.npz")
