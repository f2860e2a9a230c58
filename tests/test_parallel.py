"""Parallelism + determinism tests on the virtual 8-device CPU mesh.

Covers: batch-sharded data-parallel training step, member-sharded vmapped
ensemble rollout, and the reproducibility oracle (reference experiment
01_exp_reproducibility.py: determinism under fixed seeds is the test)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepsphere_weather_tpu.data import ARIndexer, generate_toy_data, \
    GlobalStandardScaler
from deepsphere_weather_tpu.engine import AreaWeights, make_context, \
    make_train_step
from deepsphere_weather_tpu.models import UNetSpherical
from deepsphere_weather_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from deepsphere_weather_tpu.prob import SWAG, make_ensemble_rollout
from deepsphere_weather_tpu.sphere import build_sampling


def tensor_info(n_node):
    return {"input_n_feature": 7, "output_n_feature": 2, "input_n_time": 3,
            "output_n_time": 1,
            "input_shape_info": {"dynamic": {"node": n_node}},
            "output_shape_info": {"dynamic": {"node": n_node}},
            "dim_order": {"dynamic": ["sample", "time", "node", "feature"]}}


@pytest.fixture(scope="module")
def setup():
    model = UNetSpherical(
        tensor_info=tensor_info(192), sampling="healpix",
        sampling_kwargs={"subdivisions": 4, "nest": True},
        knn=8, pool_method="max", increment_learning=True)
    params = model.init(jax.random.key(0))
    samp = build_sampling("healpix", {"subdivisions": 4, "nest": True})
    return model, params, AreaWeights(samp)


class TestDataParallel:
    def test_sharded_train_step_matches_single_device(self, setup):
        model, params, area_w = setup
        indexer = ARIndexer.build([-3, -2, -1], [0], 1, 1)
        optimizer = optax.adam(1e-3, eps=1e-7)
        rng = np.random.default_rng(0)
        W = indexer.window_size
        batch_np = {
            "dynamic": rng.standard_normal((8, W, 192, 2)).astype(np.float32),
            "bc": rng.standard_normal((8, W, 192, 1)).astype(np.float32),
            "static": rng.standard_normal((192, 4)).astype(np.float32),
        }
        w = jnp.asarray([1.0, 0.5])
        ctx = make_context(model, area_w)
        step = make_train_step(model, indexer, optimizer, 2, "RNN")

        # single device (train_step donates params/opt_state — pass copies
        # so `params` stays alive for the mesh run below)
        opt1 = optimizer.init(params)
        params_copy = jax.tree_util.tree_map(jnp.array, params)
        p1, _, t1, _ = step(params_copy, opt1,
                            {k: jnp.asarray(v) for k, v in batch_np.items()},
                            w, ctx)
        # 8-device data-parallel mesh
        mesh = make_mesh(n_data=8, n_member=1)
        rsh = replicated_sharding(mesh)
        # copy before device_put: replication can alias the source buffer,
        # and the donated step would delete the shared fixture params
        params_r = jax.device_put(jax.tree_util.tree_map(jnp.array, params),
                                  rsh)
        opt2 = jax.device_put(optimizer.init(params), rsh)
        ctx_r = jax.device_put(ctx, rsh)
        dev_batch = shard_batch(batch_np, mesh)
        assert len(dev_batch["dynamic"].sharding.device_set) == 8
        p2, _, t2, _ = step(params_r, opt2, dev_batch,
                            jax.device_put(w, rsh), ctx_r)
        assert float(t1) == pytest.approx(float(t2), rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestNodeParallel:
    def test_node_sharded_train_step_matches_single_device(self, setup):
        # spatial (node-axis) sharding — the context-parallel analog for
        # resolutions exceeding one chip (SURVEY.md §5.7): 4 data x 2 node
        # mesh; XLA inserts the gather collectives the Laplacian matvec
        # needs, pooling stays shard-local in nested ordering
        model, params, area_w = setup
        indexer = ARIndexer.build([-3, -2, -1], [0], 1, 1)
        optimizer = optax.adam(1e-3, eps=1e-7)
        rng = np.random.default_rng(1)
        W = indexer.window_size
        batch_np = {
            "dynamic": rng.standard_normal((8, W, 192, 2)).astype(np.float32),
            "bc": rng.standard_normal((8, W, 192, 1)).astype(np.float32),
            "static": rng.standard_normal((192, 4)).astype(np.float32),
        }
        w = jnp.asarray([1.0, 0.5])
        ctx = make_context(model, area_w)
        step = make_train_step(model, indexer, optimizer, 2, "RNN")

        opt1 = optimizer.init(params)
        p1, _, t1, _ = step(jax.tree_util.tree_map(jnp.array, params), opt1,
                            {k: jnp.asarray(v) for k, v in batch_np.items()},
                            w, ctx)

        mesh = make_mesh(n_data=4, n_node=2, n_member=1)
        rsh = replicated_sharding(mesh)
        params_r = jax.device_put(jax.tree_util.tree_map(jnp.array, params),
                                  rsh)
        opt2 = jax.device_put(optimizer.init(params), rsh)
        ctx_r = jax.device_put(ctx, rsh)
        dev_batch = shard_batch(batch_np, mesh)
        # dynamic [8, W, 192, 2] is sharded over data AND node
        spec = dev_batch["dynamic"].sharding.spec
        assert tuple(spec) == ("data", None, "node")
        p2, _, t2, _ = step(params_r, opt2, dev_batch,
                            jax.device_put(w, rsh), ctx_r)
        assert float(t1) == pytest.approx(float(t2), rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestMemberParallel:
    def test_member_parallel_training_matches_sequential(self, setup):
        # vmapped member training (the reference trains members as
        # sequential subprocesses, 06_exp_DeepEnsemble.py) must advance
        # each member exactly as its own sequential train step would
        from deepsphere_weather_tpu.engine.step import (
            make_member_train_step)

        model, params, area_w = setup
        indexer = ARIndexer.build([-3, -2, -1], [0], 1, 1)
        optimizer = optax.adam(1e-3, eps=1e-7)
        rng = np.random.default_rng(2)
        W = indexer.window_size
        batch = {k: jnp.asarray(v) for k, v in {
            "dynamic": rng.standard_normal((4, W, 192, 2)).astype(np.float32),
            "bc": rng.standard_normal((4, W, 192, 1)).astype(np.float32),
            "static": rng.standard_normal((192, 4)).astype(np.float32),
        }.items()}
        w = jnp.asarray([1.0, 0.5])
        ctx = make_context(model, area_w)
        M = 3
        keys = jax.random.split(jax.random.key(7), M)
        members = jax.vmap(model.init)(keys)
        m_opt = jax.vmap(optimizer.init)(members)

        mstep = make_member_train_step(model, indexer, optimizer, 2, "RNN")
        new_m, _, totals, _ = mstep(
            jax.tree_util.tree_map(jnp.array, members),
            m_opt, batch, w, ctx)
        assert totals.shape == (M,)

        sstep = make_train_step(model, indexer, optimizer, 2, "RNN")
        for i in range(M):
            p_i = jax.tree_util.tree_map(lambda a: jnp.array(a[i]), members)
            o_i = optimizer.init(p_i)
            p_i, _, t_i, _ = sstep(p_i, o_i, dict(batch), w, ctx)
            assert float(t_i) == pytest.approx(float(totals[i]), rel=1e-5)
            for a, b in zip(jax.tree_util.tree_leaves(p_i),
                            jax.tree_util.tree_leaves(new_m)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b[i]),
                                           atol=1e-5)


    def test_vmapped_ensemble_rollout(self, setup):
        model, params, _ = setup
        swag = SWAG(params, max_num_models=4)
        for i in range(4):
            swag.collect_model(jax.tree_util.tree_map(
                lambda x: x + 0.005 * i, params))
        members = swag.sample_members(jax.random.key(0), 4, scale=0.2)
        indexer = ARIndexer.build([-3, -2, -1], [0], 1, 3)
        mesh = make_mesh(n_data=2, n_member=4)
        fn, H = make_ensemble_rollout(model, indexer, block_size=4, mesh=mesh)
        geom = model.geometry_pytree()
        rng = np.random.default_rng(1)
        hist = jnp.asarray(rng.standard_normal((4, 2, H, 192, 2))
                           .astype(np.float32))
        bc = jnp.asarray(rng.standard_normal((2, 4, 3, 192, 1))
                         .astype(np.float32))
        static = jnp.asarray(rng.standard_normal((192, 4)).astype(np.float32))
        _, _, preds = fn(members, hist, None, bc, static, geom)
        assert preds.shape == (4, 2, 4, 1, 192, 2)
        # members differ (distinct sampled params)
        p = np.asarray(preds)
        assert not np.allclose(p[0], p[1])


class TestReproducibility:
    def test_fixed_seeds_are_deterministic(self, setup, tmp_path):
        # reference oracle: fixed weight seed + fixed shuffling seed ->
        # identical training trajectories (01_exp_reproducibility.py)
        from deepsphere_weather_tpu.engine import AutoregressiveTraining

        dyn, bc, static = generate_toy_data(
            tmp_path, sampling_kwargs={"subdivisions": 4, "nest": True},
            n_timesteps=80, seed=11)
        scaler = GlobalStandardScaler().fit_dataset(dyn)
        model, _, area_w = setup

        def run():
            params = model.init(jax.random.key(42))
            p, _, _, info = AutoregressiveTraining(
                model, params,
                training_data_dynamic=dyn, data_static=static,
                training_data_bc=bc, scaler=scaler,
                input_k=[-3, -2, -1], output_k=[0], forecast_cycle=1,
                ar_iterations=1, area_weights=area_w, learning_rate=1e-3,
                epochs=1, training_batch_size=8, scoring_interval=3,
                num_workers=2, shuffle=True, shuffle_seed=7, verbose=False)
            return p, info

        p1, i1 = run()
        p2, i2 = run()
        assert i1.training_total_loss == i2.training_total_loss
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMeshValidation:
    def test_indivisible_and_oversized(self):
        import warnings

        from deepsphere_weather_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="exceeds"):
            make_mesh(n_member=64)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mesh = make_mesh(n_member=3)   # 8 devices % 3 != 0
        assert any("idle" in str(x.message) for x in w)
        assert mesh.devices.size == 6
        with pytest.raises(ValueError, match="needs"):
            make_mesh(n_data=8, n_member=3)
