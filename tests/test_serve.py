"""Serving subsystem tests: jax.export artifact roundtrip, ForecastService
scaling/padding/blocking semantics, micro-batching, and the HTTP server."""

import io
import json
import urllib.request

import jax
import numpy as np
import pytest

from deepsphere_weather_tpu.data import GlobalStandardScaler
from deepsphere_weather_tpu.data.ar import ARIndexer
from deepsphere_weather_tpu.engine.step import make_rollout_block
from deepsphere_weather_tpu.models import UNetSpherical
from deepsphere_weather_tpu.serve import (ForecastService, export_rollout,
                                          load_artifact, save_artifact)

SUBDIV, KNN = 4, 8
V = 12 * SUBDIV ** 2
F_DYN, F_BC, F_STATIC = 2, 1, 2
F_IN = F_DYN + F_BC + F_STATIC
INPUT_K, OUTPUT_K, FC = [-3, -2, -1], [0], 1
BATCH, BLOCK = 3, 4


def _tensor_info(n_feat_in):
    return {
        "input_n_feature": n_feat_in, "output_n_feature": F_DYN,
        "input_n_time": len(INPUT_K), "output_n_time": len(OUTPUT_K),
        "input_shape_info": {"dynamic": {"node": V}},
        "output_shape_info": {"dynamic": {"node": V}},
        "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
    }


def _model(n_feat_in):
    return UNetSpherical(
        tensor_info=_tensor_info(n_feat_in), sampling="healpix",
        sampling_kwargs={"subdivisions": SUBDIV, "nest": True},
        knn=KNN, pool_method="max", increment_learning=True)


def _randomized(params, seed):
    """Perturb freshly-initialized params: increment-learning models init
    res_increment=0, making the untrained net output exactly x_last —
    identical for every member and trivial for roundtrip checks."""
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x)
        + rng.standard_normal(np.shape(x)).astype(np.float32) * 0.05,
        params)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """Exported artifact (bc + static + scalers) and its build ingredients."""
    rng = np.random.default_rng(0)
    model = _model(F_IN)
    params = _randomized(model.init(jax.random.key(0)), 11)
    static = rng.standard_normal((V, F_STATIC)).astype(np.float32)
    scaler = GlobalStandardScaler().fit(
        rng.standard_normal((50, V, F_DYN)) * 3.0 + 5.0)
    scaler_bc = GlobalStandardScaler().fit(
        rng.standard_normal((50, V, F_BC)) * 2.0 + 1.0)
    rollout = export_rollout(
        model, params, input_k=INPUT_K, output_k=OUTPUT_K,
        forecast_cycle=FC, batch_size=BATCH, block_size=BLOCK,
        static=static, n_bc_features=F_BC, timestep_hours=6.0,
        feature_order=["z500", "t850"])
    path = tmp_path_factory.mktemp("artifact") / "model"
    save_artifact(path, rollout, scaler=scaler, scaler_bc=scaler_bc)
    return dict(path=path, model=model, params=params, static=static,
                scaler=scaler, scaler_bc=scaler_bc)


def _direct_rollout(model, params, hist, bc, static, n_steps):
    """Ground truth: run the engine's own block rollout (scaled units)."""
    indexer = ARIndexer.build(INPUT_K, OUTPUT_K, FC, 1)
    fn, H = make_rollout_block(model, indexer, n_steps, jit=False)
    geom = model.geometry_pytree()
    _, _, preds = fn(params, hist, None, bc, static, geom)
    return np.asarray(preds)


class TestExportRoundtrip:
    def test_artifact_matches_direct_rollout(self, artifact):
        a = artifact
        exported, scaler, scaler_bc = load_artifact(a["path"])
        assert scaler is not None and scaler_bc is not None
        H = exported.meta["history_size"]
        assert H == max(OUTPUT_K) - min(INPUT_K) + 1
        rng = np.random.default_rng(1)
        hist = rng.standard_normal((BATCH, H, V, F_DYN)).astype(np.float32)
        bc = rng.standard_normal(
            (BATCH, BLOCK, len(INPUT_K), V, F_BC)).astype(np.float32)
        new_hist, preds = exported.call(hist, bc)
        want = _direct_rollout(a["model"], a["params"], hist, bc,
                               a["static"], BLOCK)
        np.testing.assert_allclose(np.asarray(preds), want,
                                   rtol=1e-5, atol=1e-5)
        assert np.asarray(new_hist).shape == hist.shape

    def test_meta_contents(self, artifact):
        meta = json.loads((artifact["path"] / "meta.json").read_text())
        assert meta["n_node"] == V
        assert meta["input_k"] == INPUT_K
        assert meta["feature_order"] == ["z500", "t850"]
        assert meta["timestep_hours"] == 6.0

    def test_no_bc_export(self):
        model = _model(F_DYN)                     # dynamic features only
        params = model.init(jax.random.key(1))
        rollout = export_rollout(
            model, params, input_k=INPUT_K, output_k=OUTPUT_K,
            forecast_cycle=FC, batch_size=2, block_size=2)
        rng = np.random.default_rng(2)
        H = rollout.meta["history_size"]           # = 4 for input_k [-3..-1]
        hist = rng.standard_normal((2, H, V, F_DYN)).astype(np.float32)
        _, preds = rollout.call(hist)
        want = _direct_rollout(model, params, hist, None, None, 2)
        np.testing.assert_allclose(np.asarray(preds), want,
                                   rtol=1e-5, atol=1e-5)
        with pytest.raises(ValueError, match="takes no boundary"):
            rollout.call(hist, hist)


class TestForecastService:
    @pytest.fixture(scope="class")
    def svc(self, artifact):
        return ForecastService.from_dir(artifact["path"],
                                        max_batch_delay_s=0.02)

    def _raw_inputs(self, svc, B, n_steps, seed=3):
        rng = np.random.default_rng(seed)
        H = svc.meta["history_size"]
        hist = (rng.standard_normal((B, H, V, F_DYN)) * 3.0 + 5.0
                ).astype(np.float32)
        bc = (rng.standard_normal((B, n_steps, len(INPUT_K), V, F_BC)) * 2.0
              + 1.0).astype(np.float32)
        return hist, bc

    def _expected(self, artifact, svc, hist, bc, n_steps):
        """Scale -> direct engine rollout (block-chunked) -> inverse."""
        a = artifact
        hs = np.asarray(a["scaler"].transform(hist), np.float32)
        bs = np.asarray(a["scaler_bc"].transform(bc), np.float32)
        block = svc.meta["block_size"]
        n_blocks = -(-n_steps // block)
        total = n_blocks * block
        if bs.shape[1] < total:
            bs = np.concatenate(
                [bs, np.repeat(bs[:, -1:], total - bs.shape[1], axis=1)], 1)
        indexer = ARIndexer.build(INPUT_K, OUTPUT_K, FC, 1)
        fn, _ = make_rollout_block(a["model"], indexer, block, jit=False)
        geom = a["model"].geometry_pytree()
        h, chunks = hs, []
        for b in range(n_blocks):
            h, _, p = fn(a["params"], h, None,
                         bs[:, b * block:(b + 1) * block],
                         a["static"], geom)
            chunks.append(np.asarray(p))
        preds = np.concatenate(chunks, axis=1)[:, :n_steps]
        return np.asarray(a["scaler"].inverse_transform(preds), np.float32)

    def test_predict_full_batch(self, artifact, svc):
        hist, bc = self._raw_inputs(svc, BATCH, BLOCK)
        got = svc.predict(hist, BLOCK, bc)
        want = self._expected(artifact, svc, hist, bc, BLOCK)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_predict_pads_small_batch_and_multi_block(self, artifact, svc):
        n_steps = BLOCK * 2 + 1                    # 3 blocks, last partial
        hist, bc = self._raw_inputs(svc, 1, n_steps, seed=4)
        got = svc.predict(hist[0], n_steps, bc[0])  # unbatched call
        assert got.shape == (n_steps, len(OUTPUT_K), V, F_DYN)
        want = self._expected(artifact, svc, hist, bc, n_steps)[0]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_predict_splits_oversized_batch(self, artifact, svc):
        B = BATCH + 2
        hist, bc = self._raw_inputs(svc, B, BLOCK, seed=5)
        got = svc.predict(hist, BLOCK, bc)
        want = self._expected(artifact, svc, hist, bc, BLOCK)
        assert got.shape[0] == B
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_microbatching_matches_predict(self, artifact, svc):
        hist, bc = self._raw_inputs(svc, 2, BLOCK, seed=6)
        futs = [svc.submit(hist[i], BLOCK, bc[i]) for i in range(2)]
        got = np.stack([f.result(timeout=60) for f in futs])
        want = svc.predict(hist, BLOCK, bc)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_leadtimes(self, svc):
        lt = svc.leadtimes(3)
        np.testing.assert_allclose(lt[:, 0], [0.0, 6.0, 12.0])

    def test_validation_errors(self, svc):
        H = svc.meta["history_size"]
        with pytest.raises(ValueError, match="history must be"):
            svc.predict(np.zeros((H, V, F_DYN + 1), np.float32), 1)
        with pytest.raises(ValueError, match="requires boundary"):
            svc.predict(np.zeros((H, V, F_DYN), np.float32), 1)
        with pytest.raises(ValueError, match="n_steps"):
            svc.predict(np.zeros((H, V, F_DYN), np.float32), 0,
                        np.zeros((1, len(INPUT_K), V, F_BC), np.float32))


class TestEnsembleServing:
    @pytest.fixture(scope="class")
    def ens_artifact(self, artifact, tmp_path_factory):
        """2-member ensemble artifact sharing the single-model fixture's
        geometry, static fields and scalers."""
        from deepsphere_weather_tpu.serve import export_ensemble_rollout

        model = artifact["model"]
        p0 = artifact["params"]
        p1 = _randomized(model.init(jax.random.key(42)), 12)
        member_params = jax.tree_util.tree_map(
            lambda a, b: np.stack([np.asarray(a), np.asarray(b)]), p0, p1)
        rollout = export_ensemble_rollout(
            model, member_params, input_k=INPUT_K, output_k=OUTPUT_K,
            forecast_cycle=FC, batch_size=BATCH, block_size=BLOCK,
            static=artifact["static"], n_bc_features=F_BC,
            timestep_hours=6.0)
        path = tmp_path_factory.mktemp("ens") / "model"
        save_artifact(path, rollout, scaler=artifact["scaler"],
                      scaler_bc=artifact["scaler_bc"])
        return dict(path=path, members=[p0, p1], model=model,
                    static=artifact["static"])

    def test_matches_per_member_rollouts(self, ens_artifact):
        a = ens_artifact
        exported, _, _ = load_artifact(a["path"])
        assert exported.meta["n_members"] == 2
        rng = np.random.default_rng(8)
        H = exported.meta["history_size"]
        hist = rng.standard_normal((2, BATCH, H, V, F_DYN)).astype(np.float32)
        bc = rng.standard_normal(
            (BATCH, BLOCK, len(INPUT_K), V, F_BC)).astype(np.float32)
        _, preds = exported.call(hist, bc)
        for m, pm in enumerate(a["members"]):
            want = _direct_rollout(a["model"], pm, hist[m], bc,
                                   a["static"], BLOCK)
            np.testing.assert_allclose(np.asarray(preds)[m], want,
                                       rtol=1e-5, atol=1e-5)

    def test_service_member_axis_and_summary(self, ens_artifact):
        svc = ForecastService.from_dir(ens_artifact["path"],
                                       max_batch_delay_s=0.02)
        assert svc.n_members == 2
        rng = np.random.default_rng(9)
        H = svc.meta["history_size"]
        hist = (rng.standard_normal((H, V, F_DYN)) * 3 + 5).astype(np.float32)
        bc = (rng.standard_normal((BLOCK + 1, len(INPUT_K), V, F_BC)) * 2
              + 1).astype(np.float32)
        n_steps = BLOCK + 1                         # forces a second block
        fc = svc.predict(hist, n_steps, bc)         # unbatched request
        assert fc.shape == (2, n_steps, len(OUTPUT_K), V, F_DYN)
        # members differ (independent param draws)
        assert np.abs(fc[0] - fc[1]).max() > 1e-3
        s = svc.summarize(fc)
        np.testing.assert_allclose(s["mean"], fc.mean(0), rtol=1e-6)
        assert s["median"].shape == fc[0].shape
        assert (s["spread"] >= 0).all()
        # micro-batcher keeps the member axis per request
        got = svc.submit(hist, n_steps, bc).result(timeout=60)
        np.testing.assert_allclose(got, fc, rtol=1e-5, atol=1e-5)
        svc.close()


class TestHTTPServer:
    def test_endpoints(self, artifact):
        from deepsphere_weather_tpu.cli.serve import serve

        server, svc = serve(artifact["path"], port=0, block=False)
        base = f"http://127.0.0.1:{server.server_port}"
        try:
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                assert json.load(r)["status"] == "ok"
            with urllib.request.urlopen(f"{base}/v1/meta", timeout=30) as r:
                assert json.load(r)["n_node"] == V

            rng = np.random.default_rng(7)
            H = svc.meta["history_size"]
            hist = (rng.standard_normal((H, V, F_DYN)) * 3.0 + 5.0
                    ).astype(np.float32)
            bc = (rng.standard_normal((1, len(INPUT_K), V, F_BC)) * 2.0
                  + 1.0).astype(np.float32)
            buf = io.BytesIO()
            np.savez_compressed(buf, history=hist, bc=bc)
            req = urllib.request.Request(
                f"{base}/v1/predict?n_steps=1", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npz"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = np.load(io.BytesIO(r.read()))
            want = svc.predict(hist, 1, bc)
            np.testing.assert_allclose(out["forecast"], want,
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(out["leadtimes"], [[0.0]])

            # malformed request -> 400
            req = urllib.request.Request(
                f"{base}/v1/predict?n_steps=0", data=buf.getvalue())
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400
        finally:
            server.shutdown()
            server.server_close()
            svc.close()
