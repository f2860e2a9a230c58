"""Verification metric tests: deterministic golden values + CRPS properties."""

import numpy as np
import pytest

from deepsphere_weather_tpu.verif import (
    crps_ensemble,
    deterministic_metrics,
    ensemble_spread_skill,
    rank_histogram,
)


class TestDeterministicMetrics:
    def test_perfect_forecast(self):
        obs = np.random.default_rng(0).standard_normal((50, 7))
        m = deterministic_metrics(obs, obs, axis=0)
        np.testing.assert_allclose(m["BIAS"], 0, atol=1e-12)
        np.testing.assert_allclose(m["RMSE"], 0, atol=1e-12)
        np.testing.assert_allclose(m["pearson_R2"], 1, atol=1e-10)
        np.testing.assert_allclose(m["rSD"], 1, atol=1e-10)
        np.testing.assert_allclose(m["KGE"], 1, atol=1e-8)
        np.testing.assert_allclose(m["NSE"], 1, atol=1e-10)

    def test_constant_bias(self):
        rng = np.random.default_rng(1)
        obs = rng.standard_normal((100, 3)) + 10
        pred = obs + 2.0
        m = deterministic_metrics(pred, obs, axis=0)
        np.testing.assert_allclose(m["BIAS"], 2.0, atol=1e-10)
        np.testing.assert_allclose(m["MAE"], 2.0, atol=1e-10)
        np.testing.assert_allclose(m["RMSE"], 2.0, atol=1e-10)
        np.testing.assert_allclose(m["percBIAS"], 20.0, rtol=0.05)
        np.testing.assert_allclose(m["pearson_R2"], 1.0, atol=1e-8)


class TestCategoricalMetrics:
    def test_contingency_table_hand_case(self):
        from deepsphere_weather_tpu.verif import categorical_metrics

        # events: obs exceeds 0.5 at [T, F] positions; hand-built table
        obs = np.array([[1.0], [1.0], [0.0], [0.0], [1.0], [0.0]])
        pred = np.array([[1.0], [0.0], [1.0], [0.0], [1.0], [0.0]])
        m = categorical_metrics(pred, obs, threshold=0.5, axis=0)
        # a=2 hits, b=1 false alarm, c=1 miss, d=2 correct negatives
        assert m["POD"][0] == pytest.approx(2 / 3)
        assert m["FAR"][0] == pytest.approx(1 / 3)
        assert m["CSI"][0] == pytest.approx(2 / 4)
        assert m["ACC"][0] == pytest.approx(4 / 6)
        assert m["FB"][0] == pytest.approx(1.0)

    def test_perfect_forecast(self):
        from deepsphere_weather_tpu.verif import categorical_metrics

        rng = np.random.default_rng(0)
        obs = rng.standard_normal((50, 4))
        m = categorical_metrics(obs, obs, threshold=0.0)
        np.testing.assert_allclose(m["POD"], 1.0)
        np.testing.assert_allclose(m["FAR"], 0.0)
        np.testing.assert_allclose(m["HSS"], 1.0)
        np.testing.assert_allclose(m["ETS"], 1.0)


class TestCRPS:
    def test_deterministic_limit_is_mae(self):
        # a 1-member "ensemble" with fair=False: CRPS == |x - y|
        obs = np.array([1.0, 2.0, 3.0])
        mem = np.array([[1.5, 2.0, 2.0]])
        np.testing.assert_allclose(crps_ensemble(mem, obs, fair=False),
                                   [0.5, 0.0, 1.0])

    def test_matches_bruteforce_kernel(self):
        rng = np.random.default_rng(2)
        M = 7
        mem = rng.standard_normal((M, 20))
        obs = rng.standard_normal(20)
        got = crps_ensemble(mem, obs, fair=False)
        # brute force: E|X-y| - 0.5 E|X-X'|
        t1 = np.abs(mem - obs[None]).mean(0)
        t2 = np.abs(mem[:, None] - mem[None, :]).mean((0, 1))
        np.testing.assert_allclose(got, t1 - 0.5 * t2, rtol=1e-10)

    def test_sharp_accurate_beats_diffuse(self):
        rng = np.random.default_rng(3)
        obs = np.zeros(500)
        sharp = rng.normal(0, 0.1, (10, 500))
        diffuse = rng.normal(0, 2.0, (10, 500))
        assert crps_ensemble(sharp, obs).mean() < crps_ensemble(
            diffuse, obs).mean()

    def test_spread_skill_and_rank(self):
        rng = np.random.default_rng(4)
        # perfectly calibrated: obs drawn from the same distribution
        mem = rng.normal(0, 1, (20, 200, 5))
        obs = rng.normal(0, 1, (200, 5))
        ss = ensemble_spread_skill(mem, obs)
        assert 0.8 < np.nanmean(ss["spread_skill_ratio"]) < 1.25
        rh = rank_histogram(mem, obs)
        assert rh.shape == (21,)
        # roughly flat histogram
        assert rh.max() < 2.5 * rh.min() + 10


class TestVerifReviewRegressions:
    def test_global_summary_all_nan_leadtime_stays_nan(self):
        from deepsphere_weather_tpu.verif.deterministic import (
            SkillDataset, global_summary)

        mse = np.ones((3, 4, 2))
        mse[1] = np.nan                 # leadtime with no matched samples
        sd = SkillDataset({"MSE": mse, "RMSE": np.sqrt(mse)},
                          np.asarray([1.0, 2.0, 3.0]), ["a", "b"])
        gs = global_summary(sd, np.ones(4))
        # an unmatched leadtime must NOT report 0 ("perfect") skill
        assert np.isnan(gs["MSE"][1]).all() and np.isnan(gs["RMSE"][1]).all()
        assert np.allclose(gs["MSE"][0], 1.0)

    def test_banded_summary_includes_max_edge_node(self):
        from deepsphere_weather_tpu.verif.deterministic import (
            SkillDataset, latitudinal_summary)

        lat = np.asarray([-90.0, -45.0, 0.0, 45.0, 90.0])
        v = np.arange(5, dtype=np.float64).reshape(1, 5, 1)
        sd = SkillDataset({"BIAS": v}, np.asarray([1.0]), ["a"],
                          lat=lat, lon=np.zeros(5))
        bands = latitudinal_summary(sd, lat_res=5)
        # every node lands in some band — the lat=90 pole included
        # (5-degree bands put each node alone in its band, so the band
        # means must sum to the node values' sum)
        assert np.nansum(bands["skills"]["BIAS"]) == v.sum()

    def test_banded_summary_nan_aware(self):
        # NaN-contaminated bands must renormalize weights over valid
        # nodes (same policy as global_summary) instead of zero-filling,
        # which biased band means toward 0
        from deepsphere_weather_tpu.verif.deterministic import (
            SkillDataset, latitudinal_summary)

        lat = np.asarray([-10.0, -10.0, 10.0, 10.0])
        v = np.asarray([2.0, np.nan, np.nan, np.nan]).reshape(1, 4, 1)
        sd = SkillDataset({"MSE": v}, np.asarray([1.0]), ["a"],
                          lat=lat, lon=np.zeros(4))
        bands = latitudinal_summary(sd, lat_res=20)
        out = bands["skills"]["MSE"][0, :, 0]
        # band with one valid node: its value, not value/2
        assert np.isclose(out[0], 2.0)
        # all-NaN band stays NaN, not 0
        assert np.isnan(out[1])

    def test_deterministic_feature_order_guard(self, toy_forecast_setup=None):
        from deepsphere_weather_tpu.verif.deterministic import deterministic

        class FakeF:
            feature_order = ["z500", "t850"]
        class FakeO:
            feature_order = ["t850", "z500"]
        with pytest.raises(ValueError, match="feature order mismatch"):
            deterministic(FakeF(), FakeO())


class TestExternalBaseline:
    def test_load_weyn_style_netcdf(self, tmp_path):
        """External-baseline skill ingest (reference reads Weyn-et-al RMSE
        netCDF, benchmark_samplings.py:96-100)."""
        import h5py

        from deepsphere_weather_tpu.verif import load_external_skill

        with h5py.File(tmp_path / "rmses_weyn.nc", "w") as f:
            f["lead_time"] = np.arange(6, 121, 6).astype(np.float64)
            f["z500"] = np.linspace(80, 700, 20)
            f["t850"] = np.linspace(0.8, 3.4, 20)
        sk = load_external_skill(tmp_path / "rmses_weyn.nc")
        assert set(sk.feature_order) == {"z500", "t850"}
        assert sk["RMSE"].shape == (20, 2)
        assert sk.leadtime_hours[0] == 6.0
        zi = sk.feature_order.index("z500")
        np.testing.assert_allclose(sk["RMSE"][:, zi],
                                   np.linspace(80, 700, 20))
        # explicit variable subset + missing-coordinate error
        sk2 = load_external_skill(tmp_path / "rmses_weyn.nc",
                                  variables=["z500"])
        assert sk2.feature_order == ["z500"]
        with h5py.File(tmp_path / "bad.nc", "w") as f:
            f["z500"] = np.linspace(80, 700, 20)
        with pytest.raises(ValueError, match="lead-time"):
            load_external_skill(tmp_path / "bad.nc")

    def test_benchmark_plot_with_external(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")

        from deepsphere_weather_tpu.plotting import benchmark_global_skills
        from deepsphere_weather_tpu.verif.deterministic import SkillDataset

        ours = SkillDataset(
            {"RMSE": np.linspace(50, 600, 40).reshape(20, 2)},
            np.arange(6, 121, 6), ["z500", "t850"])
        ext = SkillDataset(
            {"RMSE": np.linspace(80, 700, 40).reshape(20, 2)},
            np.arange(6, 121, 6), ["z500", "t850"])
        out = benchmark_global_skills({"ours": ours}, tmp_path / "figs",
                                      skills=["RMSE"],
                                      benchmarks={"weyn": ext})
        assert (out / "benchmark_RMSE.png").exists()


class TestStreamingVerification:
    """Node-tiled single-pass verification of space-chunked stores must
    reproduce the direct (in-RAM) path (VERDICT r3 #5: the round-3
    HEALPix-64 protocol verify re-read ~190 GB for a ~10 GB store)."""

    def _build(self, tmp_path, n_frt=6, L=4, V=33, node_chunk=5):
        from deepsphere_weather_tpu.data.dataset import (SphericalDataset,
                                                         save_dynamic)
        from deepsphere_weather_tpu.data.zarrstore import create_group
        from deepsphere_weather_tpu.engine.prediction import ForecastDataset

        rng = np.random.default_rng(3)
        feats = ["t850", "z500"]          # save_dynamic sorts features
        dt = np.timedelta64(6, "h")
        t0 = np.datetime64("2020-01-01")
        # obs covers frts + all leadtimes (with one gap to exercise the
        # unmatched-valid-time path)
        n_obs = n_frt + L + 2
        times = t0 + np.arange(n_obs) * dt
        # realistic magnitudes so the shifted-moment path is stressed
        obs_fields = {
            "z500": (54000 + 800 * rng.standard_normal((n_obs, V))
                     ).astype(np.float32),
            "t850": (280 + 8 * rng.standard_normal((n_obs, V))
                     ).astype(np.float32),
        }
        lat = np.linspace(-80, 80, V)
        lon = np.linspace(0, 350, V)
        save_dynamic(tmp_path / "obs.zarr", obs_fields, time=times,
                     lat=lat, lon=lon)
        obs = SphericalDataset.open(tmp_path / "obs.zarr")
        # truncate obs AFTER building forecasts so the last leadtimes of
        # the last frts have no matching observation
        g = create_group(tmp_path / "fc.zarr", overwrite=True,
                         attrs={"feature_order": feats})
        frt = t0 + (1 + np.arange(n_frt)) * dt
        for name in feats:
            a = g.create_array(name, shape=(n_frt, L, V),
                               chunks=(n_frt, L, node_chunk),
                               dtype=np.float32, compressor="zlib")
            a[...] = (obs_fields[name].mean()
                      + 0.5 * rng.standard_normal((n_frt, L, V))
                      * obs_fields[name].std()).astype(np.float32)
        ga = g.create_array("forecast_reference_time", shape=(n_frt,),
                            chunks=(n_frt,), dtype=np.int64,
                            compressor=None)
        ga[...] = frt.astype("datetime64[ns]").view(np.int64)
        lt = g.create_array("leadtime", shape=(L,), chunks=(L,),
                            dtype=np.float64, compressor=None)
        lt[...] = 6.0 * (1 + np.arange(L))
        for cname, cvals in (("lat", lat), ("lon", lon)):
            c = g.create_array(cname, shape=(V,), chunks=(V,),
                               dtype=np.float64, compressor=None)
            c[...] = cvals
        return ForecastDataset(g), obs

    def test_streaming_matches_direct(self, tmp_path, monkeypatch):
        from deepsphere_weather_tpu.verif.deterministic import deterministic

        fc, obs = self._build(tmp_path)
        direct = deterministic(fc, obs)
        # force the streaming path: a 1-byte RAM budget rejects the cache
        monkeypatch.setenv("DSW_VERIF_RAM_BYTES", "1")
        streamed = deterministic(fc, obs)
        assert sorted(streamed.skills) == sorted(direct.skills)
        for k in direct.skills:
            np.testing.assert_allclose(
                streamed[k], direct[k], rtol=1e-6, atol=1e-9,
                equal_nan=True, err_msg=k)

    def test_streaming_reads_each_chunk_once(self, tmp_path, monkeypatch):
        from deepsphere_weather_tpu.verif.deterministic import deterministic

        fc, obs = self._build(tmp_path)
        arr = fc.variables["z500"]
        reads = []
        orig = type(arr)._read_chunk

        def counting(self, idx):
            if self is arr:
                reads.append(idx)
            return orig(self, idx)

        monkeypatch.setattr(type(arr), "_read_chunk", counting)
        monkeypatch.setenv("DSW_VERIF_RAM_BYTES", "1")
        deterministic(fc, obs)
        # single pass: every chunk of the variable read exactly once
        assert len(reads) == len(set(reads))
        assert len(reads) == int(np.prod(arr.n_chunks))

    def test_aggregating_dim_node(self, tmp_path):
        """xverif API parity: spatial aggregation — skills per
        (leadtime, sample, feature), node axis consumed."""
        from deepsphere_weather_tpu.verif.deterministic import deterministic

        fc, obs = self._build(tmp_path)
        sd = deterministic(fc, obs, aggregating_dim="node")
        L = fc.n_leadtime
        assert sd["RMSE"].shape[0] == L
        assert sd["RMSE"].shape[2] == 2
        assert sd.lat is None
        # cross-check one (leadtime, sample) cell against a direct
        # node-axis computation
        t_sd = deterministic(fc, obs)                  # time aggregation
        pred0 = np.stack([fc.variables[n][:, 0, :]
                          for n in fc.feature_order], axis=-1)
        valid = fc.valid_time(0)
        sidx = np.searchsorted(obs.time, valid)
        ok = sidx < len(obs.time)
        ok &= obs.time[np.minimum(sidx, len(obs.time) - 1)] == valid
        o0 = obs.read_stacked(sidx[ok])
        want = np.sqrt(((pred0[ok][0] - o0[0]) ** 2).mean(axis=0))
        np.testing.assert_allclose(sd["RMSE"][0, 0], want, rtol=1e-6)
        # sample axis sized by the lead-0 match count; the time-aggregated
        # dataset keeps the node axis
        assert sd["RMSE"].shape[1] == int(ok.sum())
        assert t_sd["RMSE"].shape[1] == len(obs.lat)
