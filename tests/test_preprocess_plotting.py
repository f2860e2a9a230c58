"""Preprocessing + extended plotting tests."""

from pathlib import Path

import numpy as np
import pytest

from deepsphere_weather_tpu.data import generate_toy_data
from deepsphere_weather_tpu.data.preprocess import (
    check_no_missing_timesteps,
    reformat_pl,
    reformat_toa,
    remap_to_sampling,
    rechunk_to_space_chunked,
    zarrify_raw_data,
)
from deepsphere_weather_tpu.sphere import build_sampling


class TestReformat:
    def test_reformat_pl_unstacks_levels(self):
        data = {
            "z": np.random.default_rng(0).random((4, 2, 10)),
            "t": np.random.default_rng(1).random((4, 2, 10)),
            "level": np.array([500, 850]),
            "sp": np.random.default_rng(2).random((4, 10)),  # no level dim
        }
        out = reformat_pl(data, plev_name="level",
                          var_levels={"z": [500], "t": [850]})
        assert set(out) == {"z500", "t850", "sp"}
        np.testing.assert_array_equal(out["z500"], data["z"][:, 0])
        np.testing.assert_array_equal(out["t850"], data["t"][:, 1])

    def test_reformat_toa_deaccumulates(self):
        tisr_j = np.array([3600.0, 7200.0])
        np.testing.assert_allclose(reformat_toa(tisr_j, 1), [1.0, 2.0])


class TestRemap:
    def test_constant_field_preserved(self):
        dst = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        field = np.ones((3, 8, 16), dtype=np.float32)
        out = remap_to_sampling(field, dst)
        assert out.shape == (3, 192)
        np.testing.assert_allclose(out, 1.0, rtol=1e-5)

    def test_smooth_field_accuracy(self):
        # remapping sin(lat) from a fine lat/lon grid should be accurate
        dst = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        nlat, nlon = 32, 64
        lat_1d = 90.0 - (np.arange(nlat) + 0.5) * (180.0 / nlat)
        field = np.sin(np.deg2rad(lat_1d))[:, None] * np.ones((1, nlon))
        out = remap_to_sampling(field.astype(np.float32), dst)
        expected = np.sin(np.deg2rad(dst.lat))
        assert np.abs(out - expected).max() < 0.05


class TestIngest:
    def test_zarrify_append_and_rechunk(self, tmp_path):
        rng = np.random.default_rng(0)
        t0 = np.datetime64("2010-01-01")
        batches = []
        for i in range(3):
            time = t0 + np.arange(i * 4, (i + 1) * 4) * np.timedelta64(6, "h")
            batches.append((
                {"z500": rng.random((4, 12)).astype(np.float32)}, time))
        samp = build_sampling("healpix", {"subdivisions": 1, "nest": True})
        ds = zarrify_raw_data(tmp_path / "d.zarr", batches,
                              lat=samp.lat, lon=samp.lon, time_chunk=4)
        assert ds.n_time == 12 and ds.n_node == 12
        ds2 = rechunk_to_space_chunked(tmp_path / "d.zarr",
                                       tmp_path / "s.zarr", node_chunk=1)
        np.testing.assert_array_equal(ds2.read_all(), ds.read_all())
        assert ds2.variables["z500"].chunks == (12, 1)

    def test_missing_timesteps_detected(self):
        t = np.array(["2010-01-01", "2010-01-02", "2010-01-04"],
                     dtype="datetime64[ns]")
        with pytest.raises(ValueError, match="missing"):
            check_no_missing_timesteps(t)


class TestHovmollerAndAnimation:
    def test_hovmoller_diagram_class(self):
        from deepsphere_weather_tpu.plotting import (
            HovmollerDiagram, hovmoller_data)

        vals = np.random.default_rng(0).random((20, 50))
        coord = np.linspace(-88, 88, 50)
        time = np.arange("2010-01-01", "2010-01-21", dtype="datetime64[D]")
        h = HovmollerDiagram(vals, time, coord, bin_res=10.0)
        ref, bins = hovmoller_data(vals, coord, 10.0)
        np.testing.assert_array_equal(h.data, ref)
        np.testing.assert_array_equal(h.bins, bins)
        assert h.plot(title="zonal mean") is not None

    def test_sphere_field_accessor(self, tmp_path):
        # xsphere accessor parity: add_SphericalVoronoiMesh / has_mesh /
        # plot / plot_mesh (reference SURVEY.md §2.11)
        import matplotlib.pyplot as plt

        from deepsphere_weather_tpu.plotting import SphereField
        from deepsphere_weather_tpu.sphere import build_sampling

        samp = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        field = SphereField(np.arange(samp.n_nodes, dtype=float), samp)
        assert not field.has_mesh
        assert field.add_SphericalVoronoiMesh() is field
        assert field.has_mesh
        ax = field.plot(title="t")
        ax.figure.savefig(tmp_path / "field.png")
        plt.close(ax.figure)
        ax = field.plot_mesh()
        ax.figure.savefig(tmp_path / "mesh.png")
        plt.close(ax.figure)
        assert (tmp_path / "field.png").exists()
        assert (tmp_path / "mesh.png").exists()

    def test_hovmoller_plot(self, tmp_path):
        dyn, _, _ = generate_toy_data(
            tmp_path / "d", sampling_kwargs={"subdivisions": 4, "nest": True},
            n_timesteps=40, seed=9)
        from deepsphere_weather_tpu.plotting import create_hovmoller_plots

        out = create_hovmoller_plots(dyn, tmp_path / "figs")
        assert (out / "hovmoller_t850_lat.png").exists()

    def test_forecast_animation(self, tmp_path):
        import jax

        from deepsphere_weather_tpu.engine import AutoregressivePredictions
        from deepsphere_weather_tpu.models import UNetSpherical
        from deepsphere_weather_tpu.plotting import create_gif_forecast_error

        dyn, bc, static = generate_toy_data(
            tmp_path / "d", sampling_kwargs={"subdivisions": 4, "nest": True},
            n_timesteps=40, seed=10)
        ti = {
            "input_n_feature": 7, "output_n_feature": 2,
            "input_n_time": 2, "output_n_time": 1,
            "input_shape_info": {"dynamic": {"node": 192}},
            "output_shape_info": {"dynamic": {"node": 192}},
            "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
        }
        model = UNetSpherical(tensor_info=ti, sampling="healpix",
                              sampling_kwargs={"subdivisions": 4, "nest": True},
                              knn=4, pool_method="max",
                              increment_learning=True)
        params = model.init(jax.random.key(0))
        fc = AutoregressivePredictions(
            model, params, data_dynamic=dyn, data_bc=bc, data_static=static,
            input_k=[-2, -1], output_k=[0], forecast_cycle=1, ar_iterations=3,
            forecast_reference_times=dyn.time[[10]], batch_size=1,
            zarr_fpath=tmp_path / "f.zarr")
        # sampling= renders frames as filled Voronoi polygons
        from deepsphere_weather_tpu.sphere import build_sampling
        samp = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        gif = create_gif_forecast_error(fc, dyn, tmp_path / "err.gif",
                                        variable="z500", sampling=samp)
        assert gif.exists() and gif.stat().st_size > 1000

        # anomaly-space variant (reference my_plotting.py:1077-1270):
        # obs and forecast are scaler-transformed at each valid time
        from deepsphere_weather_tpu.data.scalers import AnomalyScaler
        from deepsphere_weather_tpu.plotting import (
            create_gif_forecast_anom_error,
        )

        anom = AnomalyScaler(time_groups="month", standardized=True).fit(
            dyn.read_stacked(range(dyn.n_time)), dyn.time,
            feature_order=dyn.feature_order)
        gif2 = create_gif_forecast_anom_error(
            fc, dyn, anom, tmp_path / "anom_err.gif", variable="z500")
        assert gif2.exists() and gif2.stat().st_size > 1000


class TestPlottingReviewRegressions:
    def test_skill_maps_single_leadtime(self, tmp_path):
        from deepsphere_weather_tpu.plotting.skills import plot_skill_maps
        from deepsphere_weather_tpu.verif.deterministic import SkillDataset

        rng = np.random.default_rng(0)
        sd = SkillDataset(
            {"BIAS": rng.standard_normal((1, 48, 1)),
             "RMSE": np.abs(rng.standard_normal((1, 48, 1)))},
            np.asarray([6.0]), ["z500"],
            lat=rng.uniform(-90, 90, 48), lon=rng.uniform(0, 360, 48))
        # one leadtime column x several skill rows crashed with IndexError
        plot_skill_maps(sd, tmp_path, skills=["BIAS", "RMSE"],
                        leadtime_indices=[0])
        assert any(tmp_path.glob("**/*.png"))

    def test_skill_maps_polygon_mesh(self, tmp_path):
        # with sampling= given, maps render as filled Voronoi polygons
        # (reference cartopy polygon-mesh look, my_plotting.py:215-267)
        from deepsphere_weather_tpu.plotting.skills import plot_skill_maps
        from deepsphere_weather_tpu.sphere import build_sampling
        from deepsphere_weather_tpu.verif.deterministic import SkillDataset

        samp = build_sampling("healpix", {"subdivisions": 2, "nest": True})
        n = samp.n_nodes
        rng = np.random.default_rng(1)
        xyz = samp.coords_3d
        sd = SkillDataset(
            {"RMSE": np.abs(rng.standard_normal((2, n, 1)))},
            np.asarray([6.0, 12.0]), ["z500"],
            lat=np.degrees(np.arcsin(xyz[:, 2])),
            lon=np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0])))
        plot_skill_maps(sd, tmp_path, skills=["RMSE"], sampling=samp)
        out = tmp_path / "skill_maps_z500.png"
        assert out.exists() and out.stat().st_size > 10_000

    def test_hovmoller_keeps_max_edge_and_subdaily_axis(self):
        from deepsphere_weather_tpu.plotting.hovmoller import hovmoller_data

        lon = np.asarray([0.0, 90.0, 180.0, 270.0, 355.0])
        vals = np.ones((2, 5))
        hov, centers = hovmoller_data(vals, lon, bin_res=5.0)
        # the 355-degree meridian (max coordinate on a bin edge) is kept
        covered = ~np.isnan(hov[0])
        assert covered.sum() == 5

    def test_render_frames_clears_stale(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from deepsphere_weather_tpu.plotting.animation import _render_frames

        def frame(i):
            fig, ax = plt.subplots(figsize=(1, 1))
            ax.plot([0, i])
            return fig

        out = tmp_path / "anim.gif"
        # plant a stale frame from a "previous longer run"
        stale_dir = tmp_path / "anim_frames"
        stale_dir.mkdir()
        (stale_dir / "frame_0005.png").write_bytes(b"junk")
        _render_frames(frame, 2, out)
        assert not (stale_dir / "frame_0005.png").exists()


class TestPerVariableRemap:
    def test_largest_area_fraction_preserves_classes(self):
        """Categorical remap (reference my_remap.py:75-88: soil_type via
        CDO remaplaf): LAF keeps class labels, conservative averages."""
        from deepsphere_weather_tpu.data.preprocess import (
            get_variable_interp_method, remap_to_sampling)
        from deepsphere_weather_tpu.sphere import build_sampling

        dst = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        rng = np.random.default_rng(0)
        field = rng.integers(0, 7, (1, 18, 36)).astype(np.float32)
        laf = remap_to_sampling(field, dst, method="largest_area_fraction")
        cons = remap_to_sampling(field, dst, method="conservative")
        assert set(np.unique(laf)).issubset(set(range(7)))
        assert not set(np.unique(cons)).issubset(set(range(7)))
        assert get_variable_interp_method("soil_type") == \
            "largest_area_fraction"
        assert get_variable_interp_method("slt") == "largest_area_fraction"
        assert get_variable_interp_method("geopotential") == "conservative"

    def test_grib_reader_falls_back_to_builtin_codec(self, tmp_path):
        """Without cfgrib the default reader uses the self-contained codec
        (data/grib.py), so ingest works with zero optional deps; a file the
        codec cannot parse surfaces the codec's error, not an ImportError."""
        from deepsphere_weather_tpu.data.grib import (
            GribRecord, GridSpec, write_grib2)
        from deepsphere_weather_tpu.data.preprocess import \
            _default_grib_reader

        grid = GridSpec("regular_ll", 10, nlon=20)
        path = tmp_path / "z500.grib"
        field = np.random.default_rng(0).normal(size=200).astype(np.float32)
        write_grib2(path, [GribRecord(
            "z", field, np.datetime64("2020-01-01T00"), grid,
            level_hPa=500)])
        fields, time, parsed = _default_grib_reader(str(path))
        assert fields["z"].shape == (1, 1, 200)
        np.testing.assert_allclose(fields["z"][0, 0], field,
                                   rtol=1e-4, atol=1e-4)
        assert parsed == grid

        bad = tmp_path / "bad.grib"
        bad.write_bytes(b"not a grib message")
        with pytest.raises(ValueError):
            _default_grib_reader(str(bad))


class TestGribRemapDriver:
    """remap_grib_files with an injected synthetic reader (VERDICT r2 #6:
    the driver must EXECUTE in CI — reference my_remap.py:198-337)."""

    @staticmethod
    def _tree(tmp_path, variable_type, variable, names):
        src = (tmp_path / "ERA5_HRES" / "N320" / variable_type / variable)
        src.mkdir(parents=True)
        for n in names:
            (src / n).touch()
        return src

    @staticmethod
    def _reader(path):
        import zlib
        rng = np.random.default_rng(zlib.crc32(Path(path).name.encode()))
        T, nlat, nlon = 2, 18, 36
        lat = np.linspace(-85, 85, nlat)
        fields = {
            "z": (50000 + 100 * np.sin(np.deg2rad(lat))[None, :, None]
                  + rng.standard_normal((T, nlat, nlon))).astype(np.float32),
            "slt": rng.integers(0, 7, (T, nlat, nlon)).astype(np.float32),
        }
        time = (np.datetime64("2010-01-01") +
                np.arange(T) * np.timedelta64(6, "h")).astype("datetime64[ns]")
        return fields, time

    def test_driver_remaps_caches_and_skips(self, tmp_path):
        from deepsphere_weather_tpu.data.preprocess import remap_grib_files
        from deepsphere_weather_tpu.sphere import build_sampling

        dst = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        self._tree(tmp_path, "dynamic", "dynamic_variables",
                   ["2010_01.grib", "2010_02.grib"])

        written = remap_grib_files(tmp_path, "ERA5_HRES", "Healpix_toy",
                                   "dynamic", dst, reader=self._reader,
                                   verbose=False)
        assert len(written) == 2
        out = np.load(written[0])
        # per-variable method dispatch INSIDE a dynamic_variables file:
        # z is conservative (continuous), slt is LAF (class labels kept)
        assert out["z"].shape == (2, dst.n_nodes)
        assert set(np.unique(out["slt"])).issubset(set(range(7)))
        assert not np.allclose(out["z"], np.round(out["z"]))
        assert out["time"].shape == (2,)
        # weight files cached per (method, src grid, dst sampling)
        wdir = tmp_path / "weights"
        cached = sorted(p.name for p in wdir.glob("*.npz"))
        assert cached == [
            "weights_conservative_N320_Healpix_toy.npz",
            "weights_largest_area_fraction_N320_Healpix_toy.npz"]

        # second run: outputs exist -> nothing rewritten without force
        again = remap_grib_files(tmp_path, "ERA5_HRES", "Healpix_toy",
                                 "dynamic", dst, reader=self._reader,
                                 verbose=False)
        assert again == []
        forced = remap_grib_files(tmp_path, "ERA5_HRES", "Healpix_toy",
                                  "dynamic", dst, reader=self._reader,
                                  force_remapping=True, verbose=False)
        assert len(forced) == 2

    def test_static_variable_set_and_validation(self, tmp_path):
        from deepsphere_weather_tpu.data.preprocess import remap_grib_files
        from deepsphere_weather_tpu.sphere import build_sampling

        dst = build_sampling("healpix", {"subdivisions": 4, "nest": True})
        self._tree(tmp_path, "static", "soil_type", ["slt.grib"])

        def reader(path):
            rng = np.random.default_rng(1)
            return {"slt": rng.integers(0, 7, (1, 18, 36)).astype(
                np.float32)}, None

        written = remap_grib_files(tmp_path, "ERA5_HRES", "Healpix_toy",
                                   "static", dst, reader=reader,
                                   verbose=False)
        assert [p.name for p in written] == ["slt.npz"]
        out = np.load(written[0])
        assert set(np.unique(out["slt"])).issubset(set(range(7)))
        assert "time" not in out

        with pytest.raises(ValueError, match="variable_type"):
            remap_grib_files(tmp_path, "ERA5_HRES", "x", "both", dst)
        with pytest.raises(ValueError, match="unknown dataset"):
            remap_grib_files(tmp_path, "NOPE", "x", "static", dst)


class TestLAFEmptyRows:
    def test_no_overlap_rows_stay_empty(self):
        """Round-2 review regression: destination rows with NO source
        overlap must remap to 0, not inherit source cell 0's categorical
        value via a spurious one-hot."""
        from scipy import sparse as _sparse

        from deepsphere_weather_tpu.data import preprocess as pp

        # forge a cached conservative-weights matrix with an empty row 1
        W = _sparse.csr_matrix(
            (np.array([0.25, 0.75, 1.0]),
             np.array([0, 2, 1]),
             np.array([0, 2, 2, 3])), shape=(3, 4))
        import unittest.mock as mock
        with mock.patch.object(pp, "cached_arrays",
                               side_effect=lambda key, build: {
                                   "data": W.data, "indices": W.indices,
                                   "indptr": W.indptr,
                                   "shape": np.asarray(W.shape)}):
            from deepsphere_weather_tpu.sphere import build_sampling
            dst = build_sampling("healpix", {"subdivisions": 1,
                                             "nest": True})
            laf = pp.remap_weights_for_grid(2, 2, dst,
                                            method="largest_area_fraction")
        laf = laf.toarray()
        np.testing.assert_array_equal(laf[0], [0, 0, 1, 0])   # argmax 0.75
        np.testing.assert_array_equal(laf[1], [0, 0, 0, 0])   # empty stays
        np.testing.assert_array_equal(laf[2], [0, 1, 0, 0])
