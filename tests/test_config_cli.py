"""Config system + end-to-end CLI driver tests."""

import json

import numpy as np
import pytest

from deepsphere_weather_tpu.config import (
    check_same_dict,
    create_experiment_directories,
    get_ar_settings,
    get_default_settings,
    get_model_name,
    get_model_settings,
    get_swag_settings,
    get_training_settings,
    read_config_file,
    write_config_file,
)


def make_config(tmp_path, **model_overrides):
    cfg = get_default_settings()
    cfg["model_settings"].update({
        "sampling_name": "Healpix_50km_toy",
        "sampling": "healpix",
        "sampling_kwargs": {"subdivisions": 4, "nest": True},
        "knn": 8,
        "increment_learning": True,
        **model_overrides,
    })
    cfg["training_settings"].update({
        "epochs": 1, "learning_rate": 2e-3, "training_batch_size": 8,
        "validation_batch_size": 8, "scoring_interval": 5,
    })
    cfg["ar_settings"].update({
        "input_k": [-3, -2, -1], "output_k": [0], "forecast_cycle": 1,
        "ar_iterations": 2,
    })
    cfg["dataloader_settings"]["num_workers"] = 1
    p = tmp_path / "config.json"
    write_config_file(cfg, p)
    return p, cfg


class TestConfig:
    def test_roundtrip_and_validation(self, tmp_path):
        p, cfg = make_config(tmp_path)
        cfg2 = read_config_file(p)
        assert get_model_settings(cfg2)["knn"] == 8
        assert get_ar_settings(cfg2)["ar_iterations"] == 2
        # unknown keys rejected
        bad = dict(cfg2)
        bad["model_settings"] = {**bad["model_settings"], "bogus_key": 1}
        with pytest.raises(ValueError, match="invalid keys"):
            get_model_settings(bad)
        # mandatory keys enforced
        bad2 = {"model_settings": {"architecture_name": "UNetSpherical"}}
        with pytest.raises(ValueError, match="mandatory"):
            get_model_settings(bad2)

    def test_legacy_gpu_keys_accepted_with_warning(self, tmp_path):
        _, cfg = make_config(tmp_path)
        cfg["training_settings"]["benchmark_cudnn"] = True
        cfg["training_settings"]["gpu_training"] = True
        with pytest.warns(UserWarning, match="legacy"):
            ts = get_training_settings(cfg)
        assert "benchmark_cudnn" not in ts

    def test_reference_config_file_loads(self, tmp_path):
        # a verbatim reference-schema config (reference:
        # configs/UNetSpherical/Healpix_400km/MaxPool-Graph_knn.json)
        ref_cfg = {
            "model_settings": {
                "kernel_size_conv": 3, "bias": True, "batch_norm": False,
                "batch_norm_before_activation": False, "activation": True,
                "activation_fun": "relu", "pool_method": "Max",
                "kernel_size_pooling": 4, "conv_type": "graph",
                "graph_type": "knn", "knn": 20, "periodic_padding": "True",
                "sampling_name": "Healpix_400km", "sampling": "healpix",
                "sampling_kwargs": {"subdivisions": 16, "nest": True},
                "architecture_name": "UNetSpherical",
            },
            "dataloader_settings": {
                "random_shuffling": True, "drop_last_batch": False,
                "prefetch_in_gpu": False, "prefetch_factor": 2,
                "pin_memory": False, "asyncronous_gpu_transfer": True,
                "num_workers": 8, "autotune_num_workers": False,
            },
            "training_settings": {
                "epochs": 15, "ar_training_strategy": "RNN",
                "learning_rate": 0.007, "training_batch_size": 16,
                "validation_batch_size": 16, "scoring_interval": 30,
                "save_model_each_epoch": False,
                "numeric_precision": "float32",
                "deterministic_training": True, "seed_model_weights": 10,
                "seed_random_shuffling": 15, "benchmark_cudnn": True,
                "gpu_training": True, "gpu_devices_ids": [0],
                "dataparallel_training": False,
            },
            "ar_settings": {
                "input_k": [-18, -12, -6], "output_k": [0],
                "forecast_cycle": 6, "ar_iterations": 6,
                "stack_most_recent_prediction": True,
            },
        }
        with pytest.warns(UserWarning):
            ms = get_model_settings(ref_cfg)
            ts = get_training_settings(ref_cfg)
        assert ms["sampling_kwargs"]["subdivisions"] == 16
        assert ts["learning_rate"] == 0.007
        name = get_model_name(ref_cfg)
        assert name == "RNN-AR6-UNetSpherical-Healpix_400km-Graph_knn-k20-MaxPooling"

    def test_all_shipped_configs_validate(self):
        # every shipped config (7 samplings x 6 pools x 3 graph types,
        # reference generator: scripts/07_create_configs.py:78-110) must
        # pass strict section validation and model-name derivation.
        # Full build+forward of each is scripts/validate_all_configs.py
        # (geometry construction is too slow for the default suite).
        from pathlib import Path

        from deepsphere_weather_tpu.sphere import (check_conv_type,
                                                   check_pool_method,
                                                   check_sampling)

        root = Path(__file__).resolve().parents[1] / "configs"
        paths = sorted(root.rglob("*.json"))
        assert len(paths) >= 108
        names = set()
        for p in paths:
            cfg = read_config_file(p)
            ms = get_model_settings(cfg)
            get_training_settings(cfg)
            get_ar_settings(cfg)
            check_sampling(ms["sampling"])
            check_conv_type(ms["conv_type"], ms["sampling"])
            check_pool_method(str(ms["pool_method"]).lower())
            assert ms["graph_type"] in ("knn", "voronoi", "mesh")
            name = get_model_name(cfg)
            # model names must be unique within a sampling directory
            names.add((p.parent.name, name))
        assert len(names) == len(paths)

    def test_swag_settings_section(self):
        cfg = {"SWAG_settings": {"SWAG": True, "nb_samples": 5}}
        s = get_swag_settings(cfg)
        assert s["swag"] is True and s["nb_samples"] == 5

    def test_check_same_dict(self):
        check_same_dict({"a": [1, 2]}, {"a": [1, 2]})
        with pytest.raises(ValueError):
            check_same_dict({"a": 1}, {"a": 2})

    def test_experiment_dirs(self, tmp_path):
        d = create_experiment_directories(tmp_path, "my-model")
        assert (d / "model_weights").is_dir()
        assert (d / "model_predictions" / "space_chunked").is_dir()
        with pytest.raises(FileExistsError):
            create_experiment_directories(tmp_path, "my-model")
        create_experiment_directories(tmp_path, "my-model", force=True)


class TestEndToEndDriver:
    def test_train_predict_verify(self, tmp_path):
        """The reference's main driver flow on toy data (SURVEY.md §4.5:
        toy-data end-to-end train+predict+verify smoke test)."""
        from deepsphere_weather_tpu.cli.train_predict import main
        from deepsphere_weather_tpu.data import generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=260, seed=3)
        cfg_path, _ = make_config(tmp_path)
        exp_path, gs = main(cfg_path, data_dir, tmp_path / "exp",
                            force=True, ar_iterations_prediction=4,
                            verbose=False)
        # experiment artifacts exist
        assert (exp_path / "config.json").exists()
        assert (exp_path / "model_weights" / "model.npz").exists()
        assert (exp_path / "model_skills"
                / "deterministic_global_skill.npz").exists()
        assert (exp_path / "figs" / "skills" / "global_skills.png").exists()
        assert (exp_path / "figs" / "training_info"
                / "loss_curves.png").exists()
        pred_store = (exp_path / "model_predictions" / "forecast_chunked"
                      / "test_forecasts.zarr")
        assert (pred_store / ".zgroup").exists()
        # skills finite
        assert np.all(np.isfinite(gs["RMSE"]))

        # --- fine-tune from the trained experiment (reference:
        #     pretrained_model_name, train_predict_state.py:272-274) ------
        cfg2_path, cfg2 = make_config(
            tmp_path, pretrained_model_name=exp_path.name,
            model_name="finetuned-from-pretrained")
        exp2, gs2 = main(cfg2_path, data_dir, tmp_path / "exp",
                         force=True, ar_iterations_prediction=2,
                         verbose=False)
        assert exp2.name == "finetuned-from-pretrained"
        assert np.all(np.isfinite(gs2["RMSE"]))
        # a wrong pretrained name must fail loudly
        bad_path, _ = make_config(tmp_path,
                                  pretrained_model_name="no-such-model")
        with pytest.raises(FileNotFoundError):
            main(bad_path, data_dir, tmp_path / "exp", force=True,
                 ar_iterations_prediction=2, verbose=False)

        # --- scaler + benchmark drivers over the same data dir -----------
        from deepsphere_weather_tpu.cli.compute_benchmarks import (
            main as bench_main)
        from deepsphere_weather_tpu.cli.compute_scalers import (
            main as scalers_main)

        scalers_main(data_dir, verbose=False)
        assert (data_dir / "Scalers"
                / "GlobalStandardScaler_dynamic.npz").exists()
        assert any((data_dir / "Climatology").iterdir())
        bench_main(data_dir, n_leadtimes=4, verbose=False)
        assert any((data_dir / "Benchmarks").iterdir())

        # --- SWAG fine-tune + ensemble predict off the trained model -----
        from deepsphere_weather_tpu.cli.finetune_swag import (
            main as swag_main)

        swag_main(exp_path, data_dir, epochs=1, nb_samples=2,
                  swag_freq=1, max_num_models=4,
                  ar_iterations_prediction=2, verbose=False)
        assert (exp_path / "model_weights" / "model_swag.npz").exists()
        ens = (exp_path / "model_predictions" / "swag")
        assert ens.exists() and any(ens.iterdir())
        assert (exp_path / "model_skills"
                / "swag_median_global_skill.npz").exists()
        prob = np.load(exp_path / "model_skills"
                       / "swag_probabilistic_global_skill.npz")
        crps_key = [k for k in prob.files if "CRPS" in k]
        assert crps_key and np.all(np.isfinite(prob[crps_key[0]]))

    def test_composed_scaler_from_config(self, tmp_path):
        """SequentialScaler composition selected from JSON (reference
        driver composition, train_predict_state.py:205-212): training AND
        prediction round-trip through anomaly + minmax-of-anomaly scalers,
        forecasts land back in physical units."""
        from deepsphere_weather_tpu.cli.compute_scalers import (
            main as scalers_main)
        from deepsphere_weather_tpu.cli.train_predict import main
        from deepsphere_weather_tpu.data import SphericalDataset, generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=260, seed=9)
        scalers_main(data_dir, verbose=False)
        assert (data_dir / "Scalers"
                / "MonthlyMinMaxStdAnomalyScaler_dynamic.npz").exists()

        cfg_path, cfg = make_config(tmp_path)
        cfg["dataloader_settings"]["scaler_dynamic"] = [
            "MonthlyStdAnomalyScaler_dynamic.npz",
            "MonthlyMinMaxStdAnomalyScaler_dynamic.npz",
        ]
        write_config_file(cfg, cfg_path)
        exp_path, gs = main(cfg_path, data_dir, tmp_path / "exp",
                            force=True, ar_iterations_prediction=2,
                            verbose=False)
        assert np.all(np.isfinite(gs["RMSE"]))
        # forecasts must be in PHYSICAL units (inverse round-trip through
        # the composition): compare magnitudes against the raw store
        from deepsphere_weather_tpu.engine.prediction import ForecastDataset
        fc = ForecastDataset.open(exp_path / "model_predictions"
                                  / "forecast_chunked"
                                  / "test_forecasts.zarr")
        raw = SphericalDataset.open(
            data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
        zi = list(fc.feature_order).index("z500")
        z_pred = fc.read_leadtime(0)[..., zi]
        z_raw = raw.read_stacked(np.arange(20))[
            ..., list(raw.feature_order).index("z500")]
        assert np.isfinite(z_pred).all()
        assert 0.5 < np.abs(z_pred).mean() / np.abs(z_raw).mean() < 2.0

    def test_date_range_split_from_config(self, tmp_path):
        """Explicit train/val/test periods from JSON (reference pins years,
        train_predict_state.py:217-236)."""
        from deepsphere_weather_tpu.cli.train_predict import main
        from deepsphere_weather_tpu.data import generate_toy_data
        from deepsphere_weather_tpu.engine.prediction import ForecastDataset

        data_dir = tmp_path / "data"
        # 2010-01-01 .. 2010-03-07 at 6 h
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=260, seed=4)
        cfg_path, cfg = make_config(tmp_path)
        cfg["training_settings"].update({
            "training_period": ["2010-01-01", "2010-02-10"],
            "validation_period": ["2010-02-10", "2010-02-20"],
            "test_period": ["2010-02-20", "2010-03-07"],
        })
        write_config_file(cfg, cfg_path)
        exp_path, gs = main(cfg_path, data_dir, tmp_path / "exp",
                            force=True, ar_iterations_prediction=2,
                            verbose=False)
        assert np.all(np.isfinite(gs["RMSE"]))
        fc = ForecastDataset.open(exp_path / "model_predictions"
                                  / "forecast_chunked"
                                  / "test_forecasts.zarr")
        frts = np.asarray(fc.group["forecast_reference_time"][...],
                          dtype="int64").view("datetime64[ns]")
        assert frts.min() >= np.datetime64("2010-02-20")
        assert frts.max() < np.datetime64("2010-03-07")
        # partially-set periods must fail loudly
        cfg["training_settings"]["validation_period"] = None
        write_config_file(cfg, cfg_path)
        with pytest.raises(ValueError, match="period"):
            main(cfg_path, data_dir, tmp_path / "exp", force=True,
                 verbose=False)

    def test_equiangular_image_conv_cli(self, tmp_path):
        """conv_type='image' (equiangular 2D conv path) through the full
        driver."""
        from deepsphere_weather_tpu.cli.train_predict import main
        from deepsphere_weather_tpu.data import generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"nlat": 12, "nlon": 24},
                          sampling="equiangular", n_timesteps=200, seed=6)
        cfg_path, _ = make_config(
            tmp_path, sampling_name="Equiangular_toy",
            sampling="equiangular",
            sampling_kwargs={"nlat": 12, "nlon": 24},
            conv_type="image", pool_method="Avg")
        exp_path, gs = main(cfg_path, data_dir, tmp_path / "exp",
                            force=True, ar_iterations_prediction=2,
                            verbose=False)
        assert np.all(np.isfinite(gs["RMSE"]))

    def test_resume_training(self, tmp_path):
        """--resume continues from params + optimizer moments + grown
        AR-scheduler state (durability beyond the reference, which can
        only restart from scratch)."""
        from deepsphere_weather_tpu.cli.train_predict import main
        from deepsphere_weather_tpu.data import generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=200, seed=5)
        cfg_path, _ = make_config(tmp_path)
        exp_path, gs1 = main(cfg_path, data_dir, tmp_path / "exp",
                             force=True, ar_iterations_prediction=2,
                             verbose=False)
        w1 = np.load(exp_path / "model_weights" / "model.npz")
        first = {k: w1[k].copy() for k in list(w1.files)[:3]}
        # resume: must load the checkpoint (not re-init) and keep training
        exp_path2, gs2 = main(cfg_path, data_dir, tmp_path / "exp",
                              resume=True, ar_iterations_prediction=2,
                              verbose=False)
        assert exp_path2 == exp_path
        w2 = np.load(exp_path / "model_weights" / "model.npz")
        # Proof the checkpoint was LOADED: training is bit-deterministic
        # under fixed seeds (test_reproducibility_regimes), so a silent
        # from-scratch restart would reproduce run-1 weights exactly;
        # a true resume continues from them and must differ.
        diffs = [np.abs(w2[k] - first[k]).max() for k in first]
        assert any(d > 0 for d in diffs)
        assert np.all(np.isfinite(gs2["RMSE"]))
        # resume without a checkpoint must fail loudly, not silently
        # retrain from scratch
        cfg3, _ = make_config(tmp_path, model_name="never-trained")
        with pytest.raises(FileNotFoundError, match="resume"):
            main(cfg3, data_dir, tmp_path / "exp", resume=True,
                 ar_iterations_prediction=2, verbose=False)

    def test_mesh_training_from_config(self, tmp_path):
        """n_data_parallel / n_node_parallel in training_settings drive a
        ('data','node') mesh through the full CLI (dp x sp layout,
        SURVEY.md §2.14); the reference's nearest analog is the dead
        dataparallel_training flag (utils_config.py:74)."""
        import jax

        from deepsphere_weather_tpu.cli.train_predict import main
        from deepsphere_weather_tpu.data import generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=200, seed=6)
        cfg_path, cfg = make_config(tmp_path, model_name="mesh-train")
        cfg["training_settings"]["n_data_parallel"] = 2
        cfg["training_settings"]["n_node_parallel"] = 2
        write_config_file(cfg, cfg_path)
        exp_path, gs = main(cfg_path, data_dir, tmp_path / "exp",
                            force=True, ar_iterations_prediction=2,
                            verbose=False)
        assert (exp_path / "model_weights" / "model.npz").exists()
        assert np.all(np.isfinite(gs["RMSE"]))
        # an oversized mesh must fail loudly, not silently undersubscribe
        cfg["training_settings"]["n_data_parallel"] = 2 * len(jax.devices())
        write_config_file(cfg, cfg_path)
        with pytest.raises(RuntimeError, match="mesh"):
            main(cfg_path, data_dir, tmp_path / "exp", force=True,
                 ar_iterations_prediction=2, verbose=False)

    def test_experiment_orchestrators(self, tmp_path):
        """Sweep + DeepEnsemble launchers (reference 0X_exp_* scripts)."""
        from deepsphere_weather_tpu.cli.experiments import (
            run_deep_ensemble, run_sweep)
        from deepsphere_weather_tpu.data import generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=200, seed=4)
        cfg_path, _ = make_config(tmp_path)
        res = run_sweep(cfg_path, data_dir, tmp_path / "exp",
                        sweep={"pool_method": ["Interp"]})
        assert len(res) == 1 and all(np.isfinite(v) for v in res.values())

        out = run_deep_ensemble(cfg_path, data_dir, tmp_path / "exp",
                                n_members=2, ar_iterations_prediction=2)
        ens_dir = tmp_path / "exp" / "DeepEnsemble"
        assert (ens_dir / "ensemble.zarr" / ".zgroup").exists()
        assert (ens_dir / "median.zarr" / ".zgroup").exists()
        assert (ens_dir / "probabilistic_global_skill.npz").exists()
        assert "probabilistic_skill" in out

    def test_deep_ensemble_member_parallel(self, tmp_path):
        # one vmapped training loop for all members: distinct member
        # params (per-member seeds), predict-CLI-compatible member dirs,
        # same ensemble artifacts as the sequential path
        from deepsphere_weather_tpu.cli.experiments import run_deep_ensemble
        from deepsphere_weather_tpu.data import generate_toy_data

        data_dir = tmp_path / "data"
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 4, "nest": True},
                          n_timesteps=200, seed=5)
        cfg_path, _ = make_config(tmp_path)
        out = run_deep_ensemble(cfg_path, data_dir, tmp_path / "exp",
                                n_members=2, ar_iterations_prediction=2,
                                member_parallel=True)
        ens_dir = tmp_path / "exp" / "DeepEnsemble"
        assert (ens_dir / "ensemble.zarr" / ".zgroup").exists()
        assert (ens_dir / "median.zarr" / ".zgroup").exists()
        assert np.isfinite(out["global_skill"]["RMSE"]).all()
        # member dirs hold distinct weights
        member_dirs = sorted(d for d in (tmp_path / "exp").iterdir()
                             if d.name.endswith("member0")
                             or d.name.endswith("member1"))
        assert len(member_dirs) == 2
        w0 = np.load(member_dirs[0] / "model_weights" / "model.npz")
        w1 = np.load(member_dirs[1] / "model_weights" / "model.npz")
        diffs = [np.abs(w0[k] - w1[k]).max() for k in w0.files
                 if w0[k].size > 1]
        assert max(diffs) > 0


class TestRuntimeSettings:
    def test_set_deterministic_training(self):
        # reference set_pytorch_deterministic parity: seeds host RNGs and
        # turns on sharding-invariant (partitionable) threefry keys
        import random

        import jax

        from deepsphere_weather_tpu.utils import set_deterministic_training

        assert set_deterministic_training(False) is False
        assert set_deterministic_training(True, seed=123) is True
        a = (random.random(), np.random.random())
        set_deterministic_training(True, seed=123)
        b = (random.random(), np.random.random())
        assert a == b
        assert jax.config.jax_threefry_partitionable is True


    def test_compilation_cache_enable_and_disable(self, tmp_path, monkeypatch):
        import jax

        from deepsphere_weather_tpu.utils import enable_compilation_cache
        from deepsphere_weather_tpu.utils import runtime

        monkeypatch.setattr(runtime, "_enabled_dir", None)
        # Tests after this one rely on the persistent cache the conftest set
        # up; restore it so they don't silently point at this tmp_path.
        orig_dir = jax.config.jax_compilation_cache_dir
        try:
            cache = tmp_path / "xla_cache"
            got = enable_compilation_cache(cache)
            assert got == str(cache) and cache.is_dir()
            assert jax.config.jax_compilation_cache_dir == str(cache)
            # idempotent re-enable of the same dir
            assert enable_compilation_cache(cache) == str(cache)

            # env-var opt-out wins when no explicit dir is given
            monkeypatch.setenv("DSW_COMPILE_CACHE", "off")
            assert enable_compilation_cache() == ""

            # env-var directory is honored
            monkeypatch.setenv("DSW_COMPILE_CACHE", str(tmp_path / "env_cache"))
            assert enable_compilation_cache() == str(tmp_path / "env_cache")

            # a compiled run with the cache enabled still computes correctly
            assert int(jax.jit(lambda x: x + 1)(jax.numpy.int32(1))) == 2
        finally:
            jax.config.update("jax_compilation_cache_dir", orig_dir)

    def test_compilation_cache_skips_experimental_backends(self, monkeypatch):
        import jax

        from deepsphere_weather_tpu.utils import runtime

        monkeypatch.setattr(runtime, "_enabled_dir", None)
        monkeypatch.delenv("DSW_COMPILE_CACHE", raising=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "axon")
        assert runtime.enable_compilation_cache() == ""


class TestConfigReviewRegressions:
    def test_model_name_preserves_pool_casing(self):
        from deepsphere_weather_tpu.config import get_model_name

        cfg = {
            "model_settings": {
                "sampling_name": "Healpix_400km", "sampling": "healpix",
                "sampling_kwargs": {"subdivisions": 16, "nest": True},
                "architecture_name": "UNetSpherical", "knn": 20,
                "pool_method": "MaxVal", "conv_type": "graph",
                "graph_type": "knn"},
            "training_settings": {"ar_training_strategy": "RNN"},
            "ar_settings": {"input_k": [-3, -2, -1], "output_k": [0],
                            "forecast_cycle": 1, "ar_iterations": 6},
        }
        assert get_model_name(cfg).endswith("MaxValPooling")

    def test_force_removes_stale_artifacts(self, tmp_path):
        from deepsphere_weather_tpu.config import create_experiment_directories

        d = create_experiment_directories(tmp_path, "m1")
        stale = d / "model_weights" / "model.npz"
        stale.write_bytes(b"old")
        d2 = create_experiment_directories(tmp_path, "m1", force=True)
        assert d2 == d and not stale.exists()
        # resume keeps the directory and its checkpoint
        stale.write_bytes(b"ckpt")
        d3 = create_experiment_directories(tmp_path, "m1", resume=True)
        assert d3 == d and stale.read_bytes() == b"ckpt"


class TestCliCommonHelpers:
    """cli/common.py: the scaler/split resolution shared by EVERY driver
    (round-2 review: finetune_swag/predict/experiments previously ignored
    scaler composition and date-range periods, silently feeding models
    data scaled differently than training)."""

    @pytest.fixture(scope="class")
    def toy(self, tmp_path_factory):
        from deepsphere_weather_tpu.data import (GlobalStandardScaler,
                                                 SphericalDataset,
                                                 generate_toy_data)
        root = tmp_path_factory.mktemp("common")
        generate_toy_data(root, sampling_kwargs={"subdivisions": 4,
                                                 "nest": True},
                          n_timesteps=120, seed=2)
        dyn = SphericalDataset.open(
            root / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
        sdir = root / "Scalers"
        sdir.mkdir(exist_ok=True)
        sc = GlobalStandardScaler().fit_dataset(dyn)
        sc.save(sdir / "GlobalStandardScaler_dynamic.npz")
        sc.save(sdir / "extra.npz")
        return root, dyn

    def test_resolve_scalers_default_and_composition(self, toy):
        from deepsphere_weather_tpu.cli.common import resolve_scalers
        from deepsphere_weather_tpu.data import SequentialScaler
        root, dyn = toy
        # default: conventional file picked up; no BC file -> None
        scaler, scaler_bc = resolve_scalers({}, root)
        assert scaler is not None and scaler_bc is None
        # list spec -> SequentialScaler composition
        scaler, _ = resolve_scalers(
            {"scaler_dynamic": ["GlobalStandardScaler_dynamic.npz",
                                "extra.npz"]}, root)
        assert isinstance(scaler, SequentialScaler)
        # round-trip through the composition
        x = dyn.read_stacked(np.arange(4))
        np.testing.assert_allclose(
            scaler.inverse_transform(scaler.transform(x)), x,
            rtol=1e-4, atol=1e-4)

    def test_split_datasets_periods_and_fractional(self, toy):
        from deepsphere_weather_tpu.cli.common import split_datasets
        root, dyn = toy
        # fractional default: contiguous cover of the timeline
        s = split_datasets({}, dyn)
        (a, b), (c, d), (e, f) = s["bounds"]
        assert a == 0 and b == c and d == e and f == dyn.n_time
        # explicit periods pin the boundaries
        s2 = split_datasets({
            "training_period": ["2010-01-01", "2010-01-10"],
            "validation_period": ["2010-01-10", "2010-01-15"],
            "test_period": ["2010-01-15", "2010-01-31"]}, dyn)
        assert s2["train"].n_time + s2["val"].n_time + s2["test"].n_time \
            <= dyn.n_time
        assert s2["train"].time[-1] < s2["val"].time[0] <= s2["test"].time[0]
        # partial period spec is a loud error
        with pytest.raises(ValueError, match="must\\s+all"):
            split_datasets({"training_period": ["2010-01-01", "2010-01-10"],
                            "validation_period": None,
                            "test_period": None}, dyn)
