"""The production/parity presets are the single source of truth:
bench.py must measure EXACTLY TrainingConfig.production(), the CLI
--preset flag must reproduce it, and explicit flags must override it.
(VERDICT r2 "no single source of truth for the production configuration".)
"""

import importlib.util
import os

from mimm_tpu.config import (PRODUCTION_SEQ_BUCKETS, TrainingConfig,
                             construct_training_parameters)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_config_is_the_production_preset():
    bench = _load_bench()
    cfg = bench.build_config(on_tpu=True)
    expected = TrainingConfig.production(batch_size=bench.BATCH,
                                         mi_estimator="dv")
    assert cfg == expected
    # the bench's bucket mix covers exactly the production buckets
    assert tuple(sorted(bench.BUCKET_MIX)) == tuple(sorted(PRODUCTION_SEQ_BUCKETS))
    assert abs(sum(bench.BUCKET_MIX.values()) - 1.0) < 1e-6


def test_bench_off_tpu_fallbacks_only_touch_device_knobs():
    bench = _load_bench()
    cfg = bench.build_config(on_tpu=False)
    expected = TrainingConfig.production(
        batch_size=bench.BATCH, mi_estimator="dv",
        use_pallas_critic=False, flash_attention=False)
    assert cfg == expected


def test_production_preset_values():
    cfg = TrainingConfig.production()
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.gelu_tanh and cfg.adamw_moment_dtype == "bfloat16"
    assert cfg.seq_buckets == PRODUCTION_SEQ_BUCKETS
    assert cfg.scan_steps > 1 and cfg.compact_transfer
    # reference-parity training contract fields stay at reference defaults
    assert cfg.batch_size == 64 and cfg.mi_estimator == "dv"
    assert cfg.init_lr == 1e-4 and cfg.max_seq_length == 320


def test_parity_preset_is_exact():
    cfg = TrainingConfig.parity()
    assert cfg.compute_dtype == "float32"
    assert not cfg.gelu_tanh and cfg.adamw_moment_dtype == "float32"
    assert cfg.seq_buckets == () and cfg.scan_steps == 1
    assert not cfg.use_pallas_critic and not cfg.compact_transfer
    assert cfg.rng_impl == "threefry2x32"


def test_cli_preset_and_explicit_flag_override():
    cfg = construct_training_parameters(["--preset", "production"])
    assert cfg == TrainingConfig.production()
    cfg = construct_training_parameters(
        ["--preset", "production", "--scan_steps", "4",
         "--batch_size", "128"])
    assert cfg == TrainingConfig.production(scan_steps=4, batch_size=128)
    cfg = construct_training_parameters(["--preset", "parity"])
    assert cfg == TrainingConfig.parity()
    # no preset: plain defaults, flags apply
    cfg = construct_training_parameters(["--seq_buckets", "64,128"])
    assert cfg == TrainingConfig().replace(seq_buckets=(64, 128))


def test_cli_defaults_unchanged_without_preset():
    assert construct_training_parameters([]) == TrainingConfig()
