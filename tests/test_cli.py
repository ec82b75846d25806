"""CLI flag plumbing: reference flag-name compatibility and config
round-trips (no jax compute — pure argparse/dataclass)."""

from mimm_tpu.config import (DatasetConfig, TrainingConfig,
                             construct_dataset_parameters,
                             construct_training_parameters)


def test_training_flags_match_reference_names():
    """Every reference helpers.py:84-144 flag parses with the same name."""
    cfg = construct_training_parameters([
        "--image_dir", "/x/images", "--text_data_dir", "/x/text",
        "--bert_pretrained_dir", "/x/bert", "--bert_config_name", "cfg.json",
        "--save_directory", "/x/save", "--dataset_metadata", "/x/m.csv",
        "--dataset_disease_stats", "/x/d.csv", "--batch_size", "32",
        "--data_loader_workers", "8", "--num_train_epochs", "5",
        "--num_train_epochs_classifier", "50", "--mi_estimator", "infonce",
        "--init_lr", "0.001", "--max_seq_length", "256", "--img_size", "128",
        "--output_channels", "1", "--image_model_name", "resnet256_6_2_1",
        "--disease_label", "Edema", "--optimizer", "SGD",
    ])
    assert cfg.batch_size == 32 and cfg.mi_estimator == "infonce"
    assert cfg.disease_label == "Edema" and cfg.optimizer == "SGD"
    assert cfg.init_lr == 0.001 and cfg.img_size == 128


def test_training_defaults_match_reference():
    cfg = TrainingConfig()
    # reference defaults (helpers.py:110-141)
    assert cfg.batch_size == 64
    assert cfg.data_loader_workers == 32
    assert cfg.num_train_epochs == 20
    assert cfg.num_train_epochs_classifier == 100
    assert cfg.mi_estimator == "dv"
    assert cfg.init_lr == 1e-4
    assert cfg.max_seq_length == 320
    assert cfg.img_size == 256
    assert cfg.output_channels == 1
    assert cfg.image_model_name == "resnet256_6_2_1"
    assert cfg.disease_label == "Pneumonia"
    assert cfg.optimizer == "Adam"


def test_dataset_flags():
    cfg = construct_dataset_parameters(["--sub_folder", "p14",
                                        "--amount_for_training", "500"])
    assert cfg.sub_folder == "p14"
    assert cfg.amount_for_training == 500
    assert DatasetConfig().sub_folder == "p10"  # reference default


def test_config_replace_is_pure():
    a = TrainingConfig()
    b = a.replace(batch_size=8)
    assert a.batch_size == 64 and b.batch_size == 8


def test_tuple_flags_parse_comma_separated():
    cfg = construct_training_parameters(["--seq_buckets", "64,128,192,320"])
    assert cfg.seq_buckets == (64, 128, 192, 320)
    assert construct_training_parameters([]).seq_buckets == ()


def test_mesh_shape_flag_parses_axis_pairs():
    cfg = construct_training_parameters(["--mesh_shape", "data=4,model=2"])
    assert cfg.mesh_shape == (("data", 4), ("model", 2))
    assert dict(cfg.mesh_shape) == {"data": 4, "model": 2}
    cfg_pp = construct_training_parameters(["--mesh_shape", "data=2,pipe=4"])
    assert dict(cfg_pp.mesh_shape) == {"data": 2, "pipe": 4}
    assert construct_training_parameters([]).mesh_shape == ()


def test_mesh_shape_flag_rejects_bad_input():
    import pytest
    for bad in ["data=0", "data=2,data=4", "data", "=4"]:
        with pytest.raises(SystemExit):
            construct_training_parameters(["--mesh_shape", bad])
