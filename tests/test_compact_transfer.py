"""Compact host->device transfer (cfg.compact_transfer): the loader ships
un-normalized integer crops + narrow token dtypes and the jitted step
widens/normalizes on device with identical math (ops/image_norm.py).

Exactness claim under test: for uint8/uint16 sources every pixel value is
exactly representable in float32, the per-image max is computed over the
same values, and the division is the same f32 op — so raw-then-device
must equal the host-normalized float path BITWISE."""

import csv

import jax
import numpy as np
import pytest

from mimm_tpu.data import transforms
from mimm_tpu.ops.image_norm import decompact_batch, device_normalize


def _dev_norm_np(x):
    return np.asarray(device_normalize(jax.numpy.asarray(x)))


@pytest.mark.parametrize("dtype,hi", [(np.uint8, 255), (np.uint16, 60000)])
def test_raw_affine_plus_device_normalize_is_bitwise_exact(dtype, hi):
    rng = np.random.default_rng(0)
    img = rng.integers(0, hi, size=(300, 280)).astype(dtype)
    from mimm_tpu.data import native_ops
    if dtype == np.uint16 and native_ops.get_lib() is None:
        pytest.skip("uint16>int16 exactness needs the native host lib")
    for seed in range(3):
        srng = np.random.default_rng(seed)
        srng2 = np.random.default_rng(seed)
        ref = transforms.reference_transform(img, srng, 64, train=True)
        raw = transforms.reference_transform(img, srng2, 64, train=True,
                                             raw=True)
        assert raw.dtype == dtype
        got = _dev_norm_np(raw[None, ..., None])[0, ..., 0]
        np.testing.assert_array_equal(got, ref)


def test_raw_center_crop_eval_path_exact():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(90, 100)).astype(np.uint8)
    ref = transforms.reference_transform(img, None, 64, train=False)
    raw = transforms.reference_transform(img, None, 64, train=False, raw=True)
    np.testing.assert_array_equal(_dev_norm_np(raw[None, ..., None])[0, ..., 0],
                                  ref)
    # pad-up path (image smaller than crop) goes through the numpy fallback
    small = rng.integers(0, 255, size=(20, 24)).astype(np.uint8)
    ref_s = transforms.reference_transform(small, None, 32, train=False)
    raw_s = transforms.reference_transform(small, None, 32, train=False,
                                           raw=True)
    np.testing.assert_array_equal(
        _dev_norm_np(raw_s[None, ..., None])[0, ..., 0], ref_s)


def test_decompact_batch_widens_tokens_and_keeps_study_id():
    b = {
        "image": jax.numpy.asarray(
            np.arange(2 * 4 * 4, dtype=np.uint16).reshape(2, 4, 4, 1)),
        "txt_ids": jax.numpy.asarray(np.array([[1, 2]], np.uint16)),
        "txt_masks": jax.numpy.asarray(np.array([[1, 0]], np.uint8)),
        "txt_segments": jax.numpy.asarray(np.array([[0, 0]], np.uint8)),
        "study_id": jax.numpy.asarray(np.array([7], np.int64)),
    }
    out = decompact_batch(b)
    assert out["image"].dtype == jax.numpy.float32
    assert out["txt_ids"].dtype == jax.numpy.int32
    assert out["txt_masks"].dtype == jax.numpy.int32
    assert out["txt_segments"].dtype == jax.numpy.int32
    # x64 is off in JAX: int64 inputs land as int32 (the step's working
    # dtype; MIMIC study ids fit, hashed ids are masked to the same range
    # on both paths)
    assert out["study_id"].dtype in (jax.numpy.int32, jax.numpy.int64)
    # per-image normalization: each image divided by ITS own max
    img = np.asarray(out["image"])
    np.testing.assert_allclose(img[0].max(), 1.0)
    np.testing.assert_allclose(img[1].max(), 1.0)
    # stacked (K, B, H, W, C) scan chunks normalize per trailing image too
    stacked = jax.numpy.asarray(
        np.arange(2 * 2 * 4 * 4, dtype=np.uint16).reshape(2, 2, 4, 4, 1))
    s = np.asarray(device_normalize(stacked))
    assert s.max() == pytest.approx(1.0)
    assert s[0, 0].max() == pytest.approx(1.0)


def _mini_paired(tmp_path, n=4, seq=8):
    import cv2

    from mimm_tpu.data.features import TokenFeatureSet
    from mimm_tpu.data.pipeline import CXRImageReportDataset

    img_dir = tmp_path / "images"
    (img_dir / "p99").mkdir(parents=True)
    rows = [["mimic_id"]]
    rng = np.random.default_rng(0)
    sids = []
    for i in range(n):
        rel = f"p99/p990{i}_s50{i}_d{i}.jpg"
        cv2.imwrite(str(img_dir / rel),
                    rng.integers(0, 255, size=(80, 70)).astype(np.uint8))
        rows.append([rel])
        sids.append(f"50{i}")
    meta = tmp_path / "meta.csv"
    with open(meta, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    ids = rng.integers(1, 60, (n, seq))
    feats = TokenFeatureSet(report_ids=np.array(sids), input_ids=ids,
                            input_mask=np.ones((n, seq)),
                            segment_ids=np.zeros((n, seq)),
                            label_ids=np.zeros(n))

    def make(compact):
        return CXRImageReportDataset(feats, str(img_dir), str(meta),
                                     img_size=32, compact=compact)

    return make


def test_paired_dataset_compact_equals_float(tmp_path):
    make = _mini_paired(tmp_path)
    ds_f, ds_c = make(False), make(True)
    for i in range(len(ds_f)):
        rng_f = np.random.default_rng((0, 0, i))
        rng_c = np.random.default_rng((0, 0, i))
        a = ds_f.load(i, rng_f, train=True)
        b = ds_c.load(i, rng_c, train=True)
        assert b["image"].dtype == np.uint8
        assert b["txt_ids"].dtype == np.uint16
        assert b["txt_masks"].dtype == np.uint8
        np.testing.assert_array_equal(
            _dev_norm_np(b["image"][None])[0], a["image"])
        np.testing.assert_array_equal(b["txt_ids"].astype(np.int32),
                                      a["txt_ids"])
        assert a["study_id"] == b["study_id"]


def test_mi_step_loss_identical_on_compact_batch():
    """One full MI train step on a compact (uint16 image + narrow token)
    batch must produce the same loss as on the equivalent float batch."""
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.train.mi import (build_joint_model, create_mi_state,
                                   make_mi_train_step, make_optimizers)

    tiny = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, num_classes=1)
    cfg = TrainingConfig().replace(
        batch_size=4, img_size=128, max_seq_length=8,
        compute_dtype="float32", use_pallas_critic=False,
        flash_attention=False, seed=0)
    model = build_joint_model(cfg, tiny)
    txs = make_optimizers(cfg, steps_per_epoch=2)
    step = make_mi_train_step(model, txs, cfg)

    rng = np.random.default_rng(0)
    raw_imgs = rng.integers(0, 4000, (4, 128, 128, 1)).astype(np.uint16)
    ids = rng.integers(0, 64, (4, 8))
    compact = {
        "image": raw_imgs,
        "txt_ids": ids.astype(np.uint16),
        "txt_masks": np.ones((4, 8), np.uint8),
        "txt_segments": np.zeros((4, 8), np.uint8),
        "study_id": np.arange(4, dtype=np.int64),
    }
    wide = {
        "image": np.asarray(_dev_norm_np(raw_imgs)),
        "txt_ids": ids.astype(np.int32),
        "txt_masks": np.ones((4, 8), np.int32),
        "txt_segments": np.zeros((4, 8), np.int32),
        "study_id": np.arange(4, dtype=np.int64),
    }
    s_a = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    _, loss_a = step(s_a, {k: jax.numpy.asarray(v) for k, v in compact.items()})
    s_b = create_mi_state(model, cfg, txs, jax.random.PRNGKey(0))
    _, loss_b = step(s_b, {k: jax.numpy.asarray(v) for k, v in wide.items()})
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
