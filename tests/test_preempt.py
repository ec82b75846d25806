"""Preemption-safe checkpointing (mimm_tpu.preempt) + mid-epoch resume.

The reference has no preemption story (SURVEY.md §5 "Failure detection:
none").  Proofs here: the SIGTERM handler sets the flag without killing
the process; Loader.epoch(start_batch=k) reproduces exactly batches k:
of the same epoch stream (plain and bucketed); and a preempted-then-
resumed MI/AE run lands on the same state as an uninterrupted one.
"""

import os
import signal

import jax
import numpy as np
import pytest

from mimm_tpu import preempt
from mimm_tpu.config import TrainingConfig
from mimm_tpu.data.pipeline import Loader

from tests.test_train import (FakeDiseaseDataset, FakeImageDataset,
                              FakePairedDataset, small_mesh)


@pytest.fixture(autouse=True)
def _clean_flag():
    preempt.clear()
    yield
    preempt.clear()
    preempt.uninstall()


def test_sigterm_sets_flag_and_process_survives():
    assert not preempt.requested()
    preempt.install()
    preempt.install()  # idempotent
    os.kill(os.getpid(), signal.SIGTERM)
    assert preempt.requested()
    assert preempt.should_stop()            # plain read
    assert preempt.should_stop(sync=True)   # single-process collective path
    preempt.clear()
    assert not preempt.should_stop(sync=True)


class BucketedPairedDataset(FakePairedDataset):
    """token_length metadata so the Loader can bucket without decoding."""

    def token_length(self, idx):
        return 8 if idx % 2 == 0 else 16


def _materialize(batches):
    return [{k: np.asarray(v) for k, v in b.items()} for b in batches]


@pytest.mark.parametrize("buckets", [None, [8, 16]])
def test_loader_start_batch_yields_suffix(buckets):
    ds = BucketedPairedDataset(n=16, img=8, seq=16)
    loader = Loader(ds, batch_size=4, seed=3, bucket_lengths=buckets)
    full = _materialize(loader.epoch(0))
    assert len(full) == 4
    for k in range(len(full) + 1):
        part = _materialize(loader.epoch(0, start_batch=k))
        assert len(part) == len(full) - k
        for a, b in zip(full[k:], part):
            assert a.keys() == b.keys()
            for key in a:
                np.testing.assert_array_equal(a[key], b[key])


def test_loader_start_batch_rejects_negative():
    ds = FakePairedDataset(n=8, img=8, seq=16)
    loader = Loader(ds, batch_size=4)
    with pytest.raises(ValueError):
        next(iter(loader.epoch(0, start_batch=-1)))


@pytest.fixture
def cfg(tmp_path):
    return TrainingConfig().replace(
        save_directory=str(tmp_path / "save"), batch_size=4, seed=0,
        img_size=64, compute_dtype="float32", num_train_epochs=1,
        init_lr=1e-3, prefetch=1)


def _stop_after(monkeypatch, n_steps):
    calls = {"n": 0}

    def fake_should_stop(sync=False):
        calls["n"] += 1
        return calls["n"] >= n_steps

    monkeypatch.setattr(preempt, "should_stop", fake_should_stop)
    return calls


def test_ae_preempt_then_resume_matches_uninterrupted(cfg, monkeypatch):
    from mimm_tpu.train.ae import train_auto_encoder

    ds = FakeImageDataset(n=12, size=64)  # 3 steps/epoch at batch 4

    # A: uninterrupted single epoch
    cfg_a = cfg.replace(save_directory=cfg.save_directory + "_a")
    s_full = train_auto_encoder(cfg_a, dataset=ds, num_epochs=1,
                                mesh=small_mesh(), export_torch_bins=False)

    # B: preempted after step 1 -> saves ae_preempt.ckpt and stops
    calls = _stop_after(monkeypatch, 1)
    s_part = train_auto_encoder(cfg, dataset=ds, num_epochs=1,
                                mesh=small_mesh(), export_torch_bins=False)
    assert int(s_part.step) == 1
    ck = os.path.join(cfg.save_directory, "ae_preempt.ckpt")
    assert os.path.exists(ck)

    # C: resume mid-epoch -> consumes exactly the remaining 2 batches
    monkeypatch.setattr(preempt, "should_stop", lambda sync=False: False)
    s_res = train_auto_encoder(cfg, dataset=ds, num_epochs=1,
                               mesh=small_mesh(), export_torch_bins=False,
                               resume_from=ck)
    assert calls["n"] == 1
    assert int(s_res.step) == int(s_full.step) == 3
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s_res.params["fc1"]["kernel"])),
        np.asarray(jax.device_get(s_full.params["fc1"]["kernel"])),
        rtol=1e-6, atol=1e-7)


def test_classifier_preempt_then_resume_matches_uninterrupted(cfg,
                                                              monkeypatch):
    import jax.numpy as jnp
    from mimm_tpu.train.ae import build_ae_model
    from mimm_tpu.train.classifier import (ClassifierModelManager,
                                           make_embedding_fn)

    cfg = cfg.replace(num_train_epochs_classifier=2,
                      disease_label="Pneumonia")
    ae = build_ae_model(cfg)
    variables = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
                        train=False)
    embed = make_embedding_fn("unimodal", ae, variables)
    ds = FakeDiseaseDataset(n=16, size=64)  # 12 train / batch 4 = 3 steps

    cfg_a = cfg.replace(save_directory=cfg.save_directory + "_a")
    mgr_a = ClassifierModelManager(cfg_a, embed, [32, 16], dataset=ds,
                                   val_fraction=0.25)
    s_full, acc_full, _ = mgr_a.train(num_epochs=2)

    _stop_after(monkeypatch, 2)
    mgr_b = ClassifierModelManager(cfg, embed, [32, 16], dataset=ds,
                                   val_fraction=0.25)
    s_part, _, _ = mgr_b.train(num_epochs=2)
    assert int(s_part.step) == 2
    ck = os.path.join(cfg.save_directory,
                      "classifier_Pneumonia_preempt.ckpt")
    assert os.path.exists(ck) and os.path.exists(ck + ".json")

    monkeypatch.setattr(preempt, "should_stop", lambda sync=False: False)
    mgr_c = ClassifierModelManager(cfg, embed, [32, 16], dataset=ds,
                                   val_fraction=0.25)
    s_res, acc_res, best_res = mgr_c.train(num_epochs=2, resume_from=ck)
    assert int(s_res.step) == int(s_full.step) == 6
    assert acc_res == acc_full
    assert best_res is not None
    flat_a = jax.tree_util.tree_leaves(jax.device_get(s_full.params))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(s_res.params))
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-6, atol=1e-7)


def test_mi_preempt_then_resume_matches_uninterrupted(cfg, monkeypatch):
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.train.mi import MultiModalManager

    cfg = cfg.replace(img_size=256, max_seq_length=16)
    tiny_bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=64,
                           max_position_embeddings=32, num_classes=1)
    ds = FakePairedDataset(n=16, img=256, seq=16)  # 4 steps/epoch

    cfg_a = cfg.replace(save_directory=cfg.save_directory + "_a")
    mgr_a = MultiModalManager(cfg_a, bert_config=tiny_bert,
                              load_pretrained_bert=False)
    s_full = mgr_a.train(token_features=None, dataset=ds, num_epochs=1,
                         mesh=small_mesh(), export_torch_bins=False)

    _stop_after(monkeypatch, 2)
    mgr_b = MultiModalManager(cfg, bert_config=tiny_bert,
                              load_pretrained_bert=False)
    s_part = mgr_b.train(token_features=None, dataset=ds, num_epochs=1,
                         mesh=small_mesh(), export_torch_bins=False)
    assert int(s_part.step) == 2
    ck = os.path.join(cfg.save_directory, "mi_preempt.ckpt")
    assert os.path.exists(ck)
    # the preemption is recorded in the metrics stream
    import json
    recs = [json.loads(l) for l in
            open(os.path.join(cfg.save_directory, "mi.jsonl"))]
    assert any(r.get("preempted") == 1 for r in recs)

    monkeypatch.setattr(preempt, "should_stop", lambda sync=False: False)
    mgr_c = MultiModalManager(cfg, bert_config=tiny_bert,
                              load_pretrained_bert=False)
    s_res = mgr_c.train(token_features=None, dataset=ds, num_epochs=1,
                        mesh=small_mesh(), export_torch_bins=False,
                        resume_from=ck)
    assert int(s_res.step) == int(s_full.step) == 4
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s_res.critic_params[0]["w"])),
        np.asarray(jax.device_get(s_full.critic_params[0]["w"])),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(
            s_res.params["image_model"]["conv1"]["kernel"])),
        np.asarray(jax.device_get(
            s_full.params["image_model"]["conv1"]["kernel"])),
        rtol=1e-6, atol=1e-7)


def test_resolve_resume_contract(tmp_path):
    """One helper owns the --resume_from 'auto' contract for every CLI."""
    from mimm_tpu import preempt
    from mimm_tpu.config import TrainingConfig

    cfg = TrainingConfig().replace(save_directory=str(tmp_path))
    assert preempt.resolve_resume(cfg, "mi_preempt.ckpt") is None
    cfg_auto = cfg.replace(resume_from="auto")
    assert preempt.resolve_resume(cfg_auto, "mi_preempt.ckpt") is None
    ckpt = tmp_path / "mi_preempt.ckpt"
    ckpt.write_bytes(b"x")
    assert preempt.resolve_resume(cfg_auto, "mi_preempt.ckpt") == str(ckpt)
    cfg_path = cfg.replace(resume_from="/some/explicit.ckpt")
    assert preempt.resolve_resume(cfg_path, "mi_preempt.ckpt") == \
        "/some/explicit.ckpt"
