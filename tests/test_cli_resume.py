"""--resume_from auto resolution in the CLI entry points.

``auto`` must resolve to the stage's own preemption checkpoint —
``ae_preempt.ckpt`` / ``mi_preempt.ckpt`` / the per-disease
``classifier_<label>_preempt.ckpt`` — when (and only when) it exists,
so a sweep over several diseases never re-applies one disease's
checkpoint to the next (a fixed explicit path would).  Manager-level
resume correctness is proven in tests/test_preempt.py; these tests pin
the CLI path-resolution contract without training anything.
"""

import os

import pytest

from mimm_tpu.config import TrainingConfig


@pytest.fixture
def cfg(tmp_path):
    d = tmp_path / "save"
    d.mkdir()
    return TrainingConfig().replace(save_directory=str(d),
                                    disease_label="Pneumonia")


def test_classifier_auto_resolves_per_disease(cfg, monkeypatch):
    from cli.multi_modal import train_image_classifier
    from mimm_tpu.train import classifier as clf_mod

    captured = []

    class FakeManager:
        def __init__(self, *a, **k):
            pass

        def train(self, resume_from=None, **k):
            captured.append(resume_from)
            return None

    monkeypatch.setattr(clf_mod, "ClassifierModelManager", FakeManager)

    ck = os.path.join(cfg.save_directory, "classifier_Pneumonia_preempt.ckpt")

    # auto + no checkpoint on disk -> fresh start
    train_image_classifier(cfg.replace(resume_from="auto"), None, [8])
    # auto + checkpoint present -> the per-disease path
    open(ck, "w").close()
    train_image_classifier(cfg.replace(resume_from="auto"), None, [8])
    # auto under a different disease ignores Pneumonia's checkpoint
    train_image_classifier(
        cfg.replace(resume_from="auto", disease_label="Edema"), None, [8])
    # explicit path passes through untouched; empty string -> None
    train_image_classifier(cfg.replace(resume_from="/x/y.ckpt"), None, [8])
    train_image_classifier(cfg, None, [8])

    assert captured == [None, ck, None, "/x/y.ckpt", None]


def test_ae_auto_resolves_preempt_ckpt(cfg, monkeypatch):
    from cli import uni_modal
    from mimm_tpu import preempt
    from mimm_tpu.train import ae as ae_mod

    captured = []
    monkeypatch.setattr(
        ae_mod, "train_auto_encoder",
        lambda cfg, resume_from=None, **k: captured.append(resume_from))

    try:
        ck = os.path.join(cfg.save_directory, "ae_preempt.ckpt")
        uni_modal.train_auto_encoder(cfg.replace(resume_from="auto"))
        open(ck, "w").close()
        uni_modal.train_auto_encoder(cfg.replace(resume_from="auto"))
    finally:
        preempt.uninstall()

    assert captured == [None, ck]
