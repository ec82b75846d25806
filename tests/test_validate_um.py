"""Unimodal validation path: AE-encoder embeddings -> classifier ->
accuracy + GDV, completing the reference's MM-vs-UM comparison
(reference validate.py um_*.log runs; train.py:98-111 encoder load)."""

import numpy as np

from mimm_tpu.config import TrainingConfig
from mimm_tpu.parallel import mesh as mesh_lib


class FakeImageDataset:
    def __init__(self, n=8, size=64):
        self.n = n
        rng = np.random.default_rng(0)
        self.imgs = rng.random((n, size, size, 1)).astype(np.float32)

    def __len__(self):
        return self.n

    def load(self, idx, rng, train=True):
        return {"image": self.imgs[idx]}


class FakeDiseaseDataset(FakeImageDataset):
    def load(self, idx, rng, train=True):
        s = super().load(idx, rng, train)
        s["label"] = np.float32(idx % 2)
        return s


def test_validate_unimodal_chain(tmp_path):
    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.train.ae import build_ae_model, train_auto_encoder
    from mimm_tpu.train.classifier import (ClassifierModelManager,
                                           make_embedding_fn)
    from mimm_tpu.validate import find_ae_checkpoint, validate_UniModal

    cfg = TrainingConfig().replace(
        save_directory=str(tmp_path / "um"), batch_size=4, seed=0,
        img_size=64, compute_dtype="float32", num_train_epochs=1,
        init_lr=1e-3, prefetch=1, disease_label="Pneumonia")

    train_auto_encoder(cfg, dataset=FakeImageDataset(n=8, size=64),
                       num_epochs=1, mesh=mesh_lib.make_mesh({"data": 2}))

    ae_path = find_ae_checkpoint(cfg.save_directory)
    assert ae_path.endswith("autoencoder_path_1.bin")
    ae = build_ae_model(cfg)
    ae_vars = ckpt.ae_variables_from_state_dict(
        ckpt.load_state_dict_bin(ae_path))
    embed = make_embedding_fn("unimodal", ae, ae_vars)

    dds = FakeDiseaseDataset(n=12, size=64)
    mgr = ClassifierModelManager(cfg, embed, [16], dataset=dds,
                                 val_fraction=0.25)
    mgr.train(num_epochs=1)

    acc, gdv = validate_UniModal(cfg, [16], cfg.disease_label, dataset=dds)
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(gdv)

    # data-parallel validation over a 4-chip mesh: identical report
    # (12 samples / batch 4 -> two sharded batches + the drop_last=False
    # remainder handling)
    acc4, gdv4 = validate_UniModal(cfg, [16], cfg.disease_label, dataset=dds,
                                   mesh=mesh_lib.make_mesh({"data": 4}))
    assert acc4 == acc
    np.testing.assert_allclose(gdv4, gdv, rtol=1e-6, atol=1e-9)

    # extended report (beyond reference parity): same accuracy/GDV plus
    # AUC/precision/recall/F1 and consistent confusion counts
    rep = validate_UniModal(cfg, [16], cfg.disease_label, dataset=dds,
                            extended=True)
    assert rep["accuracy"] == acc and rep["separability"] == gdv
    assert rep["tp"] + rep["tn"] + rep["fp"] + rep["fn"] == len(dds)
    assert rep["positives"] == 6 and rep["negatives"] == 6
    assert np.isfinite(rep["auc"])
