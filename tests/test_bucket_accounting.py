"""Bucketed step accounting: per-bucket remainders mean the true number of
batches per epoch is less than ``len(dataset) // batch_size`` — resume epoch
derivation and the warmup schedule's t_total must use the true count
(VERDICT r1 weak #3; reference counterpart: train/mi.py:91,289 call sites)."""

import os

import numpy as np

from mimm_tpu.config import TrainingConfig
from mimm_tpu.data.pipeline import Loader
from mimm_tpu.parallel import mesh as mesh_lib


class BucketedPairedDataset:
    """16 samples: 10 short reports (<=8 tokens), 6 long (16 tokens).
    With batch 4 and buckets (8, 16): 2 + 1 = 3 true batches/epoch, while
    len(dataset)//batch == 4 — the exact mismatch that skewed round-1
    resume accounting."""

    def __init__(self, n=16, img=128, seq=16, vocab=64):
        rng = np.random.default_rng(1)
        self.imgs = rng.random((n, img, img, 1)).astype(np.float32)
        self.ids = rng.integers(0, vocab, size=(n, seq)).astype(np.int32)
        self.n = n
        self.seq = seq
        self.lengths = [8 if i < 10 else 16 for i in range(n)]

    def __len__(self):
        return self.n

    def token_length(self, idx):
        return self.lengths[idx]

    def load(self, idx, rng, train=True):
        return {
            "image": self.imgs[idx],
            "txt_ids": self.ids[idx],
            "txt_masks": np.ones(self.seq, np.int32),
            "txt_segments": np.zeros(self.seq, np.int32),
            "study_id": np.int64(50000 + idx),
        }


def test_batches_per_epoch_matches_yielded_batches():
    ds = BucketedPairedDataset(img=2)  # host-only: keep arrays tiny
    loader = Loader(ds, batch_size=4, seed=0, bucket_lengths=[8, 16])
    assert len(loader) == 4  # the naive (wrong-under-bucketing) count
    assert loader.batches_per_epoch() == 3
    for epoch in range(2):
        got = sum(1 for _ in loader.epoch(epoch))
        assert got == 3, f"epoch {epoch} yielded {got} batches"


def test_batches_per_epoch_without_buckets_is_len():
    ds = BucketedPairedDataset(img=2)
    loader = Loader(ds, batch_size=4, seed=0)
    assert loader.batches_per_epoch() == len(loader) == 4


def test_bucketed_resume_lands_on_full_run(tmp_path):
    """Resume from a bucketed epoch-1 checkpoint derives the right epoch
    (step 3 // 3 = 1, not 3 // 4 = 0) and lands on the uninterrupted run."""
    import jax
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.train.mi import MultiModalManager

    cfg = TrainingConfig().replace(
        save_directory=str(tmp_path / "save"), batch_size=4, seed=0,
        img_size=128, max_seq_length=16, compute_dtype="float32",
        num_train_epochs=2, init_lr=1e-3, prefetch=1,
        use_pallas_critic=False, flash_attention=False,
        seq_buckets=(8, 16))
    tiny_bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=64,
                           max_position_embeddings=32, num_classes=1)
    ds = BucketedPairedDataset(n=16, img=128, seq=16)
    mesh = mesh_lib.make_mesh({"data": 2})

    mgr = MultiModalManager(cfg, bert_config=tiny_bert,
                            load_pretrained_bert=False)
    s_full = mgr.train(token_features=None, dataset=ds, num_epochs=2,
                       mesh=mesh, export_torch_bins=False)
    assert int(s_full.step) == 6  # 3 true batches/epoch, not 4

    mgr2 = MultiModalManager(cfg, bert_config=tiny_bert,
                             load_pretrained_bert=False)
    s_res = mgr2.train(
        token_features=None, dataset=ds, num_epochs=2, mesh=mesh,
        export_torch_bins=False,
        resume_from=os.path.join(cfg.save_directory, "mi_epoch1.ckpt"))
    assert int(s_res.step) == 6
    a = jax.device_get(s_full.critic_params[0]["w"])
    b = jax.device_get(s_res.critic_params[0]["w"])
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
