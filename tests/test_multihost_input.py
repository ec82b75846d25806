"""Multi-host input sharding (Loader process_count/process_index +
parallel.mesh.initialize_distributed).

Design under test: every process computes the IDENTICAL global shuffle and
batch/bucket composition from (seed, epoch) index metadata, then decodes
only its batch_size/process_count slice — so concatenating the per-process
loaders' outputs must reproduce the single-process global batches exactly,
including under bucketing, and an unreadable record is substituted (zeros,
counted) rather than skip-and-refilled, which would shift one host's
subsequent batches and deadlock pod collectives."""

import numpy as np
import pytest

from mimm_tpu.data.pipeline import Loader


class PairedDS:
    def __init__(self, n=24, seq=32, bad=()):
        rng = np.random.default_rng(0)
        self.imgs = rng.integers(0, 255, (n, 16, 16, 1)).astype(np.uint8)
        self.ids = rng.integers(1, 60, (n, seq)).astype(np.int32)
        self.lengths = rng.integers(4, seq + 1, n).astype(np.int32)
        self.mask = np.zeros((n, seq), np.int32)
        for i, l in enumerate(self.lengths):
            self.mask[i, :l] = 1
        self.n = n
        self.bad = set(bad)

    def __len__(self):
        return self.n

    def token_length(self, idx):
        return int(self.lengths[idx])

    def load(self, idx, rng, train=True):
        if idx in self.bad:
            return None
        return {
            "image": self.imgs[idx],
            "txt_ids": self.ids[idx],
            "txt_masks": self.mask[idx],
            "txt_segments": np.zeros_like(self.mask[idx]),
            "study_id": np.int64(100 + idx),
        }


def collect(loader, epoch=0):
    return list(loader.epoch(epoch))


@pytest.mark.parametrize("buckets", [None, [16, 32]])
def test_process_slices_concat_to_global_batches(buckets):
    ds = PairedDS(n=24)
    kw = dict(batch_size=4, seed=3, bucket_lengths=buckets)
    global_batches = collect(Loader(ds, **kw))
    slices = [collect(Loader(ds, process_count=2, process_index=pi, **kw))
              for pi in (0, 1)]
    assert len(slices[0]) == len(slices[1]) == len(global_batches)
    for g, a, b in zip(global_batches, *slices):
        for k in g:
            np.testing.assert_array_equal(
                np.concatenate([a[k], b[k]]), g[k])


def test_unreadable_record_substituted_not_shifted():
    bad = 7
    ds_ok = PairedDS(n=16)
    ds_bad = PairedDS(n=16, bad=(bad,))
    kw = dict(batch_size=4, seed=1, process_count=2)
    for pi in (0, 1):
        ref = collect(Loader(ds_ok, process_index=pi, **kw))
        ld = Loader(ds_bad, process_index=pi, **kw)
        got = collect(ld)
        assert len(got) == len(ref)
        subs = 0
        for rb, gb in zip(ref, got):
            for i in range(rb["study_id"].shape[0]):
                if rb["study_id"][i] == 100 + bad:
                    # the bad record's slot: zeros, same shapes
                    assert gb["study_id"][i] == 0
                    assert gb["image"][i].sum() == 0
                    subs += 1
                else:  # every other slot identical — nothing shifted
                    for k in rb:
                        np.testing.assert_array_equal(gb[k][i], rb[k][i])
        assert ld.skipped == subs  # bad record lives in exactly one slice


def test_process_count_must_divide_batch():
    with pytest.raises(ValueError):
        Loader(PairedDS(8), batch_size=6, process_count=4)
    with pytest.raises(ValueError):
        Loader(PairedDS(8), batch_size=4, process_count=2, process_index=2)


def test_producer_exception_surfaces_not_hangs():
    """A dataset.load that RAISES (vs returning None) must propagate to
    the consuming thread — the single-host producer used to die silently,
    leaving the training loop blocked on the queue forever."""

    class Exploding(PairedDS):
        def load(self, idx, rng, train=True):
            if idx == 5:
                raise RuntimeError("corrupt metadata row")
            return super().load(idx, rng, train)

    for buckets in (None, [16, 32]):
        ld = Loader(Exploding(n=16), batch_size=4, seed=0,
                    bucket_lengths=buckets)
        with pytest.raises(RuntimeError, match="corrupt metadata row"):
            collect(ld)


def test_initialize_distributed_is_noop_single_process(monkeypatch):
    from mimm_tpu.parallel import mesh as mesh_lib
    monkeypatch.delenv("MIMM_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MIMM_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("MIMM_DISTRIBUTED", raising=False)
    assert mesh_lib.initialize_distributed() is False
