"""tools/derive_buckets.py: the production bucket mix is DERIVED from the
corpus, and bench.py's hard-coded BUCKET_MIX must equal the derivation on
the shipped fixture corpus (drift here would silently bench a different
length distribution than training sees)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_TSVS = "/root/reference/full_data_set/text/data_subfolder_*.tsv"


def test_bench_bucket_mix_matches_fixture_derivation():
    import bench
    from derive_buckets import shares_for, token_lengths

    lengths = token_lengths(REFERENCE_TSVS, max_seq_length=320, vocab=None)
    assert len(lengths) >= 100  # all shipped fixture reports
    n = len(lengths)
    # the documented approximation reproduces the measured percentiles
    assert lengths[n // 2] == 77
    assert 125 <= lengths[int(n * 0.9)] <= 140

    buckets = tuple(sorted(bench.BUCKET_MIX))
    shares = shares_for(lengths, buckets)
    for b in buckets:
        np.testing.assert_allclose(shares[b], bench.BUCKET_MIX[b], atol=5e-4)


def test_shares_partition_and_clamp():
    from derive_buckets import shares_for

    lengths = [10, 64, 65, 96, 200, 320]
    shares = shares_for(lengths, (64, 96, 320))
    assert abs(sum(shares.values()) - 1.0) < 1e-12
    assert shares[64] == 2 / 6 and shares[96] == 2 / 6 and shares[320] == 2 / 6
