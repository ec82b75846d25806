"""Extended binary-classification metrics vs the sklearn oracle.

The reference reports only thresholded accuracy + GDV (validate.py:143);
metrics.roc_auc / binary_classification_report extend that.  sklearn is a
test-time oracle only (the runtime implementation is pure numpy).
"""

import numpy as np
import pytest

from mimm_tpu.metrics import binary_classification_report, roc_auc

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.mark.parametrize("seed,n,ties", [(0, 64, False), (1, 257, False),
                                         (2, 128, True)])
def test_roc_auc_matches_sklearn(seed, n, ties):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    scores = rng.random(n)
    if ties:  # quantize to force midrank handling
        scores = np.round(scores * 8) / 8
    want = sklearn_metrics.roc_auc_score(labels, scores)
    np.testing.assert_allclose(roc_auc(labels, scores), want, rtol=1e-12)


def test_roc_auc_degenerate_single_class():
    assert np.isnan(roc_auc(np.ones(5), np.random.default_rng(0).random(5)))
    assert np.isnan(roc_auc(np.zeros(5), np.random.default_rng(0).random(5)))


def test_report_matches_sklearn():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, 200)
    probs = rng.random(200)
    rep = binary_classification_report(labels, probs)
    pred = (probs >= 0.5).astype(int)
    np.testing.assert_allclose(
        rep["accuracy"], sklearn_metrics.accuracy_score(labels, pred))
    np.testing.assert_allclose(
        rep["precision"], sklearn_metrics.precision_score(labels, pred))
    np.testing.assert_allclose(
        rep["recall"], sklearn_metrics.recall_score(labels, pred))
    np.testing.assert_allclose(
        rep["f1"], sklearn_metrics.f1_score(labels, pred))
    np.testing.assert_allclose(
        rep["auc"], sklearn_metrics.roc_auc_score(labels, probs), rtol=1e-12)
    tn, fp, fn, tp = sklearn_metrics.confusion_matrix(labels, pred).ravel()
    assert (rep["tp"], rep["tn"], rep["fp"], rep["fn"]) == (tp, tn, fp, fn)


def test_report_reference_accuracy_semantics():
    """accuracy == the reference's mean(round(sigmoid) == label) at 0.5."""
    labels = np.array([1, 0, 1, 0])
    probs = np.array([0.9, 0.2, 0.4, 0.6])
    rep = binary_classification_report(labels, probs)
    assert rep["accuracy"] == np.mean(np.round(probs) == labels)


def test_report_degenerate_denominators_are_nan():
    # classifier never predicts positive -> precision undefined (NaN, not 0)
    # but F1 follows sklearn: 0 when tp=0 with a non-empty denominator
    rep = binary_classification_report(np.array([1, 1, 0]),
                                       np.array([0.1, 0.2, 0.3]))
    assert np.isnan(rep["precision"]) and rep["recall"] == 0.0
    assert rep["f1"] == 0.0
    # a 0.5-sigmoid (dead head) scores NEGATIVE, like the reference's round
    rep_half = binary_classification_report(np.array([1, 0]),
                                            np.array([0.5, 0.5]))
    assert (rep_half["tp"], rep_half["tn"]) == (0, 1)
    # empty input: everything NaN / zero counts
    rep = binary_classification_report(np.zeros(0), np.zeros(0))
    assert np.isnan(rep["accuracy"]) and np.isnan(rep["auc"])
    assert rep["tp"] == rep["fp"] == 0
