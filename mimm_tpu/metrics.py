"""Metrics, logging, and plots.

Reference parity:
* ``Plot_Training`` — multi-series matplotlib PNG (utils.py:29-40).
* ``gdv_calculation`` — the "generalised discrimination value" embedding
  separability metric (validate.py:16-49): z-score each class, mean
  intra-class and inter-class pairwise euclidean distances combined with a
  1/sqrt(N) dimension-invariance factor.  Note the reference divides by
  ``total_items * (total_items - 1)`` where ``total_items`` counts *scalar
  elements* (N*D), not rows — we reproduce that exactly, since the
  committed GDV baselines (~1e-6, BASELINE.md) depend on it.
* ``MetricWriter`` — structured per-step/epoch scalars to JSONL plus a
  reference-format ``.log`` file (``Epoch N loss = ...`` lines diffable
  against ``save_dir/*/training_MI.log``).
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from typing import Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Plots (reference utils.py:29-40)
# ---------------------------------------------------------------------------

def Plot_Training(xlabel: str, ylabel: str, title: str,
                  data: Sequence[Sequence[float]],
                  dataLabel: Sequence[str], out_image_file: str) -> None:
    """Write a multi-series training-curve PNG.

    Same call contract as the reference plot helper (utils.py:29-40) so the
    entry points produce the same artifacts, but drawn on an explicit
    Figure/Axes pair — no global pyplot state leaks between the sweep
    loops' many plot calls.  Multi-host: process 0 draws; the other
    processes share the output path and would race on the file.
    """
    try:
        import jax
        if jax.process_index() != 0:
            return
    except Exception:
        pass
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.figure import Figure

    fig = Figure(figsize=(8.0, 5.0))
    ax = fig.subplots()
    for series, label in zip(data, dataLabel):
        ax.plot(list(series), label=str(label))
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    if len(dataLabel):
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_image_file)


def PrintModel(params, logger: Optional[logging.Logger] = None,
               print_values: bool = True) -> int:
    """Dump every parameter (path, shape, dtype, and by default the values)
    — the reference's ``PrintModel`` weight dump (utils.py:21-26), which
    prints each named tensor of the model.  Accepts any pytree of arrays
    (flax params, a flat state_dict, optimizer moments...).  Returns the
    total parameter count."""
    import jax

    log = (logger or logging.getLogger("mimm_tpu.model")).info
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        arr = np.asarray(leaf)
        total += int(arr.size)
        if print_values:
            log("%s %s %s\n%s", name, arr.shape, arr.dtype, arr)
        else:
            log("%s %s %s", name, arr.shape, arr.dtype)
    log("total parameters: %d", total)
    return total


def Plot_Training_From_Logfile(log_file: str, out_image_file: Optional[str] = None):
    """Parse reference-format training logs ('Epoch N loss = X' lines) and
    plot the loss curve (completes the stub at reference utils.py:42-44).
    Returns the parsed losses."""
    import re

    losses = []
    pat = re.compile(r"Epoch (\d+) loss = (-?[0-9.]+)")
    with open(log_file) as f:
        for line in f:
            m = pat.search(line)
            if m:
                losses.append((int(m.group(1)), float(m.group(2))))
    losses.sort()
    series = [v for _, v in losses]
    if out_image_file and series:
        Plot_Training("Epochs", "Value for Loss",
                      os.path.basename(log_file), [series], ["train loss"],
                      out_image_file)
    return series


# ---------------------------------------------------------------------------
# GDV separability (reference validate.py:16-49)
# ---------------------------------------------------------------------------

def z_scored_transform(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    std = np.where(std == 0.0, 1.0, std)
    return (x - mean) / std


def _pairwise_euclidean(a: np.ndarray, b: Optional[np.ndarray] = None) -> np.ndarray:
    b = a if b is None else b
    aa = (a * a).sum(1)[:, None]
    bb = (b * b).sum(1)[None, :]
    d2 = np.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)
    return np.sqrt(d2)


def mean_intra_class_distance(items: np.ndarray) -> float:
    d = _pairwise_euclidean(items)
    total_items = items.shape[0] * items.shape[1]  # reference: element count
    return float(d.sum() * 2 / (total_items * (total_items - 1)))


def mean_inter_class_distance(source: np.ndarray, dest: np.ndarray) -> float:
    d = _pairwise_euclidean(source, dest)
    ts = source.shape[0] * source.shape[1]
    td = dest.shape[0] * dest.shape[1]
    return float(d.sum() / (ts * td))


def gdv_calculation(positive_embeddings, negative_embeddings) -> float:
    """Generalised discrimination value (reference validate.py:37-49)."""
    pos = z_scored_transform(np.asarray(positive_embeddings))
    neg = z_scored_transform(np.asarray(negative_embeddings))
    pos_intra = mean_intra_class_distance(pos)
    neg_intra = mean_intra_class_distance(neg)
    inter = mean_inter_class_distance(pos, neg)
    dim_inv = 1.0 / math.sqrt(len(pos) + len(neg))
    return dim_inv * ((pos_intra + neg_intra) / 2.0 - inter)


# ---------------------------------------------------------------------------
# Extended binary-classification metrics (beyond reference parity)
# ---------------------------------------------------------------------------

def roc_auc(labels, scores) -> float:
    """Area under the ROC curve via the rank statistic (Mann–Whitney U),
    ties resolved with midranks — equivalent to sklearn.roc_auc_score
    (oracle-tested) without the dependency at runtime.  Returns NaN when
    only one class is present (AUC undefined).  No reference counterpart:
    the reference reports only thresholded accuracy (validate.py:143)."""
    labels = np.asarray(labels).astype(bool).ravel()
    scores = np.asarray(scores, np.float64).ravel()
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(scores.size, np.float64)
    ranks[order] = np.arange(1, scores.size + 1)
    # midranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < sorted_scores.size:
        j = i
        while j + 1 < sorted_scores.size and \
                sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    u = ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def binary_classification_report(labels, probs, threshold: float = 0.5) -> dict:
    """Accuracy / AUC-ROC / precision / recall / F1 / confusion counts for a
    binary sigmoid classifier.  ``accuracy`` reproduces the reference's
    mean(round(prob) == label) (validate.py:143) at threshold 0.5; the rest
    extend it (precision/recall/F1 use the STANDARD definitions — the
    reference's per-epoch tallies swap fp/fn, main_utils.py:504-505, a
    quirk we do not reproduce).  Undefined ratios (empty denominators)
    are reported as NaN, not 0, so degenerate splits are visible."""
    labels = np.asarray(labels, np.float64).ravel()
    probs = np.asarray(probs, np.float64).ravel()
    # at the default 0.5 threshold, reproduce the reference's np.round
    # thresholding EXACTLY (half-to-even: a dead sigmoid at exactly 0.5
    # scores negative, validate.py:143); custom thresholds use >=
    pred = np.round(probs) if threshold == 0.5 \
        else (probs >= threshold).astype(np.float64)
    tp = float(((pred == 1) & (labels == 1)).sum())
    tn = float(((pred == 0) & (labels == 0)).sum())
    fp = float(((pred == 1) & (labels == 0)).sum())
    fn = float(((pred == 0) & (labels == 1)).sum())
    total = labels.size

    def _ratio(num, den):
        return float(num / den) if den > 0 else float("nan")

    precision = _ratio(tp, tp + fp)
    recall = _ratio(tp, tp + fn)
    # sklearn-equivalent form: 0 (not NaN) for an all-wrong classifier
    # (tp=0 with fp+fn>0); NaN only when the whole denominator is empty
    f1 = _ratio(2 * tp, 2 * tp + fp + fn)
    return {
        "accuracy": _ratio(tp + tn, total),
        "auc": roc_auc(labels, probs),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": int(tp), "tn": int(tn), "fp": int(fp), "fn": int(fn),
        "positives": int(labels.sum()),
        "negatives": int(total - labels.sum()),
    }


# ---------------------------------------------------------------------------
# Structured metric writer
# ---------------------------------------------------------------------------

def configure_run_logging(filename: str) -> None:
    """Point the ROOT logger's file output at this run's log file.

    ``logging.basicConfig`` is a no-op once any handler exists, so sweep
    drivers calling it per run would append every later run's records
    into the FIRST run's file.  This helper removes previously attached
    root FileHandlers and installs a fresh one (reference log format,
    ``filemode='w'`` semantics preserved)."""
    root = logging.getLogger()
    for h in list(root.handlers):
        if isinstance(h, logging.FileHandler):
            root.removeHandler(h)
            h.close()
    handler = logging.FileHandler(filename, mode="w")
    handler.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s %(message)s", datefmt="%m-%d %H:%M"))
    root.addHandler(handler)
    root.setLevel(logging.INFO)


class MetricWriter:
    """Writes scalars to <save_dir>/<name>.jsonl and mirrors epoch summaries
    into a reference-format python logger (log-file diffable vs the
    reference's committed trajectories).  ``tensorboard=True`` additionally
    emits every numeric scalar as a TensorBoard event under
    <save_dir>/tb/<name>/ (mimm_tpu.tbevents — dependency-free tfevents
    encoding; SURVEY.md §5's 'JSONL + optional TensorBoard')."""

    def __init__(self, save_directory: str, name: str = "metrics",
                 log_filename: Optional[str] = None,
                 tensorboard: bool = False):
        os.makedirs(save_directory, exist_ok=True)
        self.save_directory = save_directory
        self.jsonl_path = os.path.join(save_directory, f"{name}.jsonl")
        # multi-host: only process 0 writes metrics/log files — every
        # process shares save_directory, and N writers would duplicate
        # every record N times (checkpoints are separate: orbax saves are
        # collective and .bin export is already gated)
        self._primary = True
        try:
            import jax
            self._primary = jax.process_index() == 0
        except Exception:
            pass
        self._fh = open(self.jsonl_path, "a") if self._primary else None
        self._tb = None
        if tensorboard and self._primary:
            from mimm_tpu.tbevents import TBEventWriter
            self._tb = TBEventWriter(os.path.join(save_directory, "tb", name))
        self._tb_step = 0  # fallback ordinal when a record carries no step
        self.logger = logging.getLogger(f"mimm_tpu.{name}")
        self._handler = None
        if log_filename is not None and self._primary:
            self._handler = logging.FileHandler(
                os.path.join(save_directory, log_filename))
            self._handler.setFormatter(logging.Formatter(
                "%(asctime)s - %(name)s %(message)s", datefmt="%m-%d %H:%M"))
            self.logger.addHandler(self._handler)
            self.logger.setLevel(logging.INFO)

    def write(self, step: Optional[int] = None, **scalars) -> None:
        if self._fh is None:
            return
        rec = {"time": time.time()}
        if step is not None:
            rec["step"] = step
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            # epoch-level records (epoch_summary) carry their ordinal as an
            # 'epoch' scalar rather than the step argument
            tb_step = step if step is not None else \
                int(rec.get("epoch", self._tb_step))
            self._tb_step = tb_step + 1
            for k, v in rec.items():
                # 'epoch' is the record's step ordinal, not a metric — a
                # mirrored y=x 'epoch' chart would just clutter the dashboard
                if k not in ("time", "step", "epoch") and \
                        isinstance(v, (int, float)):
                    self._tb.scalar(k, v, tb_step, wall_time=rec["time"])
            self._tb.flush()

    def epoch_summary(self, epoch: int, loss: float, seconds: float,
                      checkpoint_path: Optional[str] = None) -> None:
        """Reference log-line format (main_utils.py:251-253)."""
        self.logger.info(f"  Epoch {epoch} loss = {loss:.5f}")
        self.logger.info(f"  Epoch {epoch} took {seconds:.3f} s")
        if checkpoint_path:
            self.logger.info(f"  Epoch {epoch} checkpoint saved in {checkpoint_path}")
        self.write(epoch=epoch, epoch_loss=loss, epoch_seconds=seconds)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()
        if self._handler is not None:
            # detach: a second run in the same process would otherwise log
            # every line into BOTH files, N times after N runs
            self.logger.removeHandler(self._handler)
            self._handler.close()
            self._handler = None
