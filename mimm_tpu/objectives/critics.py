"""Variational mutual-information bounds (DV / InfoNCE).

Two shapes of the same math:

* **Vector form** — drop-in parity with the reference critics
  (``mutual_info_img_txt/mi_critics.py:3-23``): a flat logits vector whose
  first ``pos_size`` entries are positive-pair scores and the rest are
  negative-pair scores.

* **Matrix form** — the TPU-native formulation: a full ``(B, B)`` score
  matrix ``S[i, j] = critic(img_i, txt_j)`` with the diagonal as positives
  and a boolean mask selecting valid negatives.  The reference builds its
  negative set with a Python double loop appending one ``torch.cat`` row at
  a time (``main_utils.py:80-110``, up to 4k kernel launches per step); the
  set it enumerates is exactly ``{(i, j) : study_id[i] != study_id[j]}`` and
  both ``mean`` and ``logsumexp`` are order-invariant, so the masked matrix
  form computes the *identical* loss in one fused XLA computation
  (verified bitwise-close in tests/test_critics.py).

Both DV and (reference-)InfoNCE reduce negatives with a single global
logsumexp; DV subtracts ``log(N_neg)``.  The reference's ``infonce`` is
*not* textbook per-anchor InfoNCE (its ``torch.mean(logsumexp)`` is a no-op
on a scalar — see mi_critics.py:21); ``infonce_per_anchor`` below provides
the textbook global-batch objective as a new capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Vector form (reference parity)
# ---------------------------------------------------------------------------

def dv_bound_loss(discriminator_logits: jax.Array, pos_size: int) -> jax.Array:
    """Donsker-Varadhan bound loss (parity: mi_critics.py:3-12).

    loss = logsumexp(neg) - log(N_neg) - mean(pos);  minimizing it maximizes
    the DV lower bound, so the training loss goes strongly negative.
    """
    logits = discriminator_logits.reshape(-1)
    pos_energy = jnp.mean(logits[:pos_size])
    neg = logits[pos_size:]
    neg_energy = jax.nn.logsumexp(neg) - jnp.log(
        jnp.asarray(neg.shape[0], jnp.result_type(float)))
    return neg_energy - pos_energy


def infonce_bound_loss(discriminator_logits: jax.Array, pos_size: int) -> jax.Array:
    """Reference 'infonce' loss (parity: mi_critics.py:14-23): DV without the
    log(N_neg) correction."""
    logits = discriminator_logits.reshape(-1)
    pos_energy = jnp.mean(logits[:pos_size])
    neg_energy = jax.nn.logsumexp(logits[pos_size:])
    return neg_energy - pos_energy


# ---------------------------------------------------------------------------
# Matrix form (TPU-native)
# ---------------------------------------------------------------------------

def negative_pair_mask(study_ids: jax.Array) -> jax.Array:
    """Boolean (B, B) mask of valid negative pairs.

    ``study_ids`` is an integer array (hashes are fine as long as equal
    studies map to equal ints).  Entry (i, j) is True iff
    ``study_ids[i] != study_ids[j]`` — this excludes the diagonal and any
    cross pair sharing a radiology report, exactly the reference's skip rule
    at main_utils.py:105.
    """
    sid = study_ids.reshape(-1)
    return sid[:, None] != sid[None, :]


def _masked_logsumexp(scores: jax.Array, mask: jax.Array):
    masked = jnp.where(mask, scores, _NEG_INF)
    return jax.nn.logsumexp(masked)


def dv_bound_from_scores(scores: jax.Array, study_ids: jax.Array) -> jax.Array:
    """DV loss from a (B, B) score matrix; equals ``dv_bound_loss`` on the
    reference's enumerated pair vector."""
    mask = negative_pair_mask(study_ids)
    n_neg = jnp.sum(mask)
    pos_energy = jnp.mean(jnp.diagonal(scores))
    neg_energy = _masked_logsumexp(scores, mask) - jnp.log(
        n_neg.astype(jnp.result_type(float)))
    return neg_energy - pos_energy


def infonce_bound_from_scores(scores: jax.Array, study_ids: jax.Array) -> jax.Array:
    """Reference-'infonce' loss from a (B, B) score matrix."""
    mask = negative_pair_mask(study_ids)
    pos_energy = jnp.mean(jnp.diagonal(scores))
    neg_energy = _masked_logsumexp(scores, mask)
    return neg_energy - pos_energy


def infonce_per_anchor(scores: jax.Array, study_ids: jax.Array) -> jax.Array:
    """Textbook global-batch InfoNCE (new capability, north-star config #4).

    Per-anchor cross entropy of the positive against that anchor's row of
    negatives: ``-mean_i [ S_ii - logsumexp_j(S_ij over {j valid or j==i}) ]``.
    """
    sid = study_ids.reshape(-1)
    valid = sid[:, None] != sid[None, :]
    eye = jnp.eye(scores.shape[0], dtype=bool)
    masked = jnp.where(valid | eye, scores, _NEG_INF)
    row_lse = jax.nn.logsumexp(masked, axis=1)
    return -jnp.mean(jnp.diagonal(scores) - row_lse)
