"""Pairwise critic scoring — the TPU reformulation of the reference hot spot.

The reference builds MI pairs with a Python double loop that issues one
``torch.cat`` per negative pair (``main_utils.py:80-110``): with B=64 that
is up to 4096 sequential kernel launches materializing a (4096, 1536)
matrix, then runs the discriminator MLP over it.  This module computes the
same quantity as a single fused computation:

    S[i, j] = MLP([img_i ; txt_j])

The first linear layer of the discriminator factorizes over the
concatenation:  ``W1 @ [x;y] = W1_img @ x + W1_txt @ y``, so layer 1 costs
two (B, 768) @ (768, H) matmuls instead of a (B², 1536) @ (1536, H) one —
a B/2 x FLOP reduction on the widest layer, and no (B², 1536) tensor ever
exists.  The remaining layers run on the (B, B, H) pair activations, which
XLA tiles onto the MXU; ops/pairwise_critic.py provides a Pallas kernel
that additionally keeps the (B, B, H) intermediates in VMEM.

Loss semantics are identical to the reference (tests/test_critics.py proves
it against a brute-force pair enumeration).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from . import critics


def pairwise_critic_scores(params: List[dict], emb_img: jax.Array,
                           emb_txt: jax.Array) -> jax.Array:
    """Score every (image_i, text_j) pair with the MI discriminator.

    Args:
        params: make_mlp params; layer 0 input dim must equal
            emb_img.shape[-1] + emb_txt.shape[-1] (reference: 768 + 768).
        emb_img: (B_img, D) image embeddings.
        emb_txt: (B_txt, D) text embeddings.

    Returns:
        (B_img, B_txt) float32 score matrix.
    """
    d_img = emb_img.shape[-1]
    w1, b1 = params[0]["w"], params[0]["b"]
    # Factorize layer 1 across the concat halves.
    h_img = emb_img @ w1[:d_img]            # (B_i, H)
    h_txt = emb_txt @ w1[d_img:]            # (B_t, H)
    h = jax.nn.relu(h_img[:, None, :] + h_txt[None, :, :] + b1)  # (B_i, B_t, H)
    for layer in params[1:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    last = params[-1]
    scores = h @ last["w"] + last["b"]      # (B_i, B_t, 1)
    return scores[..., 0]


def brute_force_pair_logits(params: List[dict], emb_img: jax.Array,
                            emb_txt: jax.Array, study_ids) -> jax.Array:
    """Reference-order pair vector for parity testing ONLY.

    Reproduces the enumeration of ``create_mi_pairs`` (main_utils.py:88-108):
    first the B positive rows ``[img_i ; txt_i]``, then for gap=1..B-1 and
    i=0..B-1 the wrapped pair (i, (i+gap) % B) when study ids differ.  Runs
    the discriminator on the materialized pair matrix.  O(B^2) memory — use
    only in tests.
    """
    from mimm_tpu.models.mlp import mlp_apply

    sids = [str(s) for s in study_ids]
    b = len(sids)
    rows = [jnp.concatenate([emb_img[i], emb_txt[i]]) for i in range(b)]
    for gap in range(b - 1):
        for i in range(b):
            j = i + gap + 1
            if j >= b:
                j -= b
            if sids[i] != sids[j]:
                rows.append(jnp.concatenate([emb_img[i], emb_txt[j]]))
    mi_input = jnp.stack(rows)
    return mlp_apply(params, mi_input)[:, 0]


def mi_loss_from_embeddings(params: List[dict], emb_img: jax.Array,
                            emb_txt: jax.Array, study_ids: jax.Array,
                            estimator: str = "dv",
                            axis_name: Optional[str] = None,
                            use_pallas: bool = False) -> jax.Array:
    """Full MI objective from embeddings.

    When ``axis_name`` is given (inside shard_map/pmap over a data mesh
    axis), embeddings and study ids are all-gathered first so negatives are
    drawn from the *global* batch — the cross-chip generalization of the
    reference's local pairing (SURVEY.md §5: communication backend).
    """
    if axis_name is not None:
        emb_img = jax.lax.all_gather(emb_img, axis_name, tiled=True)
        emb_txt = jax.lax.all_gather(emb_txt, axis_name, tiled=True)
        study_ids = jax.lax.all_gather(study_ids, axis_name, tiled=True)

    if use_pallas:
        from mimm_tpu.ops.pairwise_critic import pairwise_critic_scores_pallas
        scores = pairwise_critic_scores_pallas(params, emb_img, emb_txt)
    else:
        scores = pairwise_critic_scores(params, emb_img, emb_txt)

    if estimator == "dv":
        return critics.dv_bound_from_scores(scores, study_ids)
    if estimator == "infonce":
        return critics.infonce_bound_from_scores(scores, study_ids)
    if estimator == "infonce_per_anchor":
        return critics.infonce_per_anchor(scores, study_ids)
    raise ValueError(f"unknown mi estimator: {estimator}")
