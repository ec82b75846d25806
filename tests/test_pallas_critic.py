"""Pallas pairwise-critic kernel: forward + gradient parity against the
pure-XLA factorized path (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.models.mlp import make_mlp
from mimm_tpu.objectives.pairing import pairwise_critic_scores
from mimm_tpu.ops.pairwise_critic import pairwise_critic_scores_pallas


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    B_i, B_t, D = 20, 12, 16
    params = make_mlp(k1, 2 * D, [32, 16])
    emb_img = jax.random.normal(k2, (B_i, D))
    emb_txt = jax.random.normal(k3, (B_t, D))
    return params, emb_img, emb_txt


def test_forward_matches_xla(setup):
    params, emb_img, emb_txt = setup
    want = pairwise_critic_scores(params, emb_img, emb_txt)
    got = pairwise_critic_scores_pallas(params, emb_img, emb_txt,
                                        force_kernel=True)
    assert got.shape == want.shape == (20, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla(setup):
    params, emb_img, emb_txt = setup
    key = jax.random.PRNGKey(9)
    cot = jax.random.normal(key, (20, 12))  # random upstream cotangent

    def loss(fn, p, a, b):
        return jnp.sum(fn(p, a, b) * cot)

    g_ref = jax.grad(lambda p, a, b: loss(pairwise_critic_scores, p, a, b),
                     argnums=(0, 1, 2))(params, emb_img, emb_txt)
    pallas_forced = lambda p, a, b: pairwise_critic_scores_pallas(
        p, a, b, force_kernel=True)
    g_pal = jax.grad(lambda p, a, b: loss(pallas_forced, p, a, b),
                     argnums=(0, 1, 2))(params, emb_img, emb_txt)

    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pal, _ = jax.tree_util.tree_flatten(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for r, p_ in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(np.asarray(p_), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


def test_non_reference_depth_falls_back(setup):
    """Critics with a different layer count route to the XLA path."""
    key = jax.random.PRNGKey(1)
    params = make_mlp(key, 32, [8])  # 2 layers -> fallback
    a = jax.random.normal(key, (4, 16))
    b = jax.random.normal(key, (4, 16))
    want = pairwise_critic_scores(params, a, b)
    got = pairwise_critic_scores_pallas(params, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_mi_loss_with_pallas_matches(setup):
    from mimm_tpu.objectives.pairing import mi_loss_from_embeddings
    params, emb_img, emb_txt = setup
    emb_txt = emb_txt[:20] if emb_txt.shape[0] >= 20 else \
        jnp.tile(emb_txt, (2, 1))[:20]
    sids = jnp.arange(20, dtype=jnp.int32)
    want = mi_loss_from_embeddings(params, emb_img, emb_txt, sids, "dv",
                                   use_pallas=False)
    got = mi_loss_from_embeddings(params, emb_img, emb_txt, sids, "dv",
                                  use_pallas=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-5)


def test_midscale_dispatches_to_xla():
    """While the XLA intermediate fits (and force_kernel is not set) the
    wrapper must return the XLA factorized path's result bit-for-bit —
    scan-chained device timings have XLA faster at every materializable
    batch (tools/bench_critic.py; the kernel exists for batches whose
    (BI, BJ, H1) intermediate cannot be materialized)."""
    from mimm_tpu.ops.pairwise_critic import pairwise_critic_scores_pallas

    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    params = make_mlp(k1, 2 * 8, [16, 8])
    emb_img = jax.random.normal(k2, (160, 8))
    emb_txt = jax.random.normal(k3, (160, 8))  # 25600 pairs > 16384
    want = pairwise_critic_scores(params, emb_img, emb_txt)
    got = pairwise_critic_scores_pallas(params, emb_img, emb_txt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tiled_path_matches_xla(monkeypatch):
    """Force the multi-tile branch (small MAX_BLOCK_*) so the cross-tile
    accumulators (dhi per i-row, shared weight grads zeroed only at grid
    step 0) are exercised — this is where a real accumulator-zeroing bug
    was caught during bring-up."""
    import mimm_tpu.ops.pairwise_critic as pc

    monkeypatch.setattr(pc, "MAX_BLOCK_I", 8)
    monkeypatch.setattr(pc, "MAX_BLOCK_J", 16)

    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    B_i, B_t, D = 40, 35, 8          # forces ni=5, nj=3 grids with padding
    params = make_mlp(k1, 2 * D, [16, 8])
    emb_img = jax.random.normal(k2, (B_i, D))
    emb_txt = jax.random.normal(k3, (B_t, D))

    want = pairwise_critic_scores(params, emb_img, emb_txt)
    got = pc.pairwise_critic_scores_pallas(params, emb_img, emb_txt,
                                           force_kernel=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    cot = jax.random.normal(jax.random.PRNGKey(9), (B_i, B_t))
    loss = lambda fn, p, a, b: jnp.sum(fn(p, a, b) * cot)
    g_ref = jax.grad(lambda p, a, b: loss(pairwise_critic_scores, p, a, b),
                     argnums=(0, 1, 2))(params, emb_img, emb_txt)
    g_pal = jax.grad(lambda p, a, b: loss(
        lambda q, c, d: pc.pairwise_critic_scores_pallas(
            q, c, d, force_kernel=True), p, a, b),
                     argnums=(0, 1, 2))(params, emb_img, emb_txt)
    for r, p_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(p_), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)
