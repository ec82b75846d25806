"""Critic parity tests: matrix-form losses must equal the reference's
vector-form losses on the brute-force enumerated pair set
(reference mi_critics.py + main_utils.py:80-110 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.models.mlp import make_mlp, mlp_apply
from mimm_tpu.objectives import (
    dv_bound_from_scores,
    dv_bound_loss,
    infonce_bound_from_scores,
    infonce_bound_loss,
    infonce_per_anchor,
    negative_pair_mask,
    pairwise_critic_scores,
)
from mimm_tpu.objectives.pairing import brute_force_pair_logits, mi_loss_from_embeddings


def _numpy_dv(logits, pos_size):
    logits = np.asarray(logits, np.float64)
    pos = logits[:pos_size].mean()
    neg = logits[pos_size:]
    m = neg.max()
    lse = m + np.log(np.exp(neg - m).sum())
    return lse - np.log(len(neg)) - pos


def test_dv_bound_closed_form():
    logits = jnp.array([2.0, 1.0, 0.5, -1.0, -2.0, 0.0])
    got = dv_bound_loss(logits, 3)
    want = _numpy_dv(np.array(logits), 3)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_infonce_is_dv_without_log_correction():
    logits = jax.random.normal(jax.random.PRNGKey(0), (50,))
    dv = dv_bound_loss(logits, 10)
    nce = infonce_bound_loss(logits, 10)
    np.testing.assert_allclose(float(nce - dv), np.log(40.0), rtol=1e-5)


def test_negative_pair_mask_excludes_same_study():
    sids = jnp.array([1, 2, 2, 3])
    mask = np.asarray(negative_pair_mask(sids))
    assert not mask[0, 0] and not mask[1, 2] and not mask[2, 1]
    assert mask[0, 1] and mask[3, 0]
    assert mask.sum() == 4 * 4 - 4 - 2  # diag + the (1,2)/(2,1) duplicate study


@pytest.mark.parametrize("dup_study", [False, True])
def test_pairwise_scores_match_brute_force(dup_study):
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    B, D = 8, 16
    params = make_mlp(k1, 2 * D, [12, 6])
    emb_img = jax.random.normal(k2, (B, D))
    emb_txt = jax.random.normal(k3, (B, D))
    sids = [f"s{i}" for i in range(B)]
    if dup_study:
        sids[3] = sids[5] = "dup"  # two images of the same study

    scores = pairwise_critic_scores(params, emb_img, emb_txt)
    # Every score must equal the discriminator on the concatenated pair.
    # Tolerances are float32 reassociation noise: in float64 the two paths
    # agree to ~1e-15 (the layer-1 factorization is exact algebra); wiring
    # bugs produce O(1) errors which these bounds still catch.
    for i in [0, 3, 7]:
        for j in [0, 2, 5]:
            direct = mlp_apply(params, jnp.concatenate([emb_img[i], emb_txt[j]])[None])[0, 0]
            np.testing.assert_allclose(float(scores[i, j]), float(direct), rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("estimator", ["dv", "infonce"])
@pytest.mark.parametrize("dup_study", [False, True])
def test_matrix_loss_equals_reference_pair_loop(estimator, dup_study):
    """The fused masked-matrix loss == the reference create_mi_pairs loss."""
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    B, D = 10, 8
    params = make_mlp(k1, 2 * D, [16, 8])
    emb_img = jax.random.normal(k2, (B, D))
    emb_txt = jax.random.normal(k3, (B, D))
    sids = [f"s{i}" for i in range(B)]
    if dup_study:
        sids[0] = sids[9] = "dup"

    # Reference path: enumerate pairs in reference order, flat logits vector.
    flat = brute_force_pair_logits(params, emb_img, emb_txt, sids)
    ref_loss = (dv_bound_loss if estimator == "dv" else infonce_bound_loss)(flat, B)

    # TPU path: masked score matrix.
    sid_ints = jnp.array([hash(s) % (2**31) for s in sids], jnp.int32)
    scores = pairwise_critic_scores(params, emb_img, emb_txt)
    fn = dv_bound_from_scores if estimator == "dv" else infonce_bound_from_scores
    got = fn(scores, sid_ints)

    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-4, atol=1e-4)


def test_mi_loss_from_embeddings_end_to_end():
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    B, D = 6, 8
    params = make_mlp(k1, 2 * D, [8])
    emb_img = jax.random.normal(k2, (B, D))
    emb_txt = jax.random.normal(k3, (B, D))
    sids = jnp.arange(B, dtype=jnp.int32)
    loss = mi_loss_from_embeddings(params, emb_img, emb_txt, sids, "dv")
    assert jnp.isfinite(loss)
    # grads flow to critic params and embeddings
    g = jax.grad(lambda p, a, b: mi_loss_from_embeddings(p, a, b, sids, "dv"),
                 argnums=(0, 1, 2))(params, emb_img, emb_txt)
    assert all(jnp.any(layer["w"] != 0) for layer in g[0])
    assert jnp.any(g[1] != 0) and jnp.any(g[2] != 0)


def test_infonce_per_anchor_uniform_scores():
    """With identical scores everywhere, per-anchor InfoNCE = log(B)."""
    B = 7
    scores = jnp.zeros((B, B))
    sids = jnp.arange(B, dtype=jnp.int32)
    loss = infonce_per_anchor(scores, sids)
    np.testing.assert_allclose(float(loss), np.log(B), rtol=1e-5)


def test_global_negatives_all_gather():
    """mi_loss with axis_name over a mesh == single-device loss on the full batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    B, D = 16, 8
    params = make_mlp(k1, 2 * D, [8])
    emb_img = jax.random.normal(k2, (B, D))
    emb_txt = jax.random.normal(k3, (B, D))
    sids = jnp.arange(B, dtype=jnp.int32)

    want = mi_loss_from_embeddings(params, emb_img, emb_txt, sids, "dv")

    @jax.jit
    def sharded(params, ei, et, s):
        f = shard_map(
            lambda p, a, b, s_: mi_loss_from_embeddings(p, a, b, s_, "dv", axis_name="data"),
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
        return f(params, ei, et, s)

    got = sharded(params, emb_img, emb_txt, sids)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-4)


def test_image_side_mi_bound_config2():
    """BASELINE config #2: ResNet encoder + DV critic only — MI between two
    augmented views' image embeddings (no text tower).  The objective API
    is modality-agnostic: feed image embeddings on both sides."""
    from mimm_tpu.models.resnet import ResNet256_6_2_1

    model = ResNet256_6_2_1(output_channels=1, blocks_per_layer=(1,) * 6)
    img = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 256, 1))
    img2 = img + 0.01 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
    variables = model.init(jax.random.PRNGKey(2), img, train=False)
    params = make_mlp(jax.random.PRNGKey(3), 2 * 768, [32, 16])
    sids = jnp.arange(4, dtype=jnp.int32)

    def loss_fn(p, v):
        e1 = model.apply(v, img, train=False)[1]
        e2 = model.apply(v, img2, train=False)[1]
        return mi_loss_from_embeddings(p, e1, e2, sids, "dv")

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, variables)
    assert jnp.isfinite(loss)
    g_enc = jax.tree_util.tree_leaves(grads[1]["params"])
    assert any(jnp.any(g != 0) for g in g_enc)  # bound trains the encoder


def test_global_negatives_all_gather_infonce():
    """BASELINE config #4: InfoNCE with cross-chip embedding all-gather."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    B, D = 16, 8
    params = make_mlp(k1, 2 * D, [8])
    emb_img = jax.random.normal(k2, (B, D))
    emb_txt = jax.random.normal(k3, (B, D))
    sids = jnp.arange(B, dtype=jnp.int32)

    for estimator in ("infonce", "infonce_per_anchor"):
        want = mi_loss_from_embeddings(params, emb_img, emb_txt, sids, estimator)
        f = jax.jit(shard_map(
            lambda p, a, b, s_: mi_loss_from_embeddings(
                p, a, b, s_, estimator, axis_name="data"),
            mesh=mesh, in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(), check_vma=False))
        got = f(params, emb_img, emb_txt, sids)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4,
                                   atol=1e-4, err_msg=estimator)
