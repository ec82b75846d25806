"""Space-to-depth stem (models/resnet.py s2d_stem) == canonical path.

The s2d schedule is a pure compute-layout change: identical parameter
tree, identical function (kernels derived from canonical params
in-flight), identical BatchNorm statistics.  Proven here in float64
(f32 association noise amplified through six BN layers would otherwise
dominate — early-layer BN scale gradients are cancellation-dominated):
forward outputs, batch_stats updates, and parameter gradients all match
to 1e-9 relative."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.models.resnet import ResNet256_6_2_1


def _models(dtype):
    base = ResNet256_6_2_1(output_channels=1, dtype=dtype)
    s2d = ResNet256_6_2_1(output_channels=1, dtype=dtype, s2d_stem=True)
    return base, s2d


def test_s2d_param_tree_identical():
    base, s2d = _models(jnp.float32)
    x = jnp.zeros((1, 128, 128, 1))
    vb = base.init(jax.random.PRNGKey(0), x, train=False)
    vs = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(vb) == jax.tree_util.tree_structure(vs)
    for pb, ps in zip(jax.tree.leaves(vb), jax.tree.leaves(vs)):
        assert pb.shape == ps.shape
    # identical RNG paths -> identical init draws for the stem params
    np.testing.assert_allclose(vb["params"]["conv1"]["kernel"],
                               vs["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        vb["params"]["layer1_block0"]["conv1"]["kernel"],
        vs["params"]["layer1_block0"]["conv1"]["kernel"])


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _setup_f64():
    base, s2d = _models(jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 128, 128, 1)), jnp.float64)
    variables = base.init(jax.random.PRNGKey(1), x[:1], train=False)
    variables = jax.tree.map(lambda a: a.astype(jnp.float64), variables)
    return base, s2d, x, variables


def test_s2d_forward_and_stats_match(x64):
    base, s2d, x, variables = _setup_f64()
    out_b, mut_b = base.apply(variables, x, train=True, mutable=["batch_stats"])
    out_s, mut_s = s2d.apply(variables, x, train=True, mutable=["batch_stats"])
    for a, b in zip(out_b, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)
    fb = jax.tree_util.tree_leaves_with_path(mut_b)
    fs = jax.tree_util.tree_leaves_with_path(mut_s)
    for (kb, a), (ks, b) in zip(fb, fs):
        assert kb == ks
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=jax.tree_util.keystr(kb))

    # eval mode (running stats) must match too
    eb = base.apply(variables, x, train=False)
    es = s2d.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(eb[1]), np.asarray(es[1]),
                               rtol=1e-9, atol=1e-12)


def test_s2d_gradients_match(x64):
    base, s2d, x, variables = _setup_f64()
    params, bstats = variables["params"], variables["batch_stats"]

    def loss(model, p):
        outs, _ = model.apply({"params": p, "batch_stats": bstats}, x,
                              train=True, mutable=["batch_stats"])
        _, z, _, z_local, y_logits = outs
        return (jnp.sum(z ** 2) + jnp.sum(z_local ** 2) * 1e-3
                + jnp.sum(y_logits ** 2))

    gb = jax.grad(lambda p: loss(base, p))(params)
    gs = jax.grad(lambda p: loss(s2d, p))(params)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    flat_s = jax.tree_util.tree_leaves_with_path(gs)
    # scale-invariance cancellation makes some BN-scale grads tiny relative
    # to the loss; bound the error by the overall gradient magnitude
    gscale = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(gb))
    for (kb, a), (ks, b) in zip(flat_b, flat_s):
        assert kb == ks
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9 * gscale,
            err_msg=jax.tree_util.keystr(kb))
