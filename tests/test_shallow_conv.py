"""Shallow-conv stem kernel (ops/shallow_conv.py) == lax.conv, fwd + VJP.

Runs in Pallas interpret mode on the CPU mesh; the real-TPU compile is
exercised by bench/tools runs (ROUND2.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu.ops.shallow_conv import shallow_conv3x3


def _ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_shallow_conv_forward_matches_lax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 8)) * 0.2, jnp.float32)
    y = shallow_conv3x3(x, k, out_dtype=jnp.float32)        # (B, C, H, W)
    y_ref = _ref_conv(x, k)                                  # (B, H, W, C)
    np.testing.assert_allclose(np.asarray(y.transpose(0, 2, 3, 1)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_shallow_conv_vjp_matches_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 8)) * 0.2, jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)

    def loss_kernel(x, k):
        y = shallow_conv3x3(x, k, out_dtype=jnp.float32).transpose(0, 2, 3, 1)
        return jnp.sum(y * r) + jnp.sum(jnp.square(y)) * 0.1

    def loss_ref(x, k):
        y = _ref_conv(x, k)
        return jnp.sum(y * r) + jnp.sum(jnp.square(y)) * 0.1

    lk, (gx, gk) = jax.value_and_grad(loss_kernel, argnums=(0, 1))(x, k)
    lr, (gx_r, gk_r) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)


def test_resnet_pallas_stem_matches_canonical():
    from mimm_tpu.models.resnet import ResNet256_6_2_1

    base = ResNet256_6_2_1(output_channels=1, dtype=jnp.float32)
    pal = ResNet256_6_2_1(output_channels=1, dtype=jnp.float32,
                          pallas_stem=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 128, 128, 1)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x[:1], train=False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(pal.init(jax.random.PRNGKey(0), x[:1],
                                              train=False))
    out_b, mut_b = base.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    out_p, mut_p = pal.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    for a, b in zip(out_b, out_p):
        # f32 sum-order noise amplified through six BN layers
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)
