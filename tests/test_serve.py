"""InferenceSession: checkpoint loading + padded batch serving."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.models.resnet import ResNet256_6_2_1
from mimm_tpu.serve import InferenceSession


def _make_artifacts(tmp_path):
    """Write reference-named image-model + classifier checkpoints."""
    model = ResNet256_6_2_1(output_channels=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)),
                           train=False)
    sd = ckpt.resnet_state_dict_from_variables(
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables["batch_stats"])})
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_image_model.bin"), sd)

    mlp = BasicMLP(768, [16])
    params = mlp.init(jax.random.PRNGKey(1))
    clf_sd = ckpt.mlp_state_dict_from_params(jax.device_get(params))
    ckpt.save_state_dict_bin(
        str(tmp_path / "pytorch_image_classifier_Pneumonia_epoch3.bin"), clf_sd)
    return variables


def test_serve_embeds_and_classifies_with_padding(tmp_path):
    variables = _make_artifacts(tmp_path)
    sess = InferenceSession(str(tmp_path), batch_size=4,
                            classifier_layers=[16], disease="Pneumonia")

    rng = np.random.default_rng(0)
    imgs = rng.random((6, 256, 256, 1)).astype(np.float32)  # 6 % 4 != 0
    emb = sess.embed_images(imgs)
    assert emb.shape == (6, 768)

    # serving result == direct model apply (no padding contamination)
    model = ResNet256_6_2_1(output_channels=1)
    want = model.apply(variables, jnp.asarray(imgs), train=False)[1]
    np.testing.assert_allclose(emb, np.asarray(want), rtol=2e-4, atol=2e-4)

    probs = sess.classify(imgs)
    assert probs.shape == (6,)
    assert (probs > 0).all() and (probs < 1).all()


def test_serve_errors_without_classifier(tmp_path):
    _make_artifacts(tmp_path)
    sess = InferenceSession(str(tmp_path), batch_size=4)
    import pytest
    with pytest.raises(RuntimeError, match="no classifier"):
        sess.classify(np.zeros((2, 256, 256, 1), np.float32))
