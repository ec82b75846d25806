"""Grad-CAM explainability via jax.grad (reference model_utils.py:547-571).

The reference uses pytorch_grad_cam (with broken target_layers API usage
— SURVEY.md C24).  Here Grad-CAM is the textbook computation expressed
directly with JAX autodiff: weights = GAP of d(score)/d(feature_map),
cam = relu(sum_c w_c * A_c), normalized and overlaid on the input.
The ResNet's layer-5 feature map (the reference's ``z_local``) is the
target layer; the tail (layer6 + avgpool + fc path into the downstream
classifier) is re-applied as an explicit function of the feature map so
the gradient is taken exactly at z_local.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam(score_fn: Callable[[jax.Array], jax.Array],
             feature_map: jax.Array) -> np.ndarray:
    """Generic Grad-CAM: ``score_fn`` maps (B, H, W, C) feature maps to a
    (B,) score; returns (B, H, W) heatmaps in [0, 1]."""
    grads = jax.grad(lambda fm: jnp.sum(score_fn(fm)))(feature_map)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)     # GAP over H, W
    cam = jax.nn.relu(jnp.sum(weights * feature_map, axis=-1))
    flat = cam.reshape(cam.shape[0], -1)
    lo = flat.min(axis=1).reshape(-1, 1, 1)
    hi = flat.max(axis=1).reshape(-1, 1, 1)
    return np.asarray((cam - lo) / jnp.maximum(hi - lo, 1e-8))


def _tail_score(image_model, variables, classifier_apply, z_local):
    """layer6 + avgpool + flatten (-> 768-d embedding) + classifier applied
    to a layer-5 feature map, reusing the trained variables."""
    import flax.linen as nn
    from mimm_tpu.models.resnet import BasicBlock

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    x = z_local
    blocks = sorted(k for k in params if k.startswith("layer6_block"))
    for bi, name in enumerate(blocks):
        block = BasicBlock(planes=image_model.planes[5],
                           stride=2 if bi == 0 else 1,
                           use_projection=bi == 0, dtype=image_model.dtype)
        x = block.apply({"params": params[name],
                         "batch_stats": bstats.get(name, {})}, x, train=False)
    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    emb = x.reshape((x.shape[0], -1)).astype(jnp.float32)
    return classifier_apply(emb)[:, 0]


def resnet_grad_cam(image_model, variables, classifier_apply, images
                    ) -> np.ndarray:
    """Grad-CAM heatmaps of the classifier score wrt z_local (layer 5)."""
    outs = image_model.apply(variables, images, train=False)
    z_local = outs[3]
    return grad_cam(
        lambda z: _tail_score(image_model, variables, classifier_apply, z),
        z_local)


def generate_GradCAM_image(image_model, variables, classifier_apply, image,
                           location_path: str) -> str:
    """Overlay + write Grad_Cam.jpg (reference model_utils.py:547-571)."""
    import cv2

    if image.ndim == 3:
        image = image[None]
    # accept compact-transfer (integer) crops: same device-side
    # normalization as the train/eval steps (ops/image_norm.py)
    from mimm_tpu.ops.image_norm import device_normalize
    image = np.asarray(device_normalize(jnp.asarray(image)))
    cam = resnet_grad_cam(image_model, variables, classifier_apply,
                          jnp.asarray(image))[0]
    h, w = image.shape[1:3]
    cam_resized = cv2.resize((cam * 255).astype(np.uint8), (w, h))
    heat = cv2.applyColorMap(cam_resized, cv2.COLORMAP_JET)
    gray = (np.asarray(image[0, ..., 0]) * 255).astype(np.uint8)
    rgb = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    overlay = cv2.addWeighted(rgb, 0.5, heat, 0.5, 0)
    os.makedirs(location_path, exist_ok=True)
    out = os.path.join(location_path, "Grad_Cam.jpg")
    cv2.imwrite(out, overlay)
    return out
