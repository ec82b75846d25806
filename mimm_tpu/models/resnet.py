"""ResNet256_6_2_1 image encoder, TPU-native (flax.linen, NHWC).

Capability parity with the reference encoder
(``mutual_info_img_txt/model.py:272-497``): conv1 (1->8) + six strided
BasicBlock layers (8,16,32,64,128,192 channels, each halving spatial dims)
+ 2x2 average pooling + one fully-connected layer.  ``__call__`` returns the
same 5-tuple semantics ``(y_softmax, z_embedding, y_sigmoid, z_local,
y_logits)`` where ``z_embedding`` is the flattened 768-d pooled feature
(the representation used by MI training and downstream classifiers) and
``z_local`` is the layer-5 feature map (reference model.py:352-369).

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), bfloat16
compute with float32 params/BatchNorm statistics, and BatchNorm running
stats threaded through flax's ``batch_stats`` collection (per-replica under
data parallelism, matching the reference's single-device semantics; pass an
``axis_name`` for cross-replica sync-BN if desired).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') parity
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _torch_linear_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class BasicBlock(nn.Module):
    """Two 3x3 convs with BatchNorm + identity/downsample shortcut
    (reference model.py:120-152)."""

    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name)
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      kernel_init=_conv_init, name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init, name="conv2")(out)
        out = norm("bn2")(out)
        if self.use_projection:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet256_6_2_1(nn.Module):
    """The 6-layer strided residual encoder (reference model.py:272-369)."""

    output_channels: int = 1
    blocks_per_layer: Sequence[int] = (2, 2, 2, 2, 2, 2)
    planes: Sequence[int] = (8, 16, 32, 64, 128, 192)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        """x: (B, H, W, 1) NHWC. Returns (y, z, y_sigmoid, z_local, y_logits)."""
        x = x.astype(self.dtype)
        x = nn.Conv(8, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, axis_name=self.bn_axis_name, name="bn1")(x)
        x = nn.relu(x)

        z_local = None
        inplanes = 8
        for li, (planes, blocks) in enumerate(zip(self.planes, self.blocks_per_layer)):
            for bi in range(blocks):
                stride = 2 if bi == 0 else 1
                proj = bi == 0 and (stride != 1 or inplanes != planes)
                x = BasicBlock(planes=planes, stride=stride, use_projection=proj,
                               dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                               name=f"layer{li + 1}_block{bi}")(x, train=train)
                inplanes = planes
            if li == 4:  # layer5 feature map == reference z_local (model.py:361)
                z_local = x

        # 2x2 average pooling (reference model.py:308,364)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # (B, 768) at 256px; upcast bf16 -> f32 for the loss/critic (keeps
        # f64 intact for the float64 reference-parity golden)
        z = x.reshape((x.shape[0], -1)).astype(
            jnp.promote_types(x.dtype, jnp.float32))

        y_logits = nn.Dense(self.output_channels, kernel_init=_torch_linear_init,
                            bias_init=nn.initializers.zeros, name="fc1")(z)
        y = jax.nn.softmax(y_logits, axis=1)
        y_sigmoid = jax.nn.sigmoid(y_logits)
        return y, z, y_sigmoid, z_local, y_logits


def build_resnet_model(model_name: str = "resnet256_6_2_1", output_channels: int = 1,
                       dtype: Any = jnp.float32, bn_axis_name: Optional[str] = None
                       ) -> ResNet256_6_2_1:
    """Factory matching reference build_resnet_model (model.py:514-526).
    Checkpoint loading lives in mimm_tpu.checkpoint (incl. reference-.bin
    import with joint-prefix stripping)."""
    if model_name != "resnet256_6_2_1":
        raise ValueError(f"unknown image model: {model_name}")
    return ResNet256_6_2_1(output_channels=output_channels, dtype=dtype,
                           bn_axis_name=bn_axis_name)
