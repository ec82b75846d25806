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

# ---------------------------------------------------------------------------
# Space-to-depth stem (TPU perf mode, exact-equivalent by weight transform)
#
# The stem's thin convolutions (1->8 channels at 256x256, 8->8 at 128x128)
# put a contraction dimension of 9-72 onto a 128-wide MXU (<4% utilization).
# With ``s2d_stem=True`` the SAME function is computed on a 2x2
# space-to-depth layout: the input becomes (B, 128, 128, 4), conv1 becomes a
# 3x3x4->32 convolution and layer1_block0's entry convs consume the s2d
# activations directly — kernels are *derived from the canonical parameters
# in-flight* (like the BERT tower's fused_qkv), so the parameter tree,
# initialization, and checkpoints are bit-identical to the canonical path
# and the flag can be toggled freely between (or during) runs.
#
# Layout convention: s2d channel index = (row_parity * 2 + col_parity) * C + c.
# ---------------------------------------------------------------------------


def _space_to_depth2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel = (pr*2+pc)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _s2d_offsets(p: int, d: int):
    """Canonical (pixel-parity p, kernel-tap d) -> (block tap, parity)."""
    u = p + d - 1
    q = u & 1
    return (u - q) // 2 + 1, q


def _conv1_kernel_s2d(k: jax.Array) -> jax.Array:
    """(3,3,1,8) stride-1 kernel on pixels -> (3,3,4,32) on 2x2 blocks.

    Output channel (pr*2+pc)*8+m is canonical output pixel parity (pr,pc)
    channel m; input channel qu*2+qv is input pixel parity (qu,qv)."""
    cout = k.shape[-1]
    kp = jnp.zeros((3, 3, 4, 4 * cout), k.dtype)
    for pr in range(2):
        for pc in range(2):
            msl = slice((pr * 2 + pc) * cout, (pr * 2 + pc + 1) * cout)
            for dr in range(3):
                tr, qu = _s2d_offsets(pr, dr)
                for dc in range(3):
                    tc, qv = _s2d_offsets(pc, dc)
                    kp = kp.at[tr, tc, qu * 2 + qv, msl].set(k[dr, dc, 0])
    return kp


def _entry_kernel_s2d(k: jax.Array) -> jax.Array:
    """(3,3,C,M) stride-2 kernel on pixels -> (2,2,4C,M) stride-1 on blocks
    (use with padding ((1,0),(1,0)))."""
    cin, cout = k.shape[2], k.shape[3]
    kp = jnp.zeros((2, 2, 4 * cin, cout), k.dtype)
    for dr in range(3):
        tr, qu = _s2d_offsets(0, dr)
        for dc in range(3):
            tc, qv = _s2d_offsets(0, dc)
            q0 = (qu * 2 + qv) * cin
            kp = kp.at[tr, tc, q0:q0 + cin, :].set(k[dr, dc])
    return kp


class _ConvKernel(nn.Module):
    """Param holder with nn.Conv's tree layout ('<name>/kernel') but no
    bound matmul — the s2d path materializes the transformed kernel."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", _conv_init, tuple(self.shape))


class _S2dBatchNorm(nn.Module):
    """BatchNorm over an s2d-layout tensor with CANONICAL (C,) parameters
    and running stats — statistics aggregate the 4 position groups, so
    train-mode stats, running-stat updates, and eval normalization all
    equal the canonical nn.BatchNorm on the un-s2d tensor (flax semantics:
    float32 stats, biased variance, ra = m*ra + (1-m)*batch)."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
            xf = x.astype(stat_dtype).reshape(x.shape[:-1] + (4, c))
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value \
                    + (1.0 - self.momentum) * var
        # stats in float32 (above), normalization arithmetic in the compute
        # dtype — mirrors flax nn.BatchNorm's dtype canonicalization
        mean4 = jnp.tile(mean, 4).astype(self.dtype)
        mul4 = jnp.tile(jax.lax.rsqrt(var + self.epsilon) * scale,
                        4).astype(self.dtype)
        bias4 = jnp.tile(bias, 4).astype(self.dtype)
        return (x.astype(self.dtype) - mean4) * mul4 + bias4


class _S2dEntryBlock(nn.Module):
    """layer1_block0 consuming the s2d stem activations: the stride-2 entry
    conv and the 1x1 stride-2 downsample read the (H/2, W/2, 4C) layout
    (kernels derived from canonical params); output and every other
    sub-op are canonical.  Parameter tree == BasicBlock's."""

    planes: int
    in_planes: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x_s2d, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name)
        k1 = _ConvKernel((3, 3, self.in_planes, self.planes), name="conv1")()
        out = jax.lax.conv_general_dilated(
            x_s2d, _entry_kernel_s2d(k1).astype(self.dtype),
            window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init,
                      name="conv2")(out)
        out = norm("bn2")(out)
        # canonical 1x1 stride-2 downsample == 1x1 stride-1 on the s2d
        # position-(0,0) channel group
        identity = nn.Conv(self.planes, (1, 1), use_bias=False,
                           dtype=self.dtype, kernel_init=_conv_init,
                           name="downsample_conv")(x_s2d[..., :self.in_planes])
        identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


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
    # Space-to-depth compute schedule for the stem (conv1 + layer1_block0's
    # entry convs) — exactly the same function and parameter tree, kernels
    # derived from the canonical params in-flight (see module comment).
    s2d_stem: bool = False
    # Pallas 9-shift VPU kernel for conv1 (ops/shallow_conv.py): exact
    # (f32 accumulation, same canonical parameter) but measured SLOWER
    # than the XLA stem with device-bound scan-chained timing (7.16 vs
    # 9.23 ms full tower step at B=64) — off by default, documented
    # experiment (the earlier "win" was dispatch-latency noise).
    pallas_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        """x: (B, H, W, 1) NHWC. Returns (y, z, y_sigmoid, z_local, y_logits)."""
        x = x.astype(self.dtype)
        s2d = self.s2d_stem
        if s2d and self.pallas_stem:
            raise ValueError("s2d_stem and pallas_stem are exclusive")
        if s2d and self.bn_axis_name is not None:
            raise NotImplementedError("s2d_stem does not support sync-BN")
        if self.pallas_stem:
            from mimm_tpu.ops.shallow_conv import shallow_conv3x3
            k1 = _ConvKernel((3, 3, 1, 8), name="conv1")()
            x = shallow_conv3x3(x, k1,
                                out_dtype=self.dtype).transpose(0, 2, 3, 1)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name, name="bn1")(x)
        elif s2d:
            k1 = _ConvKernel((3, 3, 1, 8), name="conv1")()
            x = jax.lax.conv_general_dilated(
                _space_to_depth2(x), _conv1_kernel_s2d(k1).astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = _S2dBatchNorm(features=8, dtype=self.dtype, name="bn1")(
                x, use_running_average=not train)
        else:
            x = nn.Conv(8, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        kernel_init=_conv_init, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name, name="bn1")(x)
        x = nn.relu(x)

        z_local = None
        inplanes = 8
        for li, (planes, blocks) in enumerate(zip(self.planes, self.blocks_per_layer)):
            for bi in range(blocks):
                if s2d and li == 0 and bi == 0:
                    x = _S2dEntryBlock(planes=planes, in_planes=inplanes,
                                       dtype=self.dtype,
                                       name="layer1_block0")(x, train=train)
                    inplanes = planes
                    continue
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
                       dtype: Any = jnp.float32, bn_axis_name: Optional[str] = None,
                       s2d_stem: bool = False,
                       pallas_stem: bool = False) -> ResNet256_6_2_1:
    """Factory matching reference build_resnet_model (model.py:514-526).
    Checkpoint loading lives in mimm_tpu.checkpoint (incl. reference-.bin
    import with joint-prefix stripping)."""
    if model_name != "resnet256_6_2_1":
        raise ValueError(f"unknown image model: {model_name}")
    return ResNet256_6_2_1(output_channels=output_channels, dtype=dtype,
                           bn_axis_name=bn_axis_name, s2d_stem=s2d_stem,
                           pallas_stem=pallas_stem)
