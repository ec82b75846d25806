"""ResNetAE — the unimodal autoencoder baseline, TPU-native (flax.linen, NHWC).

Capability parity with the reference
(``mutual_info_img_txt/autoencoder_model.py:16-215``): a symmetric
encoder/decoder with per-level residual stacks and optional
multi-resolution skip convolutions summed at the bottleneck, plus a
linear bottleneck ``fc1``/``fc2`` pair.  Reference configuration
(``main_utils.py:600-605``): input (256, 256, 1), 2 residual blocks per
level, 6 levels, z_dim=192, bottleneck 768, skips on — giving a 4x4x192
latent and a 768-d ``encode()`` embedding consumed by the downstream
classifier (``main_utils.py:380``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import _torch_linear_init

_LEAKY_SLOPE = 0.2


class PatchConv(nn.Module):
    """Conv2d with kernel == stride (non-overlapping patches), computed as
    reshape + one MXU matmul — mathematically EXACT (flax Conv is
    correlation; window positions align with patches) and far faster than
    XLA's generic conv lowering for the AE's k=s convs (the multi-res skip
    convs go up to 64x64 stride 64).  Parameter tree ('kernel' of shape
    (k, k, in, out), 'bias') is identical to nn.Conv, so checkpoints and
    the .bin converters are unaffected."""

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.kernel
        b_, h, w, c = x.shape
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (n, n, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.reshape(b_, h // n, n, w // n, n, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // n, w // n, n * n * c)
        wmat = k.reshape(n * n * c, self.features).astype(self.dtype)
        return x.astype(self.dtype) @ wmat + bias.astype(self.dtype)


class PatchConvTranspose(nn.Module):
    """ConvTranspose2d with kernel == stride: one matmul + pixel-shuffle
    reshape, exact vs flax ConvTranspose(transpose_kernel=False).  Same
    parameter tree as nn.ConvTranspose ('kernel' (k, k, in, out), 'bias')."""

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        n = self.kernel
        b_, h, w, c = z.shape
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (n, n, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # flax ConvTranspose applies the kernel spatially FLIPPED relative
        # to the patch-expansion order (empirically verified; matches the
        # torch-interop flip in checkpoint._deconv)
        k = k[::-1, ::-1]
        wmat = k.transpose(2, 0, 1, 3).reshape(c, n * n * self.features)
        y = z.astype(self.dtype) @ wmat.astype(self.dtype)
        y = y.reshape(b_, h, w, n, n, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h * n, w * n, self.features)
        return y + bias.astype(self.dtype)


class AEResidualBlock(nn.Module):
    """conv-BN-LeakyReLU x2 with identity shortcut
    (reference autoencoder_model.py:16-33)."""

    channels: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = norm("bn1")(h)
        h = nn.leaky_relu(h, _LEAKY_SLOPE)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = norm("bn2")(h)
        h = nn.leaky_relu(h, _LEAKY_SLOPE)
        return x + h


class ResNetEncoder(nn.Module):
    """Strided conv pyramid with residual stacks and multi-res skips
    (reference autoencoder_model.py:35-108)."""

    n_residual_blocks: int = 2
    n_levels: int = 6
    z_dim: int = 192
    use_multi_res_skips: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name)
        max_filters = 2 ** (self.n_levels + 3)

        x = nn.Conv(8, (3, 3), padding=1, dtype=self.dtype, name="input_conv")(x)
        x = norm("input_bn")(x)
        x = nn.leaky_relu(x, _LEAKY_SLOPE)

        skips = []
        for i in range(self.n_levels):
            n1, n2 = 2 ** (i + 3), 2 ** (i + 4)
            ks = 2 ** (self.n_levels - i)
            for b in range(self.n_residual_blocks):
                x = AEResidualBlock(n1, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                    name=f"level{i}_res{b}")(x, train=train)
            if self.use_multi_res_skips:
                s = PatchConv(max_filters, ks, dtype=self.dtype,
                              name=f"skip{i}_conv")(x)
                s = norm(f"skip{i}_bn")(s)
                skips.append(nn.leaky_relu(s, _LEAKY_SLOPE))
            x = PatchConv(n2, 2, dtype=self.dtype, name=f"down{i}_conv")(x)
            x = norm(f"down{i}_bn")(x)
            x = nn.leaky_relu(x, _LEAKY_SLOPE)

        if self.use_multi_res_skips:
            x = sum([x] + skips)
        return nn.Conv(self.z_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="output_conv")(x)


class ResNetDecoder(nn.Module):
    """Transposed-conv pyramid mirroring the encoder
    (reference autoencoder_model.py:110-179)."""

    n_residual_blocks: int = 2
    n_levels: int = 6
    z_dim: int = 192
    output_channels: int = 1
    use_multi_res_skips: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name, name=name)
        max_filters = 2 ** (self.n_levels + 3)

        z = nn.Conv(max_filters, (3, 3), padding=1, dtype=self.dtype,
                    name="input_conv")(z)
        z = norm("input_bn")(z)
        z = z_top = nn.leaky_relu(z, _LEAKY_SLOPE)

        n1 = max_filters
        for i in range(self.n_levels):
            n1 = 2 ** (self.n_levels - i + 2)
            ks = 2 ** (i + 1)
            z = PatchConvTranspose(n1, 2, dtype=self.dtype,
                                   name=f"up{i}_conv")(z)
            z = norm(f"up{i}_bn")(z)
            z = nn.leaky_relu(z, _LEAKY_SLOPE)
            for b in range(self.n_residual_blocks):
                z = AEResidualBlock(n1, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                    name=f"level{i}_res{b}")(z, train=train)
            if self.use_multi_res_skips:
                s = PatchConvTranspose(n1, ks, dtype=self.dtype,
                                       name=f"skip{i}_conv")(z_top)
                s = norm(f"skip{i}_bn")(s)
                z = z + nn.leaky_relu(s, _LEAKY_SLOPE)

        return nn.Conv(self.output_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="output_conv")(z)


class ResNetAE(nn.Module):
    """Encoder + linear bottleneck + decoder (reference
    autoencoder_model.py:183-215).  ``encode`` returns the bottleneck
    embedding used by downstream classifiers."""

    input_shape: Tuple[int, int, int] = (256, 256, 1)
    n_residual_blocks: int = 2
    n_levels: int = 6
    z_dim: int = 192
    bottleneck_dim: int = 768
    use_multi_res_skips: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    def setup(self):
        assert self.input_shape[0] == self.input_shape[1]
        self.img_latent_dim = self.input_shape[0] // (2 ** self.n_levels)
        self.encoder = ResNetEncoder(
            n_residual_blocks=self.n_residual_blocks, n_levels=self.n_levels,
            z_dim=self.z_dim, use_multi_res_skips=self.use_multi_res_skips,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        self.decoder = ResNetDecoder(
            n_residual_blocks=self.n_residual_blocks, n_levels=self.n_levels,
            z_dim=self.z_dim, output_channels=self.input_shape[2],
            use_multi_res_skips=self.use_multi_res_skips,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        flat = self.z_dim * self.img_latent_dim * self.img_latent_dim
        self.fc1 = nn.Dense(self.bottleneck_dim, kernel_init=_torch_linear_init,
                            name="fc1")
        self.fc2 = nn.Dense(flat, kernel_init=_torch_linear_init, name="fc2")

    def encode(self, x, train: bool = False):
        h = self.encoder(x, train=train)
        # upcast bf16 -> f32 for the bottleneck/loss (keeps f64 intact for
        # the float64 reference-parity golden)
        h = h.reshape((h.shape[0], -1)).astype(
            jnp.promote_types(h.dtype, jnp.float32))
        return self.fc1(h)

    def decode(self, z, train: bool = False):
        lat = self.img_latent_dim
        h = self.fc2(z).reshape((-1, lat, lat, self.z_dim)).astype(self.dtype)
        h = self.decoder(h, train=train)
        return jax.nn.sigmoid(h.astype(jnp.promote_types(h.dtype,
                                                         jnp.float32)))

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train=train), train=train)
