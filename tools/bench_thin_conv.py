"""Thin-channel layout probe: why are the shallow ResNet stages ~15x off
the roofline, and does channel-major layout fix it?

Device-bound tower profile (tools/bench_image_tower.py, scan-chained):
conv1 stage (1->8ch at 256^2 + BN + relu) 1.96 ms, layer1 (8->8ch
blocks) 3.25 ms — for ~5 GFLOP and ~100 MB of logical traffic.
Hypothesis: with NHWC and C=8 minor, the TPU (8,128) tiling pads the
lane dimension 16x, so every elementwise/BN pass moves padded tiles.
This probe times, scan-chained (fwd+bwd):

* relu over (64,256,256,8) NHWC vs (64,8,256,256) NCHW (pure layout);
* conv(1->8, 3x3, s1)+BN+relu at 256^2 in NHWC vs NCHW conv dims;
* a layer1 BasicBlock (8->8, s2 + s1 convs, BNs, residual) in both.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
WARMUP = 1
STEPS = 6
SCAN_STEPS = 8


def main():
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend()}

    def timed(tag, one_step, init_state):
        @jax.jit
        def step(state, _):
            state, ls = jax.lax.scan(one_step, state, None, length=SCAN_STEPS)
            return state, ls[-1]

        state = init_state
        for _ in range(WARMUP):
            state, loss = step(state, None)
            float(np.asarray(jax.device_get(loss)).ravel()[0])
        t0 = time.perf_counter()
        losses = []
        for _ in range(STEPS):
            state, loss = step(state, None)
            losses.append(loss)
        np.asarray(jax.device_get(losses[-1]))
        out[tag] = round((time.perf_counter() - t0) / (STEPS * SCAN_STEPS)
                         * 1e3, 3)
        print(json.dumps(out), flush=True)

    rng = np.random.default_rng(0)
    x_nhwc = jnp.asarray(rng.random((BATCH, 256, 256, 8), np.float32),
                         jnp.bfloat16)
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))

    # --- pure elementwise pass, layout A/B --------------------------------
    def ew(x0):
        def one(x, _):
            y = jax.nn.relu(x) * 1.0001
            return y, jnp.sum(y[..., :1, :1].astype(jnp.float32))
        return one

    timed("relu_nhwc_c8_ms", ew(x_nhwc), x_nhwc)
    timed("relu_nchw_c8_ms", ew(x_nchw), x_nchw)

    # --- conv(1->8)+BN+relu stage, fwd+bwd, layout A/B --------------------
    img_nhwc = jnp.asarray(rng.random((BATCH, 256, 256, 1), np.float32),
                           jnp.bfloat16)
    img_nchw = jnp.transpose(img_nhwc, (0, 3, 1, 2))
    k_hwio = jnp.asarray(rng.standard_normal((3, 3, 1, 8)).astype(np.float32)
                         * 0.1, jnp.bfloat16)
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)

    def stem(img, dn, ch_axis):
        kernel = k_hwio if dn[1] == "HWIO" else \
            jnp.transpose(k_hwio, (3, 2, 0, 1))  # OIHW

        def loss_fn(k, s, b, x):
            y = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=dn)
            axes = tuple(i for i in range(4) if i != ch_axis)
            yf = y.astype(jnp.float32)
            m = jnp.mean(yf, axes, keepdims=True)
            v = jnp.mean(jnp.square(yf), axes, keepdims=True) - jnp.square(m)
            shape = [1] * 4
            shape[ch_axis] = 8
            yn = (yf - m) * jax.lax.rsqrt(v + 1e-5) * s.reshape(shape) \
                + b.reshape(shape)
            return jnp.sum(jax.nn.relu(yn).astype(jnp.float32) ** 2) * 1e-6

        def one(carry, _):
            k, s, b, salt = carry
            loss, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                k, s, b, img + salt)
            return (k - 0.0 * g[0], s - 0.0 * g[1], b - 0.0 * g[2],
                    loss * 0.0), loss

        return one, (kernel, scale, bias, jnp.zeros([], img.dtype))

    one, st = stem(img_nhwc, ("NHWC", "HWIO", "NHWC"), 3)
    timed("stem_nhwc_ms", one, st)
    one, st = stem(img_nchw, ("NCHW", "OIHW", "NCHW"), 1)
    timed("stem_nchw_ms", one, st)

    # --- layer1-shaped block: conv(8->8, s2) + BN + relu + conv(8->8, s1)
    #     + BN + residual(1x1 s2 + BN) + relu, fwd+bwd -------------------
    k1 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)
                     * 0.1, jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)
                     * 0.1, jnp.bfloat16)
    kd = jnp.asarray(rng.standard_normal((1, 1, 8, 8)).astype(np.float32)
                     * 0.1, jnp.bfloat16)

    def block(x0, dn, ch_axis):
        def conv(x, k, stride, pad):
            kk = k if dn[1] == "HWIO" else jnp.transpose(k, (3, 2, 0, 1))
            return jax.lax.conv_general_dilated(
                x, kk, window_strides=(stride, stride), padding=pad,
                dimension_numbers=dn)

        def bn(y, s, b):
            axes = tuple(i for i in range(4) if i != ch_axis)
            yf = y.astype(jnp.float32)
            m = jnp.mean(yf, axes, keepdims=True)
            v = jnp.mean(jnp.square(yf), axes, keepdims=True) - jnp.square(m)
            shape = [1] * 4
            shape[ch_axis] = 8
            return ((yf - m) * jax.lax.rsqrt(v + 1e-5) * s.reshape(shape)
                    + b.reshape(shape)).astype(y.dtype)

        def loss_fn(ks, x):
            k1_, k2_, kd_, s, b = ks
            h = jax.nn.relu(bn(conv(x, k1_, 2, ((1, 1), (1, 1))), s, b))
            h = bn(conv(h, k2_, 1, ((1, 1), (1, 1))), s, b)
            idn = bn(conv(x, kd_, 2, ((0, 0), (0, 0))), s, b)
            return jnp.sum(jax.nn.relu(h + idn).astype(jnp.float32) ** 2) * 1e-6

        def one(carry, _):
            ks, salt = carry
            loss, g = jax.value_and_grad(loss_fn)(ks, x0 + salt)
            ks = jax.tree.map(lambda a, d: a - 0.0 * d, ks, g)
            return (ks, loss * 0.0), loss

        return one, ((k1, k2, kd, scale, bias), jnp.zeros([], x0.dtype))

    one, st = block(x_nhwc, ("NHWC", "HWIO", "NHWC"), 3)
    timed("block_nhwc_ms", one, st)
    one, st = block(x_nchw, ("NCHW", "OIHW", "NCHW"), 1)
    timed("block_nchw_ms", one, st)


if __name__ == "__main__":
    main()
