"""Per-stage image-tower profile: where does ResNet256_6_2_1 time go?

ROUND1.md flagged the image tower as the short-bucket floor (~1/3 of the
L=64 step) with thin 8-32 channel convs underutilizing the MXU.  Before
optimizing (space-to-depth stem etc.), this tool measures:

* the full image-tower train step (fwd+bwd+Adam) — the number that
  matters for the MI step;
* cumulative prefixes of the tower (conv1+bn1, ..+layer1, ..+layer2, ...)
  forward+backward, so per-stage cost = successive differences;
* each prefix forward-only, to separate fwd from bwd cost.

Methodology matches bench.py: chained dispatches, one device->host read
at the end (a per-step read adds a ~25-40 ms tunnel round trip).

Usage: python tools/bench_image_tower.py   (axon env -> real TPU chip)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
WARMUP = 2
STEPS = 20


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from mimm_tpu.models.resnet import ResNet256_6_2_1

    out = {"backend": jax.default_backend(), "batch": BATCH}
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((BATCH, 256, 256, 1), np.float32))
    model = ResNet256_6_2_1(output_channels=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    # --- full tower train step (fwd+bwd+Adam), the MI-step contribution ---
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def loss_fn(p, bs, x):
        (y, z, ys, zl, yl), mut = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"])
        return jnp.sum(z.astype(jnp.float32) ** 2) * 1e-6, mut["batch_stats"]

    @jax.jit
    def train_step(p, bs, opt, x, salt):
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, x + salt)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), new_bs, opt, loss

    def timed(fn, *args):
        state = args
        for _ in range(WARMUP):
            state = fn(*state)
            float(np.asarray(jax.device_get(state[-1])).ravel()[0])
        t0 = time.perf_counter()
        outs = []
        for i in range(STEPS):
            state = fn(*state)
            outs.append(state[-1])
        np.asarray(jax.device_get(outs[-1]))
        return (time.perf_counter() - t0) / STEPS * 1e3  # ms

    def chained_train(p, bs, opt, x, loss=None):
        # fold the previous loss into the input so steps chain
        salt = (loss * 0.0) if loss is not None else 0.0
        p, bs, opt, loss = train_step(p, bs, opt, x, salt)
        return p, bs, opt, x, loss

    out["full_train_step_ms"] = round(
        timed(chained_train, params, bstats, opt, image), 2)

    # --- same step on the space-to-depth stem schedule (same params) ------
    s2d_model = ResNet256_6_2_1(output_channels=1, dtype=jnp.bfloat16,
                                s2d_stem=True)

    def s2d_loss(p, bs, x):
        (y, z, ys, zl, yl), mut = s2d_model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"])
        return jnp.sum(z.astype(jnp.float32) ** 2) * 1e-6, mut["batch_stats"]

    @jax.jit
    def s2d_step(p, bs, opt, x, salt):
        (loss, new_bs), g = jax.value_and_grad(s2d_loss, has_aux=True)(
            p, bs, x + salt)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), new_bs, opt, loss

    def chained_s2d(p, bs, opt, x, loss=None):
        salt = (loss * 0.0) if loss is not None else 0.0
        p, bs, opt, loss = s2d_step(p, bs, opt, x, salt)
        return p, bs, opt, x, loss

    out["s2d_train_step_ms"] = round(
        timed(chained_s2d, params, bstats, opt, image), 2)

    # --- cumulative prefixes: conv1, +layer1, ..., +layer6 -----------------
    # Build sub-models by running the tower and stopping after stage K.
    class Prefix(nn.Module):
        upto: int  # 0 = conv1+bn1+relu only, k = through layer k
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = True):
            from mimm_tpu.models.resnet import BasicBlock, _conv_init
            x = x.astype(self.dtype)
            x = nn.Conv(8, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        kernel_init=_conv_init, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
            inplanes = 8
            for li, planes in enumerate((8, 16, 32, 64, 128, 192)):
                if li + 1 > self.upto:
                    break
                for bi in range(2):
                    stride = 2 if bi == 0 else 1
                    proj = bi == 0 and (stride != 1 or inplanes != planes)
                    x = BasicBlock(planes=planes, stride=stride,
                                   use_projection=proj, dtype=self.dtype,
                                   name=f"layer{li + 1}_block{bi}")(x, train=train)
                    inplanes = planes
            return x

    prefix_ms = {}
    for upto in range(0, 7):
        sub = Prefix(upto=upto)
        svars = sub.init(jax.random.PRNGKey(0), image[:1], train=False)
        sp, sbs = svars["params"], svars["batch_stats"]

        def sub_loss(p, bs, x):
            y, mut = sub.apply({"params": p, "batch_stats": bs}, x, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6, mut["batch_stats"]

        @jax.jit
        def fb(p, bs, x, salt):
            (l, nbs), g = jax.value_and_grad(sub_loss, has_aux=True)(p, bs,
                                                                     x + salt)
            # touch grads so XLA cannot DCE the backward
            gsum = sum(jnp.sum(a.astype(jnp.float32) ** 2)
                       for a in jax.tree.leaves(g))
            return p, bs, x, l + gsum * 1e-9

        def chained(p, bs, x, loss=None):
            salt = (loss * 0.0) if loss is not None else 0.0
            p, bs, x, loss = fb(p, bs, x, salt)
            return p, bs, x, loss

        key = "conv1" if upto == 0 else f"+layer{upto}"
        prefix_ms[key] = round(timed(chained, sp, sbs, image), 2)
    out["cumulative_fwd_bwd_ms"] = prefix_ms
    stages = list(prefix_ms)
    out["per_stage_ms"] = {
        stages[i]: round(prefix_ms[stages[i]] -
                         (prefix_ms[stages[i - 1]] if i else 0.0), 2)
        for i in range(len(stages))}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
