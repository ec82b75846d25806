"""Per-stage image-tower profile: where does ResNet256_6_2_1 time go?

ROUND1.md flagged the image tower as the short-bucket floor (~1/3 of the
L=64 step) with thin 8-32 channel convs underutilizing the MXU.  This
tool measures:

* the full image-tower train step (fwd+bwd+Adam) — canonical XLA stem,
  Pallas shallow-conv stem (production), and the s2d experiment;
* cumulative prefixes of the tower (conv1+bn1, ..+layer1, ..+layer2, ...)
  forward+backward, so per-stage cost = successive differences.

Timing is SCAN-CHAINED (SCAN_STEPS steps per device dispatch): the
small prefixes run ~1-4 ms/step, where single-step dispatch timing
through the axon tunnel measures tunnel throughput, not device time
(bench_critic.py learned this the hard way — 1.7x run-to-run swings on
unchanged code).

Usage: python tools/bench_image_tower.py   (axon env -> real TPU chip)
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
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from mimm_tpu.models.resnet import ResNet256_6_2_1

    out = {"backend": jax.default_backend(), "batch": BATCH,
           "scan_steps": SCAN_STEPS}
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((BATCH, 256, 256, 1), np.float32))

    def timed(step, state):
        for _ in range(WARMUP):
            state, loss = step(state, None)
            float(np.asarray(jax.device_get(loss)).ravel()[0])
        t0 = time.perf_counter()
        losses = []
        for _ in range(STEPS):
            state, loss = step(state, None)
            losses.append(loss)
        final = np.asarray(jax.device_get(losses[-1]))
        dt = (time.perf_counter() - t0) / (STEPS * SCAN_STEPS)
        assert np.isfinite(final).all()
        return round(dt * 1e3, 2)  # ms/step

    def tower_step_time(tag, **model_kw):
        model = ResNet256_6_2_1(output_channels=1, dtype=jnp.bfloat16,
                                **model_kw)
        variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)
        params, bstats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-4)

        def loss_fn(p, bs, x):
            (y, z, ys, zl, yl), mut = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"])
            return jnp.sum(z.astype(jnp.float32) ** 2) * 1e-6, mut["batch_stats"]

        def one(carry, _):
            p, bs, opt, salt = carry
            (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bs, image + salt)
            upd, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, upd), nbs, opt, loss * 0.0), loss

        @jax.jit
        def step(state, _):
            state, losses = jax.lax.scan(one, state, None, length=SCAN_STEPS)
            return state, losses[-1]

        out[tag] = timed(step, (params, bstats, tx.init(params),
                                jnp.zeros([], jnp.float32)))
        print(json.dumps(out), flush=True)

    tower_step_time("full_train_step_ms")
    tower_step_time("pallas_stem_train_step_ms", pallas_stem=True)

    # --- cumulative prefixes: conv1, +layer1, ..., +layer6 -----------------
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

        def sub_loss(p, bs, x):
            y, mut = sub.apply({"params": p, "batch_stats": bs}, x, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6, mut["batch_stats"]

        def one(carry, _):
            p, bs, salt = carry
            (l, nbs), g = jax.value_and_grad(sub_loss, has_aux=True)(
                p, bs, image + salt)
            # touch grads so XLA cannot DCE the backward; params unchanged
            gsum = sum(jnp.sum(a.astype(jnp.float32) ** 2)
                       for a in jax.tree.leaves(g))
            return (p, nbs, (l + gsum) * 0.0), l + gsum * 1e-9

        @jax.jit
        def fb(state, _):
            state, losses = jax.lax.scan(one, state, None, length=SCAN_STEPS)
            return state, losses[-1]

        key = "conv1" if upto == 0 else f"+layer{upto}"
        prefix_ms[key] = timed(fb, (svars["params"], svars["batch_stats"],
                                    jnp.zeros([], jnp.float32)))
        out["cumulative_fwd_bwd_ms"] = prefix_ms
        print(json.dumps(out), flush=True)

    stages = list(prefix_ms)
    out["per_stage_ms"] = {
        stages[i]: round(prefix_ms[stages[i]] -
                         (prefix_ms[stages[i - 1]] if i else 0.0), 2)
        for i in range(len(stages))}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
