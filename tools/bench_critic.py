"""Pairwise-critic micro-bench: Pallas kernel vs XLA factorized path.

Times scores + DV bound, fwd+bwd+Adam on the critic params (the exact
sub-step the MI trainer pays per step) at B=64 (production) and B=512
(global-batch scale), embeddings held fixed.  Methodology matches
bench.py (chained dispatches, one final device->host read).

History: the original per-row kernel measured 2.34 ms at B=64 vs XLA's
3.06 ms; the chunked rewrite (8-row pair-matrix GEMMs) is benchmarked
by this tool.

Each dispatch runs SCAN_STEPS chained steps via lax.scan: a ~2 ms
kernel measured one dispatch at a time is tunnel-throughput-bound, not
device-bound (observed 1.7x run-to-run swings on the UNCHANGED XLA
path with single-step dispatches).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 2
STEPS = 10
SCAN_STEPS = 32  # chained steps per dispatch


def main():
    import jax
    import jax.numpy as jnp

    from mimm_tpu.models.mlp import make_mlp
    from mimm_tpu.objectives import critics as critics_lib
    from mimm_tpu.objectives.pairing import pairwise_critic_scores
    from mimm_tpu.ops.pairwise_critic import pairwise_critic_scores_pallas
    from mimm_tpu.train.optim import adam_torch

    out = {"backend": jax.default_backend()}
    rng = np.random.default_rng(0)
    tx = adam_torch(1e-4)

    def timed(step, state):
        for _ in range(WARMUP):
            state, loss = step(state, None)
            float(np.asarray(jax.device_get(loss)))
        t0 = time.perf_counter()
        losses = []
        for _ in range(STEPS):
            state, loss = step(state, None)
            losses.append(loss)
        final = float(np.asarray(jax.device_get(losses[-1])))
        dt = (time.perf_counter() - t0) / STEPS
        assert np.isfinite(final)
        return dt

    for b in (64, 512):
        ei = jnp.asarray(rng.standard_normal((b, 768)).astype(np.float32))
        et = jnp.asarray(rng.standard_normal((b, 768)).astype(np.float32))
        sids = jnp.asarray(np.arange(b, dtype=np.int64))
        params0 = make_mlp(jax.random.PRNGKey(1), 1536, [1024, 512])

        for tag, score_fn in (("pallas", pairwise_critic_scores_pallas),
                              ("xla", pairwise_critic_scores)):
            def loss_fn(p):
                scores = score_fn(p, ei, et)
                return critics_lib.dv_bound_from_scores(scores, sids)

            import optax

            def one(state, _):
                p, opt = state
                loss, g = jax.value_and_grad(loss_fn)(p)
                upd, opt = tx.update(g, opt, p)
                return (optax.apply_updates(p, upd), opt), loss

            @jax.jit
            def step(state, _):
                state, losses = jax.lax.scan(one, state, None,
                                             length=SCAN_STEPS)
                return state, losses[-1]

            dt = timed(step, (params0, tx.init(params0)))
            out[f"B{b}_{tag}_ms"] = round(dt * 1e3 / SCAN_STEPS, 3)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
