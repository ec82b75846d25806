"""BERT step-time experiments: where do the missing TFLOPS go?

Times the text-tower train step (fwd+bwd+AdamW) at L=128, B=64 under
config variants — dropout off, flash off, fused_qkv off, optimizer off —
plus a pure-GEMM chain with the same total matmul FLOPs as the encoder,
to separate matmul ceiling, elementwise overhead, dropout, and optimizer
cost.  Methodology matches bench.py (chained dispatch, one final read).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
L = 128
WARMUP = 2
STEPS = 20


def _timed(step, state, batch):
    for _ in range(WARMUP):
        state, loss = step(state, batch)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = step(state, batch)
    final = float(loss)
    dt = (time.perf_counter() - t0) / STEPS
    assert np.isfinite(final)
    return dt


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    # persistent compile cache: variant compiles through the tunnel cost
    # minutes each; repeat probes of unchanged variants are then free
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from mimm_tpu.models.bert import BertConfig, TextBert
    from mimm_tpu.train.optim import adamw_hf, bert_decay_mask

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30522, (BATCH, L)).astype(np.int32))
    out = {}

    def bert_step_time(tag, with_opt=True, deterministic=False,
                       moment_dtype=None, **cfg_kw):
        cfg_kw.setdefault("flash_attention", on_tpu)
        cfg = BertConfig(num_classes=1, **cfg_kw)
        model = TextBert(cfg, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(1), ids)["params"]
        tx = adamw_hf(2e-5, eps=1e-6, weight_decay=0.1, correct_bias=False,
                      mask=bert_decay_mask, moment_dtype=moment_dtype)

        def loss_fn(p, key):
            emb, _ = model.apply(
                {"params": p}, ids, attention_mask=jnp.ones_like(ids),
                token_type_ids=jnp.zeros_like(ids),
                deterministic=deterministic,
                rngs={} if deterministic else {"dropout": key})
            return jnp.mean(jnp.square(emb))

        if with_opt:
            @jax.jit
            def step(state, _):
                p, opt, key = state
                key, sub = jax.random.split(key)
                loss, g = jax.value_and_grad(loss_fn)(p, sub)
                up, opt = tx.update(g, opt, p)
                return (optax.apply_updates(p, up), opt, key), loss
            state = (params, tx.init(params), jax.random.PRNGKey(2))
        else:
            @jax.jit
            def step(state, _):
                p, key, acc = state
                key, sub = jax.random.split(key)
                loss, g = jax.value_and_grad(loss_fn)(p, sub)
                # consume grads so nothing is DCE'd; keep params unchanged
                acc = acc + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), g, 0.0)
                return (p, key, acc), loss + 0.0 * acc
            state = (params, jax.random.PRNGKey(2), jnp.float32(0.0))

        out[tag] = round(_timed(step, state, None) * 1e3, 2)

    mode = os.environ.get("BERT_VARIANTS", "l128")
    if mode == "flash":
        # fused-attention kernel vs the XLA einsum path at every production
        # bucket length (flash_min_seq_len=1 forces the kernel everywhere).
        # Run after any flash-kernel change to re-derive the dispatch
        # threshold (BertConfig.flash_min_seq_len).  Both arms run the
        # production u8_dropout so the einsum side pays its real (u8) mask
        # cost, not the uint32 one.  FLASH_LENGTHS="160,192" restricts the
        # probe (each arm costs a tunnel compile).
        lengths = tuple(int(x) for x in os.environ.get(
            "FLASH_LENGTHS", "96,128,160,192,256,320").split(","))
        for L_ in lengths:
            ids = jnp.asarray(rng.integers(0, 30522,
                                           (BATCH, L_)).astype(np.int32))
            bert_step_time(f"L{L_}_einsum", flash_attention=False,
                           gelu_tanh=True, u8_dropout=True)
            print(json.dumps(out), flush=True)
            bert_step_time(f"L{L_}_flash", flash_attention=True,
                           flash_min_seq_len=1, gelu_tanh=True,
                           u8_dropout=True)
            print(json.dumps(out), flush=True)
            if os.environ.get("FLASH_WS"):
                bert_step_time(f"L{L_}_flash_ws", flash_attention=True,
                               flash_min_seq_len=1, gelu_tanh=True,
                               u8_dropout=True,
                               flash_whole_sample_max_len=L_)
                print(json.dumps(out), flush=True)
        return
    if mode == "ffn":
        # fused-FFN Pallas kernel A/B at the production bucket lengths
        # (tanh-GELU baseline vs ops/fused_ffn.py), dropout on, AdamW on.
        # Rebinding ``ids`` updates the closure bert_step_time reads.
        for L_ in (64, 96, 128, 320):
            ids = jnp.asarray(rng.integers(0, 30522,
                                           (BATCH, L_)).astype(np.int32))
            bert_step_time(f"L{L_}_tanh", gelu_tanh=True)
            print(json.dumps(out), flush=True)
            bert_step_time(f"L{L_}_fused_ffn", gelu_tanh=True, fused_ffn=True)
            print(json.dumps(out), flush=True)
        return
    if mode == "moments":
        # bf16 AdamW moment storage A/B (train/optim.py moment_dtype)
        for L_ in (64, 128):
            ids = jnp.asarray(rng.integers(0, 30522,
                                           (BATCH, L_)).astype(np.int32))
            bert_step_time(f"L{L_}_f32mom", gelu_tanh=True)
            print(json.dumps(out), flush=True)
            bert_step_time(f"L{L_}_bf16mom", gelu_tanh=True,
                           moment_dtype=jnp.bfloat16)
            print(json.dumps(out), flush=True)
        return
    if mode == "dropout":
        # packed (byte-threshold, ops/dropout.py) vs plain nn.Dropout vs
        # off — quantifies residual dropout cost under the production
        # hardware PRNG (unsafe_rbg; packed was motivated pre-unsafe_rbg)
        for L_ in (64, 128):
            ids = jnp.asarray(rng.integers(0, 30522,
                                           (BATCH, L_)).astype(np.int32))
            bert_step_time(f"L{L_}_plain_dropout", gelu_tanh=True)
            print(json.dumps(out), flush=True)
            bert_step_time(f"L{L_}_packed_dropout", gelu_tanh=True,
                           packed_dropout=True)
            print(json.dumps(out), flush=True)
            bert_step_time(f"L{L_}_no_dropout", gelu_tanh=True,
                           deterministic=True)
            print(json.dumps(out), flush=True)
        return
    if mode == "cliff":
        # Locate the fixed ~+20 ms step-time cliff between L=128 and
        # L=160 (VERDICT r2 item 3: the 192 bucket at ~41% MFU).  Raw
        # same-FLOP GEMM chains show no cliff and it is attention-impl-
        # independent, so sweep L finely and strip components at the
        # first post-cliff length.  LENS / CLIFF_VARIANTS env override.
        lens = [int(x) for x in os.environ.get(
            "LENS", "128,136,144,152,160").split(",")]
        for L_ in lens:
            ids = jnp.asarray(rng.integers(0, 30522,
                                           (BATCH, L_)).astype(np.int32))
            bert_step_time(f"L{L_}", flash_attention=False, gelu_tanh=True)
            print(json.dumps(out), flush=True)
        L_ = lens[-1]
        ids = jnp.asarray(rng.integers(0, 30522,
                                       (BATCH, L_)).astype(np.int32))
        for var, kw in (("no_dropout", dict(deterministic=True)),
                        ("no_opt", dict(with_opt=False))):
            bert_step_time(f"L{L_}_{var}", flash_attention=False,
                           gelu_tanh=True, **kw)
            print(json.dumps(out), flush=True)
        return
    if mode == "cliff2":
        # The fix candidate for the cliff: uint8-threshold dropout
        # (BertConfig.u8_dropout) vs plain vs none, across the cliff.
        for L_ in [int(x) for x in os.environ.get(
                "LENS", "128,160,192").split(",")]:
            ids = jnp.asarray(rng.integers(0, 30522,
                                           (BATCH, L_)).astype(np.int32))
            bert_step_time(f"L{L_}_plain", flash_attention=False,
                           gelu_tanh=True)
            print(json.dumps(out), flush=True)
            bert_step_time(f"L{L_}_u8", flash_attention=False,
                           gelu_tanh=True, u8_dropout=True)
            print(json.dumps(out), flush=True)
        bert_step_time("L192_no_dropout", flash_attention=False,
                       gelu_tanh=True, deterministic=True)
        print(json.dumps(out), flush=True)
        return
    if mode == "cliff3":
        # Localize the residual (non-dropout) L>128 cliff: time 12x the
        # FFN block and 12x the attention block in isolation (fwd+bwd,
        # no dropout, no optimizer) at M = B*L crossing 8192.
        H, I, NH = 768, 3072, 12

        def timed_block(tag, loss_fn, params):
            @jax.jit
            def step(state, _):
                p, acc = state
                loss, g = jax.value_and_grad(loss_fn)(p)
                acc = acc + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2),
                    g, 0.0)
                return (p, acc), loss + 0.0 * acc
            state = (params, jnp.float32(0))
            out[tag] = round(_timed(step, state, None) * 1e3, 2)
            print(json.dumps(out), flush=True)

        for L_ in (128, 160):
            x = jnp.asarray(rng.standard_normal((BATCH, L_, H)), jnp.bfloat16)
            w1 = jnp.asarray(rng.standard_normal((H, I)) * 0.02, jnp.bfloat16)
            w2 = jnp.asarray(rng.standard_normal((I, H)) * 0.02, jnp.bfloat16)
            g1 = jnp.ones((H,), jnp.float32)

            def ffn_loss(p, x=x):
                w1, w2, g1 = p
                for _ in range(12):
                    h = jax.nn.gelu(x @ w1, approximate=True) @ w2 + x
                    m = jnp.mean(h.astype(jnp.float32), -1, keepdims=True)
                    v = jnp.var(h.astype(jnp.float32), -1, keepdims=True)
                    x = (((h - m) * jax.lax.rsqrt(v + 1e-12)) * g1
                         ).astype(jnp.bfloat16)
                return jnp.mean(jnp.square(x.astype(jnp.float32)))

            timed_block(f"ffn12_L{L_}", ffn_loss, (w1, w2, g1))

            wq = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)
            wo = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)

            def attn_loss(p, x=x, L_=L_):
                wq, wo, g1 = p
                for _ in range(12):
                    q = (x @ wq).reshape(BATCH, L_, NH, H // NH)
                    k = (x @ wq).reshape(BATCH, L_, NH, H // NH)
                    v = (x @ wo).reshape(BATCH, L_, NH, H // NH)
                    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / 8.0
                    pr = jax.nn.softmax(s.astype(jnp.float32), -1
                                        ).astype(jnp.bfloat16)
                    c = jnp.einsum("bhqk,bkhd->bqhd", pr, v
                                   ).reshape(BATCH, L_, H)
                    h = c @ wo + x
                    m = jnp.mean(h.astype(jnp.float32), -1, keepdims=True)
                    va = jnp.var(h.astype(jnp.float32), -1, keepdims=True)
                    x = (((h - m) * jax.lax.rsqrt(va + 1e-12)) * g1
                         ).astype(jnp.bfloat16)
                return jnp.mean(jnp.square(x.astype(jnp.float32)))

            timed_block(f"attn12_L{L_}", attn_loss, (wq, wo, g1))
        return
    if mode == "buckets":
        # einsum-attention step time at every bucket length, + flash at 96
        # (flash numbers for 64/128/192/320 come from bench_breakdown.py)
        for L_ in (64, 96, 128, 192, 320):
            globals()["L"] = L_  # noqa — reuse the closure ids below
            ids_ = jnp.asarray(rng.integers(0, 30522,
                                            (BATCH, L_)).astype(np.int32))
            for flash in (False, True) if L_ == 96 else (False,):
                cfg = BertConfig(num_classes=1, flash_attention=flash)
                model = TextBert(cfg, dtype=jnp.bfloat16)
                params = model.init(jax.random.PRNGKey(1), ids_)["params"]
                tx = adamw_hf(2e-5, eps=1e-6, weight_decay=0.1,
                              correct_bias=False, mask=bert_decay_mask)

                def loss_fn(p, key):
                    emb, _ = model.apply(
                        {"params": p}, ids_,
                        attention_mask=jnp.ones_like(ids_),
                        token_type_ids=jnp.zeros_like(ids_),
                        deterministic=False, rngs={"dropout": key})
                    return jnp.mean(jnp.square(emb))

                @jax.jit
                def step(state, _):
                    p, opt, key = state
                    key, sub = jax.random.split(key)
                    loss, g = jax.value_and_grad(loss_fn)(p, sub)
                    up, opt = tx.update(g, opt, p)
                    return (optax.apply_updates(p, up), opt, key), loss

                state = (params, tx.init(params), jax.random.PRNGKey(2))
                tag = f"L{L_}_{'flash' if flash else 'einsum'}"
                out[tag] = round(_timed(step, state, None) * 1e3, 2)
                print(json.dumps(out), flush=True)
        return

    bert_step_time("base")
    print(json.dumps(out), flush=True)
    bert_step_time("no_dropout", deterministic=True)
    print(json.dumps(out), flush=True)
    bert_step_time("no_optimizer", with_opt=False)
    print(json.dumps(out), flush=True)
    bert_step_time("no_flash", flash_attention=False)
    print(json.dumps(out), flush=True)
    bert_step_time("no_fused_qkv", fused_qkv=False)
    print(json.dumps(out), flush=True)

    # pure-GEMM ceiling: same matmul FLOP count as the 12-layer encoder
    # fwd (QKV+out: 4 units of (BL,768)@(768,768); FFN: 2 units of
    # (BL,768)@(768,3072)+(BL,3072)@(3072,768)) driven through fwd+bwd.
    M = BATCH * L
    w1 = jnp.asarray(rng.standard_normal((768, 768)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((768, 3072)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((3072, 768)).astype(np.float32) * 0.02,
                     jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((M, 768)).astype(np.float32),
                     jnp.bfloat16)

    def chain(x, w1, w2, w3):
        for _ in range(12):
            for _ in range(4):
                x = x @ w1
            x = (x @ w2) @ w3
        return jnp.mean(jnp.square(x.astype(jnp.float32)))

    @jax.jit
    def gemm_step(carry, _):
        x, acc = carry
        loss, grads = jax.value_and_grad(chain, argnums=(1, 2, 3))(x, w1, w2, w3)
        acc = acc + grads[0][0, 0].astype(jnp.float32)
        return (x, acc), loss + 0.0 * acc

    dt = _timed(gemm_step, (x0, jnp.float32(0.0)), None)
    fl = 12 * (4 * 2 * M * 768 * 768 + 2 * 2 * M * 768 * 3072) * 3  # fwd+bwd
    out["gemm_chain_ms"] = round(dt * 1e3, 2)
    out["gemm_chain_tflops"] = round(fl / dt / 1e12, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
