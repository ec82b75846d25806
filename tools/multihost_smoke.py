"""REAL multi-host smoke: 2 OS processes, jax.distributed, one MI step.

The multi-host machinery (parallel/mesh.py initialize_distributed /
put_global / make_mesh over the global device list; checkpoint.py orbax
collective save/restore; per-process input slicing) is unit-tested
single-process, but only an actual multi-process run proves the
coordinator handshake, the cross-process collectives inside the jitted
MI step (global-batch negatives), and the collective checkpoint commit.
This tool launches TWO child interpreters on localhost (CPU platform,
2 virtual devices each -> a 4-device global mesh), runs one full MI
train step with the batch sharded across BOTH processes, saves + restores
an orbax checkpoint collectively, and asserts both ranks computed the
identical loss.

This is the standard JAX answer to testing pod code without a pod — the
same code path (`MIMM_DISTRIBUTED` env contract, global meshes,
put_global input feeding) runs unchanged on real TPU pods.

Usage: python tools/multihost_smoke.py      (takes a few minutes on a
1-core host: two concurrent CPU compiles).  Prints MULTIHOST SMOKE OK.
"""

import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEVICES = 2  # per process -> 4-device global mesh


def child(rank: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.models.joint import ImageReportModel
    from mimm_tpu.parallel import mesh as mesh_lib
    from mimm_tpu.train.mi import (MITrainState, create_mi_state,
                                   make_mi_train_step, make_optimizers)

    # the real bootstrap under test (env contract set by the parent)
    assert mesh_lib.initialize_distributed(), "bootstrap did not engage"
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * LOCAL_DEVICES, jax.device_count()
    assert jax.local_device_count() == LOCAL_DEVICES

    cfg = TrainingConfig().replace(
        img_size=128, max_seq_length=16, batch_size=8,
        compute_dtype="float32", num_train_epochs=1,
        use_pallas_critic=False, flash_attention=False, seed=0)
    bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32, num_classes=1)
    model = ImageReportModel(bert_config=bert, output_channels=1,
                             dtype=jnp.float32)
    mesh = mesh_lib.make_mesh({"data": N_PROC * LOCAL_DEVICES})

    txs = make_optimizers(cfg, steps_per_epoch=2)
    # identical seed on every process -> identical full init trees;
    # shard_mi_state distributes them via put_global(full=True)
    state = mesh_lib.shard_mi_state(
        mesh, create_mi_state(model, cfg, txs, jax.random.PRNGKey(0)))

    # one GLOBAL batch, every process holding only ITS contiguous slice
    # (exactly the Loader's process_count/process_index contract)
    B = cfg.batch_size
    rng = np.random.default_rng(0)
    full = {
        "image": rng.random((B, cfg.img_size, cfg.img_size, 1)).astype(np.float32),
        "txt_ids": rng.integers(0, 64, (B, cfg.max_seq_length)).astype(np.int32),
        "txt_masks": np.ones((B, cfg.max_seq_length), np.int32),
        "txt_segments": np.zeros((B, cfg.max_seq_length), np.int32),
        "study_id": np.arange(B, dtype=np.int64),
    }
    lo, hi = rank * (B // N_PROC), (rank + 1) * (B // N_PROC)
    local = {k: v[lo:hi] for k, v in full.items()}
    batch = mesh_lib.put_global(local, mesh_lib.batch_sharding(mesh))

    # the jitted step's (B, B) score matrix spans BOTH processes' samples:
    # XLA's all-gather for the global negatives crosses the process
    # boundary — the thing only a real multi-process run exercises
    step = make_mi_train_step(model, txs, cfg)
    state, loss = step(state, batch)
    loss = float(loss)
    assert np.isfinite(loss)
    print(f"MH_LOSS rank={rank} loss={loss:.9f}", flush=True)

    # lane 2: data x model mesh — BERT tensor parallelism + sequence
    # parallelism + the GradCache two-pass body, all under REAL
    # multi-process sharding (validates the put_global TP placement that
    # device_put cannot do on pods, and SP/grad-cache collectives across
    # the process boundary)
    mesh2 = mesh_lib.make_mesh({"data": 2, "model": 2})
    cfg2 = cfg.replace(sequence_parallel=True, grad_cache_chunks=2)
    model2 = ImageReportModel(bert_config=bert, output_channels=1,
                              dtype=jnp.float32,
                              sp_sharding=mesh_lib.seq_sharding(mesh2))
    state2 = mesh_lib.shard_mi_state(
        mesh2, create_mi_state(model2, cfg2, txs, jax.random.PRNGKey(0)))
    batch2 = mesh_lib.put_global(local, mesh_lib.batch_sharding(mesh2))
    step2 = make_mi_train_step(model2, txs, cfg2)
    state2, loss2 = step2(state2, batch2)
    loss2 = float(loss2)
    assert np.isfinite(loss2)
    print(f"MH_LOSS2 rank={rank} loss={loss2:.9f}", flush=True)

    # lane 3: data x pipe mesh — the GPipe schedule's ppermute chain and
    # the pp RESIDENT stacked text state (params + moments 1/S per chip,
    # parallel/pipeline.py) under REAL multi-process sharding: stage 0
    # lives on process 0's devices and stage 1 on process 1's, so every
    # microbatch handoff crosses the process boundary
    import dataclasses

    from mimm_tpu.parallel.pipeline import (is_stacked_text,
                                            stack_resident_text_state)
    bert3 = dataclasses.replace(bert, num_hidden_layers=2)
    model3 = ImageReportModel(bert_config=bert3, output_channels=1,
                              dtype=jnp.float32)
    mesh3 = mesh_lib.make_mesh({"data": 2, "pipe": 2})
    state3 = mesh_lib.shard_mi_state(
        mesh3, stack_resident_text_state(
            create_mi_state(model3, cfg, txs, jax.random.PRNGKey(0)), 2))
    qk = state3.params["text_model"]["bert"]["layers"]["attention"]["query"]["kernel"]
    assert qk.addressable_shards[0].data.shape[0] == 1, "not pipe-sharded"
    step3 = make_mi_train_step(model3, txs, cfg, mesh=mesh3)
    batch3 = mesh_lib.put_global(local, mesh_lib.batch_sharding(mesh3))
    state3, loss3 = step3(state3, batch3)
    loss3 = float(loss3)
    assert np.isfinite(loss3)
    assert is_stacked_text(state3.params["text_model"])
    print(f"MH_LOSS3 rank={rank} loss={loss3:.9f}", flush=True)

    # collective orbax save (every process writes its shards) + sharded
    # restore directly onto the mesh via a ShapeDtypeStruct target
    path = os.path.join(os.environ["MIMM_MH_DIR"], "mi_epoch1.ckpt")
    ckpt.save_checkpoint(path, state._asdict(), format="orbax")
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state._asdict())
    restored = MITrainState(**ckpt.load_checkpoint(path, target=target))
    assert int(restored.step) == 1, int(restored.step)
    np.testing.assert_allclose(
        np.asarray(restored.critic_params[0]["b"].addressable_data(0)),
        np.asarray(state.critic_params[0]["b"].addressable_data(0)))
    print(f"MH_OK rank={rank}", flush=True)


def main() -> None:
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp(prefix="mimm_mh_")
    procs = []
    for rank in range(N_PROC):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
            "MIMM_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "MIMM_NUM_PROCESSES": str(N_PROC),
            "MIMM_PROCESS_ID": str(rank),
            "MIMM_MH_DIR": tmp,
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        })
        code = (f"import sys; sys.path.insert(0, {REPO!r}); "
                "import jax; jax.config.update('jax_platforms', 'cpu'); "
                "from tools.multihost_smoke import child; "
                f"child({rank})")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    deadline = time.time() + 1500
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(10, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise SystemExit("multihost smoke TIMED OUT")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            raise SystemExit(f"rank {rank} failed rc={p.returncode}")
    losses, losses2, losses3 = [], [], []
    for rank, out in enumerate(outs):
        assert f"MH_OK rank={rank}" in out, out
        for line in out.splitlines():
            if line.startswith("MH_LOSS3"):
                losses3.append(line.split("loss=")[1])
                print(line)
            elif line.startswith("MH_LOSS2"):
                losses2.append(line.split("loss=")[1])
                print(line)
            elif line.startswith("MH_LOSS"):
                losses.append(line.split("loss=")[1])
                print(line)
    assert len(losses) == N_PROC and len(set(losses)) == 1, \
        f"ranks disagree on the dp loss: {losses}"
    assert len(losses2) == N_PROC and len(set(losses2)) == 1, \
        f"ranks disagree on the tp+sp+grad-cache loss: {losses2}"
    assert len(losses3) == N_PROC and len(set(losses3)) == 1, \
        f"ranks disagree on the pp loss: {losses3}"
    print("MULTIHOST SMOKE OK — 2 processes, 4-device mesh, identical losses "
          "(dp lane + tp/sp/grad-cache lane + pp resident lane), collective "
          "orbax save/restore")


if __name__ == "__main__":
    main()
