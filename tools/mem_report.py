"""Device-free per-chip memory accounting for a mesh/parallelism config.

Answers "what rests in each chip's HBM for THIS config?" without any
devices: the MITrainState is shape-evaluated (jax.eval_shape — no
allocation, no hardware), the at-rest placement comes from the SAME
rules the trainer uses (parallel/mesh.py mi_state_specs — tp over
'model', pp resident stacking over 'pipe', the ZeRO ladder over 'data'),
and each leaf's per-chip share is its bytes divided by the product of
the mesh-axis sizes its PartitionSpec names.

This is the planning companion to the knobs in README/MIGRATION: e.g.
bert-base f32 at dp=8 shows ~1.9 GB/chip replicated dropping to
~0.25 GB with --zero1_optimizer_sharding --fsdp_parameter_sharding.
No reference counterpart (the reference is single-device, SURVEY.md §2).

Usage (all TrainingConfig flags apply):
    python tools/mem_report.py --mesh_shape data=8 \
        --zero1_optimizer_sharding true --fsdp_parameter_sharding true
    python tools/mem_report.py --mesh_shape data=4,pipe=2

Prints a per-tree table (global vs per-chip MB) and one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class MeshStub:
    """Duck-typed stand-in for jax.sharding.Mesh: mi_state_specs and the
    helpers it calls read only ``axis_names`` and ``devices.shape``, so
    accounting needs no actual devices (works for any hypothetical pod
    size on a dev box with one chip)."""

    def __init__(self, shape):
        shape = dict(shape)
        self.axis_names = tuple(shape)
        self.devices = np.empty(tuple(shape.values()) or (1,), dtype=object)
        if not shape:
            self.axis_names = ("data",)


def _shard_fraction(spec, sizes) -> int:
    f = 1
    for entry in tuple(spec):
        if entry is None:
            continue
        for ax in (entry if isinstance(entry, (tuple, list)) else (entry,)):
            f *= sizes[ax]
    return f


def abstract_mi_state(cfg, bert_config=None):
    """Shape-only MITrainState for cfg (restacked when the mesh has a
    'pipe' axis, exactly like the Manager)."""
    import jax

    from mimm_tpu.parallel.pipeline import (pipeline_stage_count,
                                            stack_resident_text_state)
    from mimm_tpu.train.mi import (build_joint_model, create_mi_state,
                                   load_bert_config, make_optimizers)

    bert = bert_config or load_bert_config(cfg)
    model = build_joint_model(cfg, bert)
    txs = make_optimizers(cfg, steps_per_epoch=100)
    mesh = MeshStub(dict(cfg.mesh_shape))

    def build(rng):
        state = create_mi_state(model, cfg, txs, rng)
        if pipeline_stage_count(mesh) > 1:
            state = stack_resident_text_state(state, bert.num_hidden_layers)
        return state

    return jax.eval_shape(build, jax.random.PRNGKey(0)), mesh


def abstract_ae_state(cfg):
    """Shape-only AETrainState for cfg (train/ae.py)."""
    import jax

    from mimm_tpu.train.ae import build_ae_model, create_ae_state

    model = build_ae_model(cfg)
    mesh = MeshStub(dict(cfg.mesh_shape))
    return jax.eval_shape(
        lambda rng: create_ae_state(model, cfg, rng),
        jax.random.PRNGKey(0)), mesh


def report(cfg, bert_config=None, trainer: str = "mi") -> dict:
    """{'groups': {name: {'global_mb', 'per_chip_mb'}}, 'total_*_mb',
    'mesh': {...}} for cfg's mesh/ZeRO/pp/tp knobs.  ``trainer``: 'mi'
    (flagship joint model) or 'ae' (autoencoder)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from mimm_tpu.parallel.mesh import mi_state_specs, zero1_shardings

    zero1 = getattr(cfg, "zero1_optimizer_sharding", False)
    fsdp = getattr(cfg, "fsdp_parameter_sharding", False)
    if trainer == "ae":
        state, mesh = abstract_ae_state(cfg)
        rep = lambda t: jax.tree.map(lambda _: P(), t)
        z = lambda t: zero1_shardings(mesh, t)
        groups = {
            "params": (state.params, (z if fsdp else rep)(state.params)),
            "batch_stats": (state.batch_stats, rep(state.batch_stats)),
            "opt_state": (state.opt_state,
                          (z if zero1 else rep)(state.opt_state)),
        }
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    elif trainer == "mi":
        state, mesh = abstract_mi_state(cfg, bert_config)
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        specs = mi_state_specs(mesh, state, zero1=zero1, fsdp=fsdp)
        groups = {
            "params/image_model": (state.params["image_model"],
                                   specs.params["image_model"]),
            "params/text_model": (state.params["text_model"],
                                  specs.params["text_model"]),
            "critic_params": (state.critic_params, specs.critic_params),
            "batch_stats": (state.batch_stats, specs.batch_stats),
            "img_opt": (state.img_opt, specs.img_opt),
            "mi_opt": (state.mi_opt, specs.mi_opt),
            "txt_opt": (state.txt_opt, specs.txt_opt),
        }
    else:
        raise ValueError(f"unknown trainer: {trainer}")
    out = {}
    for name, (tree, spec_tree) in groups.items():
        leaves = jax.tree.leaves(tree)
        spec_leaves = jax.tree.leaves(spec_tree,
                                      is_leaf=lambda x: isinstance(x, P))
        assert len(leaves) == len(spec_leaves), name
        g = p = 0.0
        for leaf, spec in zip(leaves, spec_leaves):
            b = int(np.prod(leaf.shape)) * leaf.dtype.itemsize \
                if leaf.shape else leaf.dtype.itemsize
            g += b
            p += b / _shard_fraction(spec, sizes)
        out[name] = {"global_mb": round(g / 2**20, 2),
                     "per_chip_mb": round(p / 2**20, 2)}
    return {
        "trainer": trainer,
        "mesh": sizes,
        "zero1": bool(zero1),
        "fsdp": bool(fsdp),
        "groups": out,
        "total_global_mb": round(sum(v["global_mb"] for v in out.values()), 2),
        "total_per_chip_mb": round(sum(v["per_chip_mb"] for v in out.values()), 2),
    }


def main() -> None:
    import jax

    # accounting is pure shape math — never touch the TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    from mimm_tpu.config import construct_training_parameters

    trainer = "mi"
    argv = sys.argv[1:]
    if "--trainer" in argv:
        i = argv.index("--trainer")
        trainer = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    cfg = construct_training_parameters(argv)
    r = report(cfg, trainer=trainer)
    print(f"trainer={trainer} mesh={r['mesh']} zero1={r['zero1']} "
          f"fsdp={r['fsdp']}")
    print(f"{'tree':24s} {'global MB':>10s} {'per-chip MB':>12s}")
    for name, v in r["groups"].items():
        print(f"{name:24s} {v['global_mb']:>10.2f} {v['per_chip_mb']:>12.2f}")
    print(f"{'TOTAL':24s} {r['total_global_mb']:>10.2f} "
          f"{r['total_per_chip_mb']:>12.2f}")
    print(json.dumps(r))


if __name__ == "__main__":
    main()
