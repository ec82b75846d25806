"""tools/mem_report.py: device-free per-chip memory accounting must agree
with the trainer's actual placement rules (parallel/mesh.py
mi_state_specs) — replicated configs account 1:1, the ZeRO ladder and pp
resident stacking show their per-chip reductions, and the numbers are
internally consistent (per-chip <= global, totals = sum of groups)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mimm_tpu.config import TrainingConfig  # noqa: E402
from mimm_tpu.models.bert import BertConfig  # noqa: E402

TINY_BERT = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32, num_classes=1)


def _cfg(**kw):
    # img_size stays 256: ResNet256_6_2_1's six /2 stages need it (the
    # state is only eval_shape'd here, so full size costs nothing)
    return TrainingConfig().replace(max_seq_length=16,
                                    compute_dtype="float32", **kw)


def test_replicated_config_accounts_one_to_one():
    from mem_report import report
    r = report(_cfg(), bert_config=TINY_BERT)
    assert r["mesh"] == {"data": 1}
    for name, v in r["groups"].items():
        assert v["per_chip_mb"] == v["global_mb"], name
    assert r["total_per_chip_mb"] == r["total_global_mb"]
    got = round(sum(v["per_chip_mb"] for v in r["groups"].values()), 1)
    assert got == round(r["total_per_chip_mb"], 1)


def test_zero_ladder_reduces_per_chip_state():
    from mem_report import report
    base = report(_cfg(mesh_shape=(("data", 4),)), bert_config=TINY_BERT)
    z = report(_cfg(mesh_shape=(("data", 4),),
                    zero1_optimizer_sharding=True,
                    fsdp_parameter_sharding=True), bert_config=TINY_BERT)
    # dp alone replicates everything; the ladder rests ~1/4 per chip
    assert base["total_per_chip_mb"] == base["total_global_mb"]
    for name in ("txt_opt", "img_opt", "mi_opt", "params/text_model",
                 "params/image_model", "critic_params"):
        g, p = z["groups"][name]["global_mb"], z["groups"][name]["per_chip_mb"]
        assert p < 0.5 * g, (name, p, g)
    # with the largest-divisible-axis rule, conv-kernel trees shard too
    # (leading 3x3 spatial axes never divide dp)
    img = z["groups"]["img_opt"]
    assert img["per_chip_mb"] < 0.35 * img["global_mb"], img


def test_pp_resident_reduces_text_state():
    from mem_report import report
    r = report(_cfg(mesh_shape=(("data", 2), ("pipe", 2))),
               bert_config=TINY_BERT)
    for name in ("params/text_model", "txt_opt"):
        g, p = r["groups"][name]["global_mb"], r["groups"][name]["per_chip_mb"]
        assert p < g, (name, p, g)  # stacked layers rest 1/S per chip
    # non-text trees are replicated in this config
    assert r["groups"]["img_opt"]["per_chip_mb"] == \
        r["groups"]["img_opt"]["global_mb"]


def test_shard_fraction_reads_nested_specs():
    from jax.sharding import PartitionSpec as P
    from mem_report import _shard_fraction
    sizes = {"data": 4, "model": 2}
    assert _shard_fraction(P(), sizes) == 1
    assert _shard_fraction(P("data"), sizes) == 4
    assert _shard_fraction(P(None, "model"), sizes) == 2
    assert _shard_fraction(P(("data", "model")), sizes) == 8
    assert _shard_fraction(P(None, None, None, "data"), sizes) == 4


def test_ae_trainer_accounting():
    from mem_report import report
    r = report(_cfg(mesh_shape=(("data", 4),),
                    zero1_optimizer_sharding=True,
                    fsdp_parameter_sharding=True), trainer="ae")
    assert r["trainer"] == "ae"
    assert set(r["groups"]) == {"params", "batch_stats", "opt_state"}
    for name in ("params", "opt_state"):
        g, p = r["groups"][name]["global_mb"], r["groups"][name]["per_chip_mb"]
        assert p < 0.5 * g, (name, p, g)
    bs = r["groups"]["batch_stats"]
    assert bs["per_chip_mb"] == bs["global_mb"]
