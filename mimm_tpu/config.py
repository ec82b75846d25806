"""Typed configuration for mimm_tpu.

Mirrors the reference's two argparse builders (reference:
``helpers.py:7-82`` ``construct_dataset_parameters`` and
``helpers.py:84-144`` ``construct_training_parameters``) so CLI invocations
of the reference translate 1:1, but as frozen dataclasses: sweeps are
expressed as explicit config products (``replace(cfg, ...)``) instead of
in-place Namespace mutation (the reference mutates ``args.save_directory``
cumulatively inside sweep loops — ``train.py:34,66,94`` — which we do not
reproduce).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass
from typing import Optional, Sequence

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _default(path: str) -> str:
    return os.path.join(_REPO_DIR, path)


@dataclass(frozen=True)
class DatasetConfig:
    """Dataset download / population flags (reference helpers.py:7-82)."""

    download_user: str = "user"
    download_password: str = "..."
    total_amount: int = 1_000_000
    amount_for_training: int = 9_000
    amount_for_testing: int = 1_000

    data_dir: str = _default("full_data_set/")
    image_storage_dir: str = _default("full_data_set/images/")
    text_storage_dir: str = _default("full_data_set/text/")

    training_data_dir: str = _default("training_data/")
    training_image_dir: str = _default("training_data/images/")
    training_text_dir: str = _default("training_data/text/")
    training_dataset_labeldata: str = _default("training_data/training_label_negbio.csv")

    testing_data_dir: str = _default("testing_data/")
    testing_image_dir: str = _default("testing_data/images/")
    testing_text_dir: str = _default("testing_data/text/")
    testing_dataset_labeldata: str = _default("testing_data/testing_label_negbio.csv")

    sub_folder: str = "p10"


# The reference sweep's classifier MLP architecture (train.py:52,
# validate.py:155) — the single source for the CLI sweep driver,
# validation, serving, and the serve bench (they must agree or
# checkpoint-apply fails with shape errors).
DEFAULT_CLASSIFIER_LAYERS = (1024, 512, 256, 128, 64, 32, 16)


@dataclass(frozen=True)
class TrainingConfig:
    """Training flags (reference helpers.py:84-144), plus TPU-native knobs.

    Field names and defaults match the reference argparse flags so that the
    CLI surface is drop-in compatible.  TPU-specific additions are grouped at
    the bottom and have no reference counterpart.
    """

    image_dir: str = _default("full_data_set/images/")
    text_data_dir: str = _default("training_data/text/")
    bert_pretrained_dir: str = _default("bert_pretrain_all_notes_150000")
    bert_config_name: str = "bert_config.json"
    save_directory: str = _default("save_dir")
    dataset_metadata: str = _default("training_data/training_label_negbio.csv")
    dataset_disease_stats: str = _default("training_data/disease_stats.csv")

    batch_size: int = 64
    data_loader_workers: int = 32
    num_train_epochs: int = 20
    num_train_epochs_classifier: int = 100
    # 'dv' | 'infonce' (both reference-parity vector forms) |
    # 'infonce_per_anchor' (textbook global-batch InfoNCE; no reference
    # counterpart — the reference's infonce is DV-without-log(N),
    # mi_critics.py:14-23)
    mi_estimator: str = "dv"
    init_lr: float = 1e-4
    max_seq_length: int = 320
    img_size: int = 256
    output_channels: int = 1
    image_model_name: str = "resnet256_6_2_1"
    disease_label: str = "Pneumonia"
    optimizer: str = "Adam"

    # ---- TPU-native knobs (no reference counterpart) ----
    # Random seed for params/augmentation/shuffling (reference relies on
    # unseeded global RNGs; we are deterministic by default).
    seed: int = 0
    # Compute dtype for the encoders ('bfloat16' keeps the MXU fed; params
    # and loss stay float32).
    compute_dtype: str = "bfloat16"
    # Data-parallel negatives: when True (default), the critic scores one
    # (B_global, B_global) matrix — under pjit the cross-chip all-gather of
    # embeddings comes out of XLA automatically.  When False, negatives are
    # drawn only within each data shard's block (the reference's
    # single-device pairing semantics at per-shard batch size; no gather
    # is emitted) and the loss is the mean over blocks (train/mi.py
    # make_mi_step_body).
    global_negatives: bool = True
    # Mesh shape as ((axis, size), ...) pairs — () = all devices on 'data'.
    # CLI: --mesh_shape data=4,model=2 (axes: 'data' dp; 'model' tp+sp;
    # 'pipe' pipeline parallelism — parallel/mesh.py, parallel/pipeline.py).
    mesh_shape: tuple = ()
    # MULTI-SLICE pods: per-axis factor that spans SLICES over DCN (axes
    # omitted = 1).  E.g. --mesh_shape data=8 --dcn_mesh_shape data=2 on
    # two v5e-8 slices = a global data=16 mesh whose single DCN hop sits
    # on the outermost stride (mesh_utils.create_hybrid_device_mesh, see
    # parallel/mesh.py make_mesh).  Keep 'model'/'pipe' ICI-only.
    dcn_mesh_shape: tuple = ()
    # Text-tower LR (the reference hard-codes 2e-5 at main_utils.py:167).
    bert_lr: float = 2e-5
    # Warmup fraction of total steps (reference main_utils.py:171: 0.1).
    warmup_fraction: float = 0.1
    # Host pipeline prefetch depth (device_put double buffering).
    prefetch: int = 2
    # Route pair scoring through ops/pairwise_critic.py, which picks the
    # XLA factorized path while its (B, B, H1) intermediate fits (faster
    # at every materializable batch — scan-chained timings, see the op's
    # docstring) and the VMEM-resident Pallas kernel beyond.
    use_pallas_critic: bool = True
    # Fused Pallas attention kernel (scores+softmax+dropout+context in
    # VMEM) for the text tower.  Applies only at sequence lengths >=
    # BertConfig.flash_min_seq_len (256): below that the XLA einsum path
    # measures faster on v5e (tools/bench_bert_variants.py).
    flash_attention: bool = True
    # Fine-tuning freeze options (reference model.py:83-89,490-495):
    # freeze_image_encoder trains only the ResNet's layer6 blocks + fc head;
    # freeze_text_encoder freezes the BERT trunk (classifier head trains).
    # Frozen params receive exactly zero updates (train/optim.py freeze()).
    freeze_image_encoder: bool = False
    freeze_text_encoder: bool = False
    # Space-to-depth compute schedule for the ResNet stem: the thin
    # 1->8ch/8->8ch stem convs run on a 2x2-block layout with kernels
    # derived from the canonical params in-flight — same function, same
    # parameter tree/checkpoints (models/resnet.py).  Perf knob only.
    s2d_stem: bool = False
    # uint8-threshold dropout masks in the text tower (models/bert.py
    # BertConfig.u8_dropout, ops/dropout.py): one random BYTE per
    # element instead of nn.Dropout's uint32 — fixes the L>128 dropout
    # step-time cliff on v5e (L=192 step 76.6 -> 63.1 ms, L=128 36.7 ->
    # 34.4; BERT_VARIANTS=cliff2 tools/bench_bert_variants.py).
    # Keep-probability resolution is 1/256 (p=0.1 realizes 0.8984 keep,
    # 0.17% off) — a disclosed approximation, same class as gelu_tanh;
    # parity preset keeps exact nn.Dropout.
    u8_dropout: bool = False
    # tanh-approximated GELU in the text tower (models/bert.py
    # BertConfig.gelu_tanh): 10-13% step saving on v5e; differs from the
    # reference's erf GELU by <= 1e-3 absolute (below bfloat16 working
    # precision for most inputs).  Parity/golden paths keep exact erf.
    gelu_tanh: bool = False
    # Storage dtype for the text-tower AdamW moment trees: 'float32'
    # (reference parity) or 'bfloat16' (production knob — the AdamW
    # update is HBM-bandwidth-bound at ~3.7 ms/step for bert-base on
    # v5e; bf16 moments halve the optimizer-state traffic and memory.
    # bf16 keeps f32's exponent range, so only mantissa precision drops;
    # the update math itself stays f32).  train/optim.py adamw_hf.
    adamw_moment_dtype: str = "float32"
    # Same knob for the torch-parity Adam towers (image encoder + MI
    # critic in the MI trainer; the AE trainer's single Adam): 'float32'
    # (reference parity — optax.adam, unchanged state structure) or
    # 'bfloat16' (production — train/optim.py adam_torch moment_dtype).
    adam_moment_dtype: str = "float32"
    # Fused FFN Pallas kernel in the text tower (models/bert.py
    # BertConfig.fused_ffn): GEMM->GELU->GEMM with weights resident in
    # VMEM; requires gelu_tanh.  Measured slower than the XLA FFN on
    # v5e (ops/fused_ffn.py docstring) — experiment, off by default.
    fused_ffn: bool = False
    # Pallas 9-shift kernel for the stem's shallow 1->8ch conv
    # (ops/shallow_conv.py).  Exact, but measured slower than the XLA
    # stem under device-bound timing — experiment, off by default.
    pallas_stem: bool = False
    # Compact host->device transfer: the loader ships un-normalized
    # integer image crops (uint8/uint16 — 2-4x fewer bytes than float32)
    # and narrow token dtypes; the jitted step widens + max-normalizes on
    # device with identical math (ops/image_norm.py, exact for integer
    # sources).  Halves/quarters the largest per-batch PCIe stream.
    compact_transfer: bool = True
    # Decoded-crop cache directory (data/crop_cache.py): decode each
    # full-resolution JPEG once and keep only the raw affine-support
    # window (~14% of the pixels); later epochs replace the ~87 ms/image
    # decode with a ~1 ms read, bit-identical outputs.  Empty = decode
    # every epoch (reference behavior, model_utils.py:80).
    decoded_crop_cache: str = ""
    # PRNG implementation for the per-step dropout keys ('unsafe_rbg' |
    # 'rbg' | 'threefry2x32').  The default uses the TPU hardware RNG:
    # threefry mask generation costs ~25% of a short-bucket BERT step on
    # v5e, and dropout semantics only need statistically-uniform masks.
    # Runs stay deterministic for a fixed seed (keys are typed and carry
    # their impl; nothing global changes).  Parity/golden tests run with
    # dropout disabled, so this knob never affects them.
    rng_impl: str = "unsafe_rbg"
    # Checkpoint cadence in epochs for the MI and AE Managers.  1 =
    # reference parity (every epoch writes the full native tree + the
    # .bin exports, main_utils.py:242-245,683-689); N > 1 writes every
    # Nth epoch (the final epoch always saves).  The .bin export is a
    # host-side device_get + pickle of every parameter — a real cost on
    # short epochs — and production runs rarely need per-epoch bins.
    checkpoint_every_epochs: int = 1
    # Sequence-length buckets for the paired loader (e.g. (64,96,128,192,320));
    # empty = reference behavior (every report padded to max_seq_length).
    # Real MIMIC reports average ~85 tokens, so bucketing cuts text-tower
    # work ~2.7x with identical attention-masked semantics.
    seq_buckets: tuple = ()
    # Chain this many same-shape train steps into ONE device dispatch via
    # lax.scan (train/mi.py make_mi_multi_step). Amortizes per-dispatch
    # overhead (~3-4 ms through the TPU tunnel). 1 = one dispatch per step.
    # Under bucketing, same-bucket batches are grouped into scan chunks,
    # which reorders batches WITHIN an epoch (equivalent to a different
    # shuffle; every batch is still consumed exactly once).
    scan_steps: int = 1
    # Trace this many train steps of the first running epoch with
    # jax.profiler into <save_directory>/profile/ (TensorBoard-loadable;
    # open with tensorboard --logdir).  The stop is preceded by a hard
    # device sync so the traced steps' device work is captured.  0 = off
    # (profiling adds per-step overhead — leave off in production).
    profile_steps: int = 0
    # Mirror every MetricWriter scalar into TensorBoard event files under
    # <save_directory>/tb/<run>/ (mimm_tpu/tbevents.py — dependency-free
    # tfevents encoding, loadable by stock TensorBoard).  JSONL + the
    # reference-format .log files are always written; this adds the
    # optional TensorBoard mirror SURVEY.md §5 calls for.
    tensorboard: bool = False
    # GradCache two-pass MI step (train/mi.py grad_cache_body): split the
    # batch into this many chunks, embed chunk-at-a-time (activations
    # freed between chunks), compute the full-batch (B, B) pairing loss on
    # the tiny embedding tables, then pull the embedding cotangents back
    # through a second chunked pass.  Negative pool spans the FULL batch
    # while tower activation memory is O(B / chunks) — contrastive batch
    # size is no longer bounded by HBM (~1.5x step compute).  1 = direct
    # single-pass step.  Composes with scan_steps and the mesh axes; each
    # chunk has DP-replica semantics (per-chunk BatchNorm/dropout keys).
    # The AE trainer honors the same knob with a SINGLE accumulation pass
    # (its MSE loss decomposes per sample — no two-pass trick needed).
    grad_cache_chunks: int = 1
    # Megatron-style SEQUENCE PARALLELISM for the text tower (requires a
    # 'model' mesh axis, i.e. tensor parallelism active): activations in
    # the LayerNorm/dropout/residual regions are sharded along the
    # sequence axis over 'model' (GSPMD turns each TP all-reduce into a
    # reduce-scatter + all-gather pair and the elementwise passes shard
    # too).  Same math — equivalence-tested against the replicated step
    # (tests/test_sharding.py).  No reference counterpart (single-device).
    sequence_parallel: bool = False
    # GPipe-style PIPELINE PARALLELISM for the text tower (requires a
    # 'pipe' mesh axis, e.g. mesh_shape {'data': 2, 'pipe': 4}): the BERT
    # encoder stack is split depth-wise into mesh['pipe'] stages and the
    # batch into this many microbatches (0 = one per stage), scheduled via
    # shard_map + ppermute (parallel/pipeline.py).  Same math and the same
    # checkpoint layout — equivalence-tested against the plain forward
    # (tests/test_pipeline_parallel.py).  No reference counterpart.
    pipeline_microbatches: int = 0
    # ZeRO-1 optimizer-state sharding over the 'data' mesh axis
    # (parallel/mesh.py zero1_shardings): each chip stores only its 1/dp
    # slice of the Adam/AdamW moment trees (~2 x params of f32 freed per
    # chip at dp=8 for bert-base) and the bandwidth-bound moment update
    # shards across the group, at the cost of an all-gather of the param
    # update.  Same math — equivalence-tested (tests/test_sharding.py).
    # Under tensor parallelism the text moments keep their TP layout;
    # under pipeline parallelism they keep the pp resident layout.
    # Honored by the MI and AE trainers.  No reference counterpart.
    zero1_optimizer_sharding: bool = False
    # FSDP/ZeRO-3-style PARAMETER sharding over 'data' (same placement
    # rule as zero1): params rest 1/dp per chip; GSPMD all-gathers each
    # tensor at its forward use and computes the update on the shard.
    # Combine with zero1_optimizer_sharding for the full ZeRO memory
    # ladder.  Same math — equivalence-tested (tests/test_sharding.py).
    # Under tensor parallelism the text tower/critic keep TP layouts.
    # Honored by the MI and AE trainers.  No reference counterpart.
    fsdp_parameter_sharding: bool = False
    # Gradient all-reduce dtype for data-parallel MI training: 'float32'
    # (default; the implicit GSPMD collective) or 'bfloat16' — the step's
    # gradient computation runs under an explicit shard_map over 'data'
    # and the cross-chip parameter-gradient all-reduce (the dominant pod
    # collective: ~468 MB f32/step for bert-base+ResNet+critic, ROUND2.md
    # cost model) runs on bf16 values, halving its bytes.  Same math up
    # to bf16 rounding of the gradient SUM (the update itself stays f32);
    # trajectory equivalence band-tested on the CPU mesh
    # (tests/test_sharding.py).  Image-tower BatchNorm runs as explicit
    # sync-BN (axis_name) so batch statistics stay global — identical to
    # the GSPMD step's implicit semantics.  Engages only on a pure-DP
    # mesh (no 'model'/'pipe' axis, no zero1/fsdp/grad-cache, global
    # negatives); other combos log a warning and keep f32.
    grad_allreduce_dtype: str = "float32"
    # Resume source for the MI/AE trainers: "" (fresh run), a path to a
    # native checkpoint (mi_epoch<N>.ckpt / ae_epoch<N>.ckpt /
    # *_preempt.ckpt — restores params + optimizer states + step and
    # continues, mid-epoch if the step is mid-epoch), or "auto" (resume
    # from <save_directory>/{mi,ae}_preempt.ckpt when one exists, else
    # start fresh — lets a scheduler restart the SAME command after a
    # preemption and have the run pick itself back up).
    resume_from: str = ""
    # Retention for NATIVE resume trees (mi_epoch<N>.ckpt /
    # ae_epoch<N>.ckpt): keep only the newest K after each save; 0 =
    # keep all (reference-parity packrat).  The reference-named .bin
    # exports are never pruned — they are the on-disk contract the
    # downstream stages and parity runs consume.
    keep_checkpoints: int = 0
    # Native checkpoint serialization: "pickle" (single file, one host),
    # "orbax" (directory; every process writes its own shards — required
    # and auto-forced for multi-host runs), or "orbax_async" (orbax with
    # background shard writing: the save returns after the on-device
    # snapshot and training continues while shards commit; trainers wait
    # for in-flight writes at the end of train()).
    checkpoint_format: str = "pickle"

    def replace(self, **kw) -> "TrainingConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def production(cls, **overrides) -> "TrainingConfig":
        """THE production configuration — the single source of truth for
        what bench.py measures, what the Managers' docs describe, and what
        MIGRATION.md tells reference users to run (``--preset production``).

        Numeric approximations it enables are disclosed in bench.py's
        docstring (bf16 compute, tanh GELU, bf16 optimizer moments);
        parity/golden tests all run the exact forms via ``parity()``."""
        return cls(**{**_PRODUCTION_OVERRIDES, **overrides})

    @classmethod
    def parity(cls, **overrides) -> "TrainingConfig":
        """Reference-parity configuration: exact erf GELU, f32 compute and
        optimizer moments, no bucketing/scan reordering, every report
        padded to max_seq_length (reference main_utils.py:120) — the
        numerics the torch-oracle trajectory goldens certify."""
        return cls(**{**_PARITY_OVERRIDES, **overrides})


# The production sequence buckets (paired-loader length classes).  bench.py's
# BUCKET_MIX keys must match these (tests/test_presets.py pins them together);
# tools/derive_buckets.py re-derives both for a new corpus.  Round 5 added
# the 160/256 buckets: the fixture-corpus mix is 0.9 ms/step cheaper, and
# the conservative (one-bucket-up) bound drops 50.7 -> 44.1 ms because the
# 97-128 class shifts to 160 instead of 192 and 161-192 to 256 instead of
# 320 (derive_buckets.py --per_bucket_ms scoring, conservative_step_ms).
PRODUCTION_SEQ_BUCKETS = (64, 96, 128, 160, 192, 256, 320)

# Single source of truth for the two named presets (TrainingConfig.production
# / .parity, CLI --preset).  Defaults not listed here are shared.
_PRODUCTION_OVERRIDES = dict(
    compute_dtype="bfloat16",
    gelu_tanh=True,                 # <=1e-3 abs GELU deviation, disclosed
    u8_dropout=True,                # 1/256 keep-prob resolution, disclosed
    adamw_moment_dtype="bfloat16",  # update math stays f32
    adam_moment_dtype="bfloat16",
    seq_buckets=PRODUCTION_SEQ_BUCKETS,
    scan_steps=8,                   # multi-step dispatch (neutral >=8)
    use_pallas_critic=True,
    flash_attention=True,           # engages at L >= flash_min_seq_len
    compact_transfer=True,
    rng_impl="unsafe_rbg",          # TPU hardware PRNG for dropout masks
)
_PARITY_OVERRIDES = dict(
    compute_dtype="float32",
    gelu_tanh=False,                # exact erf GELU
    adamw_moment_dtype="float32",
    adam_moment_dtype="float32",
    seq_buckets=(),                 # reference: pad everything to 320
    scan_steps=1,
    use_pallas_critic=False,
    flash_attention=False,
    compact_transfer=False,
    rng_impl="threefry2x32",
)


def _parse_mesh_shape(s: str) -> tuple:
    """``"data=4,model=2"`` -> (("data", 4), ("model", 2)).  Axis order is
    the mesh's major-to-minor device order (parallel/mesh.py make_mesh)."""
    if not s.strip():
        return ()
    pairs = []
    for part in s.split(","):
        name, _, size = part.partition("=")
        name = name.strip()
        if not name or not size.strip().isdigit() or int(size) < 1:
            raise argparse.ArgumentTypeError(
                f"--mesh_shape expects axis=size pairs with size >= 1, "
                f"e.g. 'data=4,model=2'; got {part!r}")
        if any(n == name for n, _ in pairs):
            raise argparse.ArgumentTypeError(
                f"--mesh_shape axis {name!r} given twice")
        pairs.append((name, int(size)))
    return tuple(pairs)


def _add_fields(parser: argparse.ArgumentParser, cfg) -> None:
    # default=SUPPRESS: the namespace holds ONLY flags the user actually
    # passed, so explicit flags override a --preset while everything else
    # takes the preset's values (help still shows the dataclass default).
    for f in dataclasses.fields(cfg):
        default = getattr(cfg, f.name)
        if f.name in ("mesh_shape", "dcn_mesh_shape"):
            parser.add_argument(f"--{f.name}", type=_parse_mesh_shape,
                                default=argparse.SUPPRESS,
                                help=f"(default: {default!r})")
            continue
        arg_type = type(default)
        if arg_type is bool:
            parser.add_argument(f"--{f.name}",
                                type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=argparse.SUPPRESS,
                                help=f"(default: {default!r})")
        elif arg_type is tuple:
            # comma-separated ints, e.g. --seq_buckets 64,128,192,320
            parser.add_argument(
                f"--{f.name}",
                type=lambda s: tuple(int(x) for x in s.split(",") if x.strip()),
                default=argparse.SUPPRESS, help=f"(default: {default!r})")
        else:
            parser.add_argument(f"--{f.name}", type=arg_type,
                                default=argparse.SUPPRESS,
                                help=f"(default: {default!r})")


def construct_training_parameters(argv: Optional[Sequence[str]] = None) -> TrainingConfig:
    """CLI-compatible with reference helpers.py:84-144, plus ``--preset
    {production,parity}``: start from the named preset, then apply any
    explicitly-passed flags on top."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=("production", "parity"),
                        default="",
                        help="named base config (TrainingConfig.production/"
                             ".parity); explicit flags override it")
    _add_fields(parser, TrainingConfig())
    ns = vars(parser.parse_args(argv))
    preset = ns.pop("preset", "")
    base = {"production": TrainingConfig.production,
            "parity": TrainingConfig.parity}.get(preset, TrainingConfig)()
    return base.replace(**ns)


def construct_dataset_parameters(argv: Optional[Sequence[str]] = None) -> DatasetConfig:
    """CLI-compatible with reference helpers.py:7-82."""
    parser = argparse.ArgumentParser()
    _add_fields(parser, DatasetConfig())
    ns = parser.parse_args(argv)
    return dataclasses.replace(DatasetConfig(), **vars(ns))
