"""Device mesh + sharding helpers — the TPU-native scaling layer.

The reference is single-device (SURVEY.md §2: no DP/TP/PP, no collectives).
Here, scaling is expressed with ``jax.sharding``: a Mesh over ICI, batches
sharded over the 'data' axis, params replicated (or sharded over 'model'
for tensor parallelism of the critic/BERT), and XLA inserts the
collectives.  Under jit, the MI score matrix over the global batch makes
cross-chip negatives automatic: embeddings sharded over 'data' feeding a
(B_global, B_global) computation compile to an all-gather over ICI —
exactly the design SURVEY.md §5 calls for, without hand-written NCCL-alikes.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bootstrap — the `jax.distributed.initialize` + mesh-over-
    ICI/DCN seam SURVEY.md §5/§7 calls for (the reference is single-device;
    this is a new capability).

    Opt in by setting ``MIMM_DISTRIBUTED=1`` (TPU pods: jax auto-discovers
    the coordinator, process count and id from the pod metadata, so no
    other configuration is needed) or by providing explicit
    coordinator/count/id — as arguments or via the
    ``MIMM_COORDINATOR_ADDRESS`` / ``MIMM_NUM_PROCESSES`` /
    ``MIMM_PROCESS_ID`` env vars (CPU/GPU fleets).  There is no reliable
    way to DETECT a pod without initializing a backend, and
    ``jax.distributed.initialize`` must run before any backend exists —
    hence the explicit opt-in rather than auto-detection.

    Returns True when the distributed runtime is (or already was)
    initialized; False for a plain single-process run — development,
    tests, and the single-chip driver all take that no-op path.  This
    function MUST NOT touch any backend-creating jax API (jax.devices,
    jax.process_count, ...) before calling initialize: in jax 0.9
    ``jax.distributed.initialize`` raises once a backend exists.
    After a successful init, ``jax.devices()`` is the GLOBAL device list
    and ``make_mesh`` builds pod-wide meshes from it unchanged.
    """
    import os

    from jax._src import distributed as _distributed
    if getattr(_distributed.global_state, "client", None) is not None:
        return True  # launcher already initialized the runtime
    coordinator_address = coordinator_address or \
        os.environ.get("MIMM_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("MIMM_NUM_PROCESSES"):
        num_processes = int(os.environ["MIMM_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MIMM_PROCESS_ID"):
        process_id = int(os.environ["MIMM_PROCESS_ID"])
    auto = os.environ.get("MIMM_DISTRIBUTED", "").lower() in ("1", "true",
                                                              "auto")
    if coordinator_address is None and num_processes is None and not auto:
        return False  # nothing indicates a multi-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices=None,
              dcn_mesh_shape: Optional[Dict[str, int]] = None) -> Mesh:
    """Build a mesh.  Default: all local devices on the 'data' axis.
    ``mesh_shape`` e.g. {'data': 4, 'model': 2}.

    On real TPU topologies the device order matters: axes that carry the
    heaviest collectives should ride contiguous ICI links.
    ``mesh_utils.create_device_mesh`` assigns devices to mesh coordinates
    from the physical coords (ring/torus aware); we use it whenever the
    requested mesh covers all devices, and fall back to a plain reshape
    for partial meshes or host/virtual platforms it cannot handle.

    MULTI-SLICE pods (slices joined by DCN, not ICI): pass
    ``dcn_mesh_shape`` — the per-axis factor that spans SLICES (e.g.
    ``mesh_shape={'data': 8, 'model': 1}, dcn_mesh_shape={'data': 2}``
    on 2 v5e-8 slices = a global {'data': 16} mesh whose data axis
    crosses the DCN boundary exactly once).  Implemented with
    ``mesh_utils.create_hybrid_device_mesh`` so the DCN hop lands on the
    OUTERMOST stride of the axis: per-step collectives decompose into
    intra-slice ICI phases plus one inter-slice DCN phase, instead of
    every hop riding DCN (the scaling-book recipe: gradient all-reduce
    = ICI reduce-scatter -> DCN all-reduce on 1/slice of the bytes ->
    ICI all-gather).  Put ONLY the data axis on DCN — 'model'/'pipe'
    collectives are latency-bound and must stay inside a slice.  Axes
    omitted from ``dcn_mesh_shape`` default to 1 (ICI-only)."""
    devices = devices if devices is not None else jax.devices()
    if dcn_mesh_shape and not mesh_shape:
        raise ValueError("dcn_mesh_shape requires an explicit mesh_shape "
                         "(the per-slice ICI factors)")
    if not mesh_shape:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    names = tuple(mesh_shape.keys())
    dims = tuple(mesh_shape.values())
    if dcn_mesh_shape:
        unknown = set(dcn_mesh_shape) - set(names)
        if unknown:
            raise ValueError(f"dcn_mesh_shape axes {sorted(unknown)} not in "
                             f"mesh_shape {names}")
        dcn_dims = tuple(dcn_mesh_shape.get(a, 1) for a in names)
        total = tuple(i * d for i, d in zip(dims, dcn_dims))
        n = int(np.prod(total))
        if n != len(devices):
            raise ValueError(
                f"hybrid mesh {mesh_shape} x DCN {dcn_mesh_shape} needs "
                f"{n} devices, have {len(devices)}")
        try:
            from jax.experimental import mesh_utils
            return Mesh(mesh_utils.create_hybrid_device_mesh(
                dims, dcn_dims, devices=devices), names)
        except Exception as e:
            # no slice structure (single slice / virtual platform): the
            # hybrid layout degenerates to an ordinary mesh of the total
            # shape.  Warned because on a REAL multi-slice pod this
            # ordering would put ICI-sized strides on DCN.
            logger.warning(
                "create_hybrid_device_mesh failed (%s); building a plain "
                "%s mesh — fine on one slice, but on a multi-slice pod "
                "DCN hops would land mid-axis", e, dict(zip(names, total)))
            dims = total
        n = int(np.prod(dims))
        return Mesh(np.asarray(devices[:n]).reshape(dims), names)
    n = int(np.prod(dims))
    if n > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices, have {len(devices)}")
    if n == len(devices):
        try:
            from jax.experimental import mesh_utils
            return Mesh(mesh_utils.create_device_mesh(dims, devices=devices),
                        names)
        except Exception as e:
            # virtual/host platforms without coords: plain reshape below.
            # Logged because on REAL pods losing the ICI-aware ordering
            # silently costs collective bandwidth.
            logger.warning("mesh_utils.create_device_mesh failed (%s); "
                           "falling back to enumeration-order reshape — "
                           "'%s'-axis collectives may not ride contiguous "
                           "ICI links", e, names[-1])
    return Mesh(np.asarray(devices[:n]).reshape(dims), names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (K, B, ...) scan super-batch: the scan axis K is
    replicated (it is consumed sequentially by lax.scan), the batch dim
    is sharded over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(batch, sharding, full: bool = False):
    """Materialize a (possibly multi-host) on-device tree.

    Single-process: a plain ``device_put``.  Multi-process (after
    ``initialize_distributed``): built on
    ``jax.make_array_from_process_local_data`` — a plain ``device_put``
    would raise for shardings spanning non-addressable devices.

    ``full=False`` (input batches): every process holds only ITS slice of
    the global batch (the Loader's ``process_count``/``process_index``
    slicing); the global shape is inferred from the slice + sharding.
    ``full=True`` (params/optimizer trees): every process holds the FULL
    array (e.g. identical model init); the explicit ``global_shape``
    makes each process slice out just its addressable shards.

    ``sharding`` may be a single NamedSharding for the whole tree or a
    tree of NamedShardings matching ``batch``."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)

    def put_leaf(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, global_shape=x.shape if full else None)

    if isinstance(sharding, jax.sharding.Sharding):
        return jax.tree.map(lambda x: put_leaf(x, sharding), batch)
    return jax.tree.map(put_leaf, batch, sharding)


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Put a host batch on device with the leading dim sharded over 'data'."""
    return put_global(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return put_global(tree, replicated(mesh), full=True)


def seq_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """Activation sharding for Megatron-style SEQUENCE PARALLELISM in the
    text tower: (B, L, H) activations in the LayerNorm/dropout/residual
    regions shard the sequence axis over 'model' (batch stays on 'data').
    GSPMD then lowers each tensor-parallel all-reduce at a row-parallel
    boundary into a reduce-scatter + (all-gather before the next
    column-parallel matmul), and the elementwise LN/dropout work shards
    over 'model' instead of being replicated.  Returns None when the mesh
    has no 'model' axis (SP without TP has no all-reduce to split).

    No reference counterpart (the reference is single-device, SURVEY.md
    §2).  Pipeline parallelism lives in parallel/pipeline.py (GPipe
    schedule over a 'pipe' mesh axis); expert parallelism is deliberately
    absent — this model family has no MoE structure to shard.
    """
    if MODEL_AXIS not in mesh.axis_names:
        return None
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))


def bert_tp_shardings(mesh: Mesh, text_params):
    """Tensor-parallel PartitionSpecs for the TextBert param tree over
    'model' (Megatron-style; no reference counterpart — the reference is
    single-device, SURVEY.md §2):

    * attention query/key/value and FFN ``intermediate`` kernels are
      COLUMN-parallel ``P(None, 'model')`` (their biases shard with the
      output features) — each shard computes a head/neuron slice;
    * ``attention_output`` and FFN ``output`` kernels are ROW-parallel
      ``P('model', None)`` (biases replicated) — XLA inserts the
      reduce at the row-parallel boundary;
    * embeddings, LayerNorms, pooler, and classifier head replicate.

    Head slicing stays aligned because ``num_attention_heads`` (12) is
    divisible by the 'model' axis size for the meshes we build (2/4-way).
    Returns a PartitionSpec pytree with the same structure as
    ``text_params`` (identity specs when the mesh has no 'model' axis).
    """
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree.map(lambda _: P(), text_params)
    col_modules = {"query", "key", "value", "intermediate"}
    row_modules = {"attention_output", "output"}

    def spec_for(path, _leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if len(names) >= 2:
            module, leaf = names[-2], names[-1]
            if module in col_modules:
                return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
            if module in row_modules and leaf == "kernel":
                return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, text_params)


def shard_mi_state(mesh: Mesh, state, zero1: bool = False,
                   fsdp: bool = False):
    """Place an MITrainState on the mesh: batch-independent trees
    replicate; when the mesh has a 'model' axis the critic goes
    tensor-parallel (``critic_tp_shardings``) and the BERT text tower
    Megatron-style (``bert_tp_shardings``).  Optimizer moment trees start
    replicated — XLA re-shards them to match their params on the first
    update (they are donated, so no stale replicated copy survives).

    ``zero1=True`` (cfg.zero1_optimizer_sharding): moment trees instead
    start 'data'-sharded per :func:`zero1_shardings`, and the train step
    re-constrains them so the layout is stable across steps.  Under
    tensor parallelism the TEXT moments keep following their TP params
    (mixing dim-0 data-sharding with TP column/row shardings would need
    per-leaf composite specs — not worth it for the 2/4-way meshes here);
    zero1 then applies to the image tower + critic moments only.

    ``fsdp=True`` (cfg.fsdp_parameter_sharding): PARAMETERS also rest
    'data'-sharded (same placement rule) — FSDP/ZeRO-3 as shardings.
    Under tensor parallelism the text tower + critic keep their TP
    layouts; fsdp then applies to the image tower params only.

    PIPELINE-parallel RESIDENT layout: when the state was restacked via
    ``parallel.pipeline.stack_resident_text_state`` and the mesh has a
    'pipe' axis, the text params AND the text moment trees rest
    'pipe'-sharded on their stacked-layer axis (1/S per chip,
    ``pp_resident_shardings``); zero1/fsdp then apply to the image tower
    + critic only (mirroring the tp rule).

    The placement RULES live in :func:`mi_state_specs` (also used by
    ``tools/mem_report.py`` for device-free memory accounting); this
    function just materializes them.  put_global (not device_put): on
    multi-host meshes TP/pp shardings span non-addressable devices and
    every process holds the full identically-initialized arrays
    (full=True)."""
    specs = mi_state_specs(mesh, state, zero1=zero1, fsdp=fsdp)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return type(state)(**put_global(state._asdict(), shardings._asdict(),
                                    full=True))


def mi_state_specs(mesh: Mesh, state, zero1: bool = False,
                   fsdp: bool = False):
    """The MITrainState placement rules as a PartitionSpec tree (same
    structure as the state).  See :func:`shard_mi_state` for semantics.
    Needs only ``mesh.axis_names`` / ``mesh.devices.shape`` — no devices
    are touched, so it also works with a lightweight mesh stand-in for
    offline memory accounting (tools/mem_report.py)."""
    from mimm_tpu.parallel.pipeline import (PIPE_AXIS, is_stacked_text,
                                            pp_resident_shardings)
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)
    z = lambda tree: zero1_shardings(mesh, tree)
    opt_specs = z if zero1 else rep
    param_specs = z if fsdp else rep
    tp = MODEL_AXIS in mesh.axis_names
    pp_resident = PIPE_AXIS in mesh.axis_names and \
        is_stacked_text(state.params["text_model"])
    if pp_resident:
        text_p = pp_resident_shardings(mesh, state.params["text_model"])
        txt_opt = pp_resident_shardings(mesh, state.txt_opt)
        critic = param_specs(state.critic_params)
    elif tp:
        text_p = bert_tp_shardings(mesh, state.params["text_model"])
        txt_opt = rep(state.txt_opt)  # follows its TP params on 1st update
        critic = critic_tp_shardings(mesh, state.critic_params)
    else:
        text_p = param_specs(state.params["text_model"])
        txt_opt = opt_specs(state.txt_opt)
        critic = param_specs(state.critic_params)
    return type(state)(
        params={"image_model": param_specs(state.params["image_model"]),
                "text_model": text_p},
        batch_stats=rep(state.batch_stats),
        critic_params=critic,
        img_opt=opt_specs(state.img_opt),
        mi_opt=opt_specs(state.mi_opt),
        txt_opt=txt_opt,
        step=P())


def shard_ae_state(mesh: Mesh, state, zero1: bool = False,
                   fsdp: bool = False):
    """Place an AETrainState on the mesh (train/ae.py): replicated by
    default; ``zero1`` rests the Adam moment tree 'data'-sharded and
    ``fsdp`` the params too (same :func:`zero1_shardings` placement rule
    and semantics as the MI trainer's ZeRO ladder)."""
    put = lambda tree: put_global(
        tree, jax.tree.map(lambda s: NamedSharding(mesh, s),
                           zero1_shardings(mesh, tree),
                           is_leaf=lambda x: isinstance(x, P)), full=True)
    return state._replace(
        params=put(state.params) if fsdp else replicate(mesh, state.params),
        batch_stats=replicate(mesh, state.batch_stats),
        opt_state=put(state.opt_state) if zero1
        else replicate(mesh, state.opt_state),
        step=replicate(mesh, state.step))


def zero1_shardings(mesh: Mesh, tree):
    """ZeRO-1 style optimizer-state placement: shard the LARGEST
    'data'-divisible axis of every moment-tree leaf (ties break toward
    the leading axis), replicate the rest (scalars, odd shapes).  Matmul
    kernels shard their leading (in-features) axis exactly as before;
    picking the largest divisible axis additionally covers conv kernels,
    whose leading axes are spatial (3, 3, c_in, c_out) and never
    divisible — with a leading-axis-only rule the whole image tower
    stayed replicated (found via tools/mem_report.py accounting).
    With these placements pinned on the optimizer
    states (and re-constrained inside the train step), GSPMD partitions
    the bandwidth-bound moment update across the data-parallel group and
    each chip stores only its 1/dp slice of the Adam/AdamW moments —
    ~2 x params of f32 freed per chip at dp=8 for bert-base — at the cost
    of an all-gather of the (sharded) param update.  The classic ZeRO-1
    recipe (Rajbhandari et al. 2020), expressed as shardings instead of
    hand-written collectives.  No reference counterpart (single-device).

    The same placement rule doubles as the FSDP/ZeRO-3 PARAMETER layout
    (cfg.fsdp_parameter_sharding): params rest 'data'-sharded, GSPMD
    all-gathers each tensor where the forward consumes it (freeing the
    gathered copy after its uses — tensor-granularity lifetime, like
    FSDP's gather-per-module), and the param update is computed on the
    shard.  At-rest param memory drops to 1/dp per chip.
    """
    d = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)

    def spec(x):
        shape = getattr(x, "shape", None)
        if d > 1 and shape:
            best = None
            for i, s in enumerate(shape):
                if s % d == 0 and (best is None or s > shape[best]):
                    best = i
            if best is not None:
                return P(*([None] * best + [DATA_AXIS]))
        return P()

    return jax.tree.map(spec, tree)


def critic_tp_shardings(mesh: Mesh, critic_params) -> Tuple:
    """Tensor-parallel layout for the MI discriminator over 'model':
    layer 0 column-parallel (hidden sharded), layer 1 row-parallel, rest
    replicated.  Returns a pytree of PartitionSpecs matching the params.
    Used when the mesh has a 'model' axis; XLA inserts the reduce at the
    row-parallel boundary."""
    if MODEL_AXIS not in mesh.axis_names:
        return jax.tree.map(lambda _: P(), critic_params)
    specs = []
    n = len(critic_params)
    for i in range(n):
        if i == 0:
            specs.append({"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)})
        elif i == 1:
            specs.append({"w": P(MODEL_AXIS, None), "b": P()})
        else:
            specs.append({"w": P(), "b": P()})
    return specs
