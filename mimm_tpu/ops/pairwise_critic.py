"""Pallas TPU kernel: MI discriminator over all (image_i, text_j) pairs.

This is the framework's designated hot-path kernel (BASELINE.json
north-star): the reference materializes up to B^2 concatenated pair rows
with a Python loop of ``torch.cat`` calls and runs the 3-layer critic MLP
over a (B^2, 1536) matrix (reference main_utils.py:80-110 + model.py:18-48).

Math (layer-1 factorization, see objectives/pairing.py):

    S[i, j] = w3 . relu( W2 . relu( h_img[i] + h_txt[j] + b1 ) + b2 ) + b3
    h_img = X @ W1[:768],  h_txt = Y @ W1[768:]      (thin XLA matmuls)

Mosaic-friendly design: every in-kernel tensor is 2-D (Mosaic rejects the
(BI, BJ, H) -> (BI*BJ, H) shape cast).  The grid tiles (i, j); inside a
tile a ``fori_loop`` walks the BI image rows in CHUNKS of up to 8 rows,
forming a (CHUNK*BJ, H1) pair-activation matrix per iteration — the
flatten that Mosaic can't reshape is built with one-hot expansion
matmuls instead (R2 @ h_txt tiles the text rows; a chunk-dependent
one-hot R1c selects/broadcasts the image rows), so the critic's hidden
GEMM runs at M = CHUNK*BJ (512 at the production batch) instead of
M = BJ per row: ~8x fewer, ~8x fatter MXU dispatches than the original
per-row loop (which measured ~4x off the matmul roof at B=64).
Transposed contractions use ``dot_general`` dimension numbers instead
of transposes, and the kernel writes S^T tiles (scattered back through
the same one-hots) so no in-kernel transpose is needed; the host-side
wrapper transposes the (B, B) result with one cheap XLA op.

Backward: custom VJP with two recomputing Pallas kernels — grid (i, j)
accumulating d_h_img and the shared-weight grads (consecutive output
revisiting; shared accumulators zeroed only at the first grid step), and
grid (j, i) accumulating d_h_txt — plus thin XLA matmuls for the
W1/embedding gradients.  The upstream cotangent rides in through the
same expansion (A = R2 @ gT gives every row's candidate column; the
R1c mask + row-sum picks each pair row's scalar).  Gradients match the
pure-XLA path to float32 tolerance (tests/test_pallas_critic.py).

On non-TPU backends the kernels run in Pallas interpret mode, so the same
code path is unit-testable on the CPU mesh.

Measured truth (v5e, reference critic 1536->1024->512->1,
tools/bench_critic.py, scores+DV fwd+bwd+Adam, SCAN-CHAINED dispatch —
single-step dispatches of this ~0.3 ms sub-step are tunnel-latency
measurements, not kernel measurements; early single-dispatch numbers
that showed the kernel "winning" at B=64 were that artifact): XLA's
factorized path is faster at every batch size where its (BI, BJ, H1)
intermediate fits — 0.212 vs 0.327 ms/step at B=64, 5.63 vs 5.64 at
B=512 (kernel routed to XLA).  The kernel's value is MEMORY scaling:
the XLA intermediate grows as B^2 * H1 * 4 bytes (68 GB at B=4096)
while the kernel stays O(B * H1) VMEM-resident per tile.
``pairwise_critic_scores_pallas`` therefore dispatches to XLA whenever
the intermediate stays under ~8 GB and to the kernel beyond (or when
``force_kernel=True`` — tests).
"""

from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimm_tpu.ops.common import interpret as _interpret

logger = logging.getLogger(__name__)

# Per-tile: BI sequential (BJ, H1) pair-activation rows; each feeds the MXU
# as (BJ, H1) @ (H1, H2).  VMEM per tile ~ BJ*H1*4B + weights (~3 MB at the
# reference critic's H1=1024, BJ=512).
#
# Mosaic requires the OUTPUT tile's last dim (the i side of S^T) to be a
# multiple of 128 or the full array dim, and sublane dims to be multiples
# of 8 — so tile sizes adapt to the batch: small batches use one full-size
# block (zero tiling waste beyond 8-row padding), large batches tile at
# (MAX_BLOCK_I, MAX_BLOCK_J) = (128, 256).
MAX_BLOCK_I = 128
MAX_BLOCK_J = 256  # 512 blew the 16MB scoped-VMEM limit in the bwd kernel at B>=512


def _block_sizes(n_img: int, n_txt: int):
    # Full-batch blocks only while the backward kernel's live set (tiles +
    # weight/grad accumulators + temporaries) stays inside the ~16 MB VMEM
    # scoped limit; otherwise tile at (MAX_BLOCK_I, MAX_BLOCK_J).
    if n_img <= MAX_BLOCK_I:
        bi = -(-n_img // 8) * 8          # full (pad to sublane multiple)
    else:
        bi = MAX_BLOCK_I                  # tile (pad to 128 multiple)
    bj = -(-n_txt // 8) * 8 if n_txt <= MAX_BLOCK_J else MAX_BLOCK_J
    return bi, bj

_CONTRACT_ROWS = (((0,), (0,)), ((), ()))   # A^T B : contract leading dims
_CONTRACT_LAST = (((1,), (1,)), ((), ()))   # A B^T : contract trailing dims


def _pad_rows(x: jax.Array, block: int) -> jax.Array:
    pad = (-x.shape[0]) % block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


# ---------------------------------------------------------------------------
# Forward kernel: writes S^T tiles (BJ, BI)
# ---------------------------------------------------------------------------

def _chunk_rows(bi: int, bj: int) -> int:
    """Image rows per inner iteration: target ~512-row pair matrices
    (good MXU M) while dividing the (8-multiple) BI block exactly —
    powers of two <= 8 always divide it.  The loop bodies accumulate
    INTO the output refs (no fori_loop carries): carried accumulator
    arrays duplicate the refs they are flushed into and pushed the
    backward kernel to 17.7 MB scoped VMEM under the scanned train step
    (16 MB limit); halving the chunk instead measured 3.25 ms vs this
    version's 1.95 at B=64."""
    c = 1
    while c < 8 and c * 2 * bj <= 512:
        c *= 2
    return min(c, 8)


def _expanders(c, chunk, bi, bj):
    """One-hot expansion matrices for chunk ``c`` of the (BI, BJ) tile,
    pair rows ordered k = i_local*BJ + j:

    * R1c (N, BI): R1c[k, i] = 1 iff i == c*chunk + k//BJ — broadcasts
      image rows over the pair rows (and scatters back on transpose).
    * R2 (N, BJ):  R2[k, j] = 1 iff j == k %% BJ — tiles text rows.

    Chunks beyond the padded BI select nothing (all-zero rows), so the
    final ragged chunk contributes exactly zero everywhere.
    """
    n = chunk * bj
    k_i = jax.lax.broadcasted_iota(jnp.int32, (n, bi), 0)
    i_i = jax.lax.broadcasted_iota(jnp.int32, (n, bi), 1)
    r1 = (i_i == c * chunk + k_i // bj).astype(jnp.float32)
    k_j = jax.lax.broadcasted_iota(jnp.int32, (n, bj), 0)
    j_j = jax.lax.broadcasted_iota(jnp.int32, (n, bj), 1)
    r2 = (j_j == k_j % bj).astype(jnp.float32)
    return r1, r2


def _fwd_kernel(hi_ref, hj_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                outT_ref):
    hi = hi_ref[...]
    hj = hj_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]
    w3 = w3_ref[...]
    bi = hi.shape[0]
    bj = hj.shape[0]
    chunk = _chunk_rows(bi, bj)
    _, r2 = _expanders(0, chunk, bi, bj)
    tj = jax.lax.dot_general(r2, hj, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (N, H1)
    outT_ref[...] = jnp.full((bj, bi), b3_ref[0, 0], jnp.float32)

    def body(c, _):
        r1, _r2 = _expanders(c, chunk, bi, bj)
        hi_exp = jax.lax.dot_general(r1, hi, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        t = jax.nn.relu(tj + hi_exp + b1)                     # (N, H1)
        t2 = jax.nn.relu(
            jnp.dot(t, w2, preferred_element_type=jnp.float32) + b2)
        sc = jnp.dot(t2, w3, preferred_element_type=jnp.float32)  # (N, 1)
        # scatter: out[j, i] += sum_k R2[k, j] * sc[k] * R1c[k, i]
        outT_ref[...] += jax.lax.dot_general(
            r2, sc * r1, _CONTRACT_ROWS, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, bi // chunk, body, 0)


def _fwd_call(BLOCK_I, BLOCK_J, h_img, h_txt, b1, w2, b2, w3, b3):
    ni = h_img.shape[0] // BLOCK_I
    nj = h_txt.shape[0] // BLOCK_J
    h1 = h_img.shape[1]
    h2 = w2.shape[1]
    outT = pl.pallas_call(
        _fwd_kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((BLOCK_I, h1), lambda i, j: (i, 0)),
            pl.BlockSpec((BLOCK_J, h1), lambda i, j: (j, 0)),
            pl.BlockSpec((1, h1), lambda i, j: (0, 0)),
            pl.BlockSpec((h1, h2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h2), lambda i, j: (0, 0)),
            pl.BlockSpec((h2, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_J, BLOCK_I), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((h_txt.shape[0], h_img.shape[0]),
                                       jnp.float32),
        interpret=_interpret(),
    )(h_img, h_txt, b1, w2, b2, w3, b3)
    return outT


# ---------------------------------------------------------------------------
# Backward kernels (recompute per tile, accumulate)
# ---------------------------------------------------------------------------

def _bwd_img_kernel(hi_ref, hj_ref, b1_ref, w2_ref, b2_ref, w3_ref, gT_ref,
                    dhi_ref, dw2_ref, db2_ref, dw3_ref, db1_ref):
    """Grid (i, j): j innermost -> dhi (block i) and the shared-weight
    accumulators (same block every step) revisit consecutively."""
    i_blk = pl.program_id(0)
    j_blk = pl.program_id(1)

    @pl.when(j_blk == 0)
    def _():
        dhi_ref[...] = jnp.zeros_like(dhi_ref)

    @pl.when((i_blk == 0) & (j_blk == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    hi = hi_ref[...]
    hj = hj_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]
    w3 = w3_ref[...]
    gT = gT_ref[...]
    bi = hi.shape[0]
    chunk = _chunk_rows(bi, hj.shape[0])
    _, r2 = _expanders(0, chunk, bi, hj.shape[0])
    tj = jax.lax.dot_general(r2, hj, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (N, H1)
    # pair-row cotangent candidates: A[k, i] = gT[j(k), i] (loop-invariant)
    a = jax.lax.dot_general(r2, gT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (N, BI)

    def body(c, _):
        r1, _r2 = _expanders(c, chunk, bi, hj.shape[0])
        hi_exp = jax.lax.dot_general(r1, hi, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        t = jax.nn.relu(tj + hi_exp + b1)                        # (N, H1)
        z2 = jnp.dot(t, w2, preferred_element_type=jnp.float32) + b2
        t2 = jax.nn.relu(z2)
        g_rows = jnp.sum(a * r1, axis=1, keepdims=True)          # (N, 1)
        # dt2 = g w3^T : (N,1) x (H2,1) contracting last dims -> (N, H2)
        dt2 = jax.lax.dot_general(g_rows, w3, _CONTRACT_LAST,
                                  preferred_element_type=jnp.float32)
        dz2 = dt2 * (z2 > 0)
        # dt = dz2 w2^T : contract trailing dims -> (N, H1)
        dt = jax.lax.dot_general(dz2, w2, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32)
        dz1 = dt * (t > 0)
        # accumulate straight into the out refs — no carried copies
        dhi_ref[...] += jax.lax.dot_general(
            r1, dz1, _CONTRACT_ROWS,
            preferred_element_type=jnp.float32)                  # (BI, H1)
        dw2_ref[...] += jax.lax.dot_general(
            t, dz2, _CONTRACT_ROWS, preferred_element_type=jnp.float32)
        db2_ref[...] += jnp.sum(dz2, axis=0, keepdims=True)
        dw3_ref[...] += jax.lax.dot_general(
            t2, g_rows, _CONTRACT_ROWS, preferred_element_type=jnp.float32)
        db1_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, bi // chunk, body, 0)


def _bwd_txt_kernel(hi_ref, hj_ref, b1_ref, w2_ref, b2_ref, w3_ref, gT_ref,
                    dhj_ref):
    """Grid (j, i): i innermost -> dhj (block j) accumulates consecutively."""
    i_blk = pl.program_id(1)

    @pl.when(i_blk == 0)
    def _():
        dhj_ref[...] = jnp.zeros_like(dhj_ref)

    hi = hi_ref[...]
    hj = hj_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]
    w3 = w3_ref[...]
    gT = gT_ref[...]
    bi = hi.shape[0]
    bj = hj.shape[0]
    chunk = _chunk_rows(bi, bj)
    _, r2 = _expanders(0, chunk, bi, bj)
    tj = jax.lax.dot_general(r2, hj, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a = jax.lax.dot_general(r2, gT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    def body(c, _):
        r1, _r2 = _expanders(c, chunk, bi, bj)
        hi_exp = jax.lax.dot_general(r1, hi, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        t = jax.nn.relu(tj + hi_exp + b1)                        # (N, H1)
        z2 = jnp.dot(t, w2, preferred_element_type=jnp.float32) + b2
        g_rows = jnp.sum(a * r1, axis=1, keepdims=True)          # (N, 1)
        dt2 = jax.lax.dot_general(g_rows, w3, _CONTRACT_LAST,
                                  preferred_element_type=jnp.float32)
        dz2 = dt2 * (z2 > 0)
        dt = jax.lax.dot_general(dz2, w2, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32)
        dz1 = dt * (t > 0)
        # gather pair rows back onto their text rows: dhj[j] += sum_k R2[k,j] dz1[k]
        dhj_ref[...] += jax.lax.dot_general(r2, dz1, _CONTRACT_ROWS,
                                            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, bi // chunk, body, 0)


def _bwd_call(BLOCK_I, BLOCK_J, h_img, h_txt, b1, w2, b2, w3, gT):
    ni = h_img.shape[0] // BLOCK_I
    nj = h_txt.shape[0] // BLOCK_J
    h1 = h_img.shape[1]
    h2 = w2.shape[1]

    common = [
        pl.BlockSpec((BLOCK_I, h1), lambda i, j: (i, 0)),
        pl.BlockSpec((BLOCK_J, h1), lambda i, j: (j, 0)),
        pl.BlockSpec((1, h1), lambda i, j: (0, 0)),
        pl.BlockSpec((h1, h2), lambda i, j: (0, 0)),
        pl.BlockSpec((1, h2), lambda i, j: (0, 0)),
        pl.BlockSpec((h2, 1), lambda i, j: (0, 0)),
        pl.BlockSpec((BLOCK_J, BLOCK_I), lambda i, j: (j, i)),
    ]
    dhi, dw2, db2, dw3, db1 = pl.pallas_call(
        _bwd_img_kernel,
        grid=(ni, nj),
        in_specs=common,
        out_specs=[
            pl.BlockSpec((BLOCK_I, h1), lambda i, j: (i, 0)),
            pl.BlockSpec((h1, h2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h2), lambda i, j: (0, 0)),
            pl.BlockSpec((h2, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h1), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(h_img.shape, jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((1, h2), jnp.float32),
            jax.ShapeDtypeStruct((h2, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, h1), jnp.float32),
        ],
        interpret=_interpret(),
    )(h_img, h_txt, b1, w2, b2, w3, gT)

    swapped = [
        pl.BlockSpec((BLOCK_I, h1), lambda j, i: (i, 0)),
        pl.BlockSpec((BLOCK_J, h1), lambda j, i: (j, 0)),
        pl.BlockSpec((1, h1), lambda j, i: (0, 0)),
        pl.BlockSpec((h1, h2), lambda j, i: (0, 0)),
        pl.BlockSpec((1, h2), lambda j, i: (0, 0)),
        pl.BlockSpec((h2, 1), lambda j, i: (0, 0)),
        pl.BlockSpec((BLOCK_J, BLOCK_I), lambda j, i: (j, i)),
    ]
    dhj = pl.pallas_call(
        _bwd_txt_kernel,
        grid=(nj, ni),
        in_specs=swapped,
        out_specs=pl.BlockSpec((BLOCK_J, h1), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct(h_txt.shape, jnp.float32),
        interpret=_interpret(),
    )(h_img, h_txt, b1, w2, b2, w3, gT)

    db3 = jnp.sum(gT)
    return dhi, dhj, dw2, db2, dw3, db1, db3


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pair_scores_core(bi_blk, bj_blk, h_img, h_txt, b1, w2, b2, w3, b3):
    return _fwd_call(bi_blk, bj_blk, h_img, h_txt, b1, w2, b2, w3, b3)


def _core_fwd(bi_blk, bj_blk, h_img, h_txt, b1, w2, b2, w3, b3):
    return _fwd_call(bi_blk, bj_blk, h_img, h_txt, b1, w2, b2, w3, b3), \
        (h_img, h_txt, b1, w2, b2, w3)


def _core_bwd(bi_blk, bj_blk, res, gT):
    h_img, h_txt, b1, w2, b2, w3 = res
    dhi, dhj, dw2, db2, dw3, db1, db3 = _bwd_call(
        bi_blk, bj_blk, h_img, h_txt, b1, w2, b2, w3, gT.astype(jnp.float32))
    return dhi, dhj, db1, dw2, db2, dw3, db3.reshape(1, 1)


_pair_scores_core.defvjp(_core_fwd, _core_bwd)


def pairwise_critic_scores_pallas(params: List[dict], emb_img: jax.Array,
                                  emb_txt: jax.Array, *,
                                  force_kernel: bool = False) -> jax.Array:
    """Drop-in replacement for objectives.pairing.pairwise_critic_scores
    for the reference 3-layer critic shape (W1, W2, w3).  Dispatches to
    the XLA factorized path whenever it fits (it is faster there — see
    module docstring); the kernel serves non-materializable batch sizes.
    ``force_kernel`` pins the kernel path (parity tests)."""
    pairs = emb_img.shape[0] * emb_txt.shape[0]
    if len(params) != 3:
        # the kernel hard-codes the reference's 3-layer critic; any other
        # depth must not be a SILENT fallback — the XLA path materializes
        # the B^2 x H1 intermediate the kernel exists to avoid
        if force_kernel:
            raise ValueError(
                f"pairwise critic kernel supports exactly 3 layers, got "
                f"{len(params)} (force_kernel=True)")
        logger.warning(
            "pairwise critic kernel supports exactly 3 layers (got %d); "
            "using the XLA factorized path — its %d x H1 intermediate "
            "materializes in HBM", len(params), pairs)
        from mimm_tpu.objectives.pairing import pairwise_critic_scores
        return pairwise_critic_scores(params, emb_img, emb_txt)
    h1 = params[0]["w"].shape[1]
    xla_intermediate_bytes = pairs * h1 * 4
    if not force_kernel and xla_intermediate_bytes <= 8 * 1024 ** 3:
        from mimm_tpu.objectives.pairing import pairwise_critic_scores
        return pairwise_critic_scores(params, emb_img, emb_txt)

    d_img = emb_img.shape[-1]
    w1, b1 = params[0]["w"], params[0]["b"]
    w2, b2 = params[1]["w"], params[1]["b"]
    w3, b3 = params[2]["w"], params[2]["b"]

    emb_img = emb_img.astype(jnp.float32)
    emb_txt = emb_txt.astype(jnp.float32)
    h_img = emb_img @ w1[:d_img]                       # thin XLA matmuls;
    h_txt = emb_txt @ w1[d_img:]                       # autodiff covers W1/emb
    bi, bj = emb_img.shape[0], emb_txt.shape[0]
    bi_blk, bj_blk = _block_sizes(bi, bj)
    hi = _pad_rows(h_img, bi_blk)
    hj = _pad_rows(h_txt, bj_blk)
    scoresT = _pair_scores_core(
        bi_blk, bj_blk, hi, hj, b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32),
        w3.reshape(-1, 1).astype(jnp.float32),
        jnp.asarray(b3, jnp.float32).reshape(1, 1))
    return scoresT.T[:bi, :bj]
