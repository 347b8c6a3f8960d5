"""Pallas TPU flash attention with ALiBi bias (causal).

The reference materializes (B, H, T, T) attention (vap/modules.py:93-109),
which caps single-shot audio at ~164 s on a 24 GB GPU (run.py:223-229).
This kernel streams key/value blocks with the online-softmax recurrence, so
memory is O(T · d) and the single-shot ceiling moves to HBM-resident
feature length instead.

Layout: q, k, v are (B, H, T, Dh); the grid is (B*H, nq, nk) with the key
axis innermost — VMEM scratch (running max, sum, accumulator) carries
across nk iterations (TPU grid execution is sequential). Causal blocks
with ik > iq are skipped via `pl.when`.

Short-sequence fast path (T <= one block, i.e. every 20 s / 1000-frame
training and bench shape): with a single k-block the online-softmax
recurrence and its scratch are dead weight. `_single_block_kernel` packs
ALL H heads into one grid step per batch row (fori_loop, so Mosaic
reuses one set of score buffers) and computes the softmax directly — no
m/l/acc scratch. Measured v5e (B=64, H=4, T=1000, bf16): 3.00 vs 3.15
ms/pass for the general kernel — the pass is VPU-bound on the (T, T)
softmax elementwise chain, so the step-count reduction is a small win;
the structural simplification (no scratch, lower VMEM) is the point.

ALiBi: bias(i, j) = slope_h * (j - i) for j <= i. The reference's
`m_h * j` form (vap/modules.py:169-187) differs by a per-row constant that
softmax cancels, so probabilities are identical while our form keeps
logits <= 0 for numerical stability at long T.

Backward: custom VJP that recomputes attention densely in XLA — training
sequences are 1000 frames where O(T^2) is cheap; long-sequence use
(extraction/streaming) is inference-only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# measured on v5e (B=64, H=4, T=1000, bf16): 1024/1024 = 3.15 ms/pass vs
# 256/512 = 4.65, 512/512 = 3.89, and 5.29 for dense f32 XLA attention —
# bigger blocks amortize grid-step overhead; both clamp to the padded T
# for short sequences
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _flash_kernel(
    slope_ref,  # (B*H,) SMEM scalar-prefetch — per-(b,h) ALiBi slopes
    q_ref,      # (1, bq, dh) VMEM
    k_ref,      # (1, bk, dh) VMEM
    v_ref,      # (1, bk, dh) VMEM
    o_ref,      # (1, bq, dh) VMEM
    m_scr,      # (bq, 1) VMEM scratch — running max
    l_scr,      # (bq, 1) VMEM scratch — running sum
    acc_scr,    # (bq, dh) VMEM scratch — output accumulator
    *,
    scale: float,
    block_q: int,
    block_k: int,
):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    # last query row of this q-block determines which k-blocks contribute
    # (block_q and block_k may differ: the conditions must compare ROW
    # ranges, not block indices)
    q_last = iq * block_q + (block_q - 1)
    last_k = q_last // block_k  # index of the final contributing k-block

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(ik * block_k <= q_last)
    def _compute():
        q = q_ref[0]  # (bq, dh)
        k = k_ref[0]  # (bk, dh)
        v = v_ref[0]

        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)

        gq = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        gk = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        slope = slope_ref[bh]
        s = s + slope * (gk - gq).astype(s.dtype)
        s = jnp.where(gk <= gq, s, NEG_INF)

        m_prev = m_scr[:]                      # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                 # (bq, bk)
        corr = jnp.exp(m_prev - m_new)         # (bq, 1)

        l_scr[:] = corr * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = corr * acc_scr[:] + pv
        m_scr[:] = m_new

    @pl.when(ik == last_k)  # last contributing k-block for this q-block
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _single_block_kernel(
    slope_ref,  # (H,) SMEM scalar-prefetch — per-head ALiBi slopes
    q_ref,      # (1, H, Tp, dh) VMEM
    k_ref,      # (1, H, Tp, dh) VMEM
    v_ref,      # (1, H, Tp, dh) VMEM
    o_ref,      # (1, H, Tp, dh) VMEM
    *,
    scale: float,
    tp: int,
    n_heads: int,
):
    # broadcast-form bias/mask: (Tp, 1) row iota vs (1, Tp) lane iota —
    # never materializes (Tp, Tp) int32 index planes on the kernel stack
    gqi = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    gki = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    causal = gki <= gqi
    gq = gqi.astype(jnp.float32)
    gk = gki.astype(jnp.float32)

    def head_step(h, carry):
        q = q_ref[0, h]  # (Tp, dh)
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (Tp, Tp)
        slope = slope_ref[h]
        s = (s + slope * gk) - slope * gq
        s = jnp.where(causal, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = (pv / l).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, head_step, 0)


def _single_block_kernel_v2(
    slope_ref,  # (H,) SMEM scalar-prefetch — per-head ALiBi slopes
    q_ref,      # (1, H, Tp, dh) VMEM
    k_ref,      # (1, H, Tp, dh) VMEM
    v_ref,      # (1, H, Tp, dh) VMEM
    o_ref,      # (1, H, Tp, dh) VMEM
    *,
    scale: float,
    tp: int,
    n_heads: int,
):
    """Full-plane kernel with tri's analytic savings but no chunking: the
    (Tp, Tp) softmax chain is trimmed from ~6 plane ops (scale, +slope*gk,
    -slope*gq, causal where, -m, exp) to 4 (fused where(causal, s+bias),
    -m, exp2):

    * scale is folded into q before the MXU dot ((Tp, dh) work, not plane);
    * ALiBi's -slope*gq is a per-row constant that softmax cancels;
    * scores are built in log2 domain (scale*log2e into q, log2e into the
      slope) so the softmax uses raw exp2 instead of exp's hidden multiply.

    Measured v5e (B=64, H=4, T=1000, bf16): 3.44 ms/pass vs v1's
    2.84-3.4 and tri/512's 2.85-3.3 — all three within tunnel noise; the
    pass is VPU-bound on the (Tp, Tp) elementwise chain either way, so
    trimming two plane ops doesn't separate from v1. Kept selectable
    (VAP_FLASH_SINGLE_IMPL=v2); v1 stays the default.
    """
    f32 = jnp.float32
    gqi = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    gki = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    causal = gki <= gqi
    gk = gki.astype(f32)

    def head_step(h, carry):
        qs = (q_ref[0, h].astype(f32) * (scale * LOG2E)).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            qs, k_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # (Tp, Tp) log2-domain scores
        bias = (slope_ref[h] * LOG2E) * gk
        s = jnp.where(causal, s + bias, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        o_ref[0, h] = (pv / l).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, head_step, 0)


def _single_block_kernel_v3(
    slope_ref,  # (H,) SMEM scalar-prefetch — per-head ALiBi slopes
    q_ref,      # (1, H, Tp, dh) VMEM
    k_ref,      # (1, H, Tp, dh) VMEM
    v_ref,      # (1, H, Tp, dh) VMEM
    o_ref,      # (1, H, Tp, dh) VMEM
    *,
    scale: float,
    tp: int,
    n_heads: int,
):
    """v2 (exp2-domain) plus: the softmax denominator comes out of the PV
    matmul instead of a VPU plane reduction — V is extended in-kernel with
    a ones block ([v | 1], dh -> 2*dh lanes), so sum_j p_ij rides the MXU's
    already-padded N dimension (dh=64 pads to 128 anyway) and the separate
    jnp.sum over the (Tp, Tp) plane disappears."""
    f32 = jnp.float32
    gqi = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    gki = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    causal = gki <= gqi
    gk = gki.astype(f32)

    def head_step(h, carry):
        qs = (q_ref[0, h].astype(f32) * (scale * LOG2E)).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            qs, k_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # (Tp, Tp) log2-domain scores
        bias = (slope_ref[h] * LOG2E) * gk
        s = jnp.where(causal, s + bias, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m).astype(v_ref.dtype)
        v = v_ref[0, h]
        ve = jnp.concatenate([v, jnp.ones_like(v)], axis=-1)  # (Tp, 2*dh)
        pv = jax.lax.dot_general(
            p, ve,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (Tp, 2*dh): [:dh] = sum p v, [dh:] = sum p broadcast per lane
        dh = v.shape[-1]
        o_ref[0, h] = (pv[:, :dh] / pv[:, dh : dh + 1]).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, head_step, 0)


def _single_block_kernel_v4(
    slope_ref,  # (H,) SMEM scalar-prefetch — per-head ALiBi slopes
    q_ref,      # (1, H, Tp, dh) VMEM
    k_ref,      # (1, H, Tp, dh) VMEM
    v_ref,      # (1, H, Tp, dh) VMEM
    o_ref,      # (1, H, Tp, dh) VMEM
    *,
    scale: float,
    tp: int,
    n_heads: int,
):
    """bf16 score planes: the pass is bound by (Tp, Tp) plane traffic
    through VMEM, not MXU flops (v1/v2/v3/tri all tie; the MXU floor for
    this shape is ~0.2 ms vs ~3 ms measured), so the lever is BYTES — the
    score/weight planes are kept in bfloat16 end to end, halving every
    plane read/write. Composition:
    * log2-domain scores (v2): scale*log2e folded into q, exp2 softmax;
    * MXU output directly in bf16 (preferred_element_type) — the (Tp, Tp)
      f32->bf16 cast pass disappears;
    * denominator from the MXU via ones-extended V (v3): no VPU plane sum;
    * row max in bf16 (comparisons are exact; the m-shift keeps exp2 args
      small so bf16's 8-bit mantissa bounds per-weight error at ~0.4%).
    MEASURED AND REJECTED on v5e (B=64, H=4, T=1000): 3.33 ms/pass vs
    v3's 3.37 — no speedup (the VPU unpacks bf16 to f32 internally, so
    halving plane bytes doesn't halve plane time) — and max output error
    1.6 vs dense (the absolute ALiBi bias reaches slope*log2e*T ~ 360
    where bf16's quantum is 2, i.e. +-1 in log2 = 2x weight error). Kept
    selectable for the record; never auto-selected."""
    f32 = jnp.float32
    bf = jnp.bfloat16
    gqi = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    gki = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    causal = gki <= gqi
    gk = gki.astype(f32)

    def head_step(h, carry):
        qs = (q_ref[0, h].astype(f32) * (scale * LOG2E)).astype(q_ref.dtype)
        # Mosaic requires a 32-bit matmul accumulator; the bf16 cast rides
        # the epilogue so the STORED plane is 2 bytes/elem
        s = jax.lax.dot_general(
            qs, k_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(bf)  # (Tp, Tp) bf16 log2-domain scores
        bias = ((slope_ref[h] * LOG2E) * gk).astype(bf)  # (1, tp)
        s = jnp.where(causal, s + bias, bf(NEG_INF))
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2((s - m).astype(bf))
        v = v_ref[0, h]
        ve = jnp.concatenate([v, jnp.ones_like(v)], axis=-1)  # (Tp, 2*dh)
        pv = jax.lax.dot_general(
            p, ve,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dh = v.shape[-1]
        o_ref[0, h] = (pv[:, :dh] / pv[:, dh : dh + 1]).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, head_step, 0)


def _single_block_kernel_v5(
    slope_ref,  # (H,) SMEM scalar-prefetch — per-head ALiBi slopes
    q_ref,      # (1, H, Tp, dh) VMEM
    k_ref,      # (1, H, Tp, dh) VMEM
    v_ref,      # (1, H, Tp, dh) VMEM
    o_ref,      # (1, H, Tp, dh) VMEM
    d_scr,      # (Tp, Tp) f32 VMEM scratch — shared bias/mask plane
    *,
    scale: float,
    tp: int,
    n_heads: int,
):
    """Max-free single-pass softmax. SUPERSEDED BY MEASUREMENT before it
    ran: the matmuls-only floor (examples/bench_attn_mxu.py, B=64 H=4
    T=1000 bf16) takes 2.77 ms vs the full v1 kernel's 3.49 — the pass
    is bound by the (Tp, Tp) x Dh=64 matmul pair (K=64 systolic underfill
    + f32-accumulator plane traffic), so removing softmax traversals
    cannot recover more than ~0.7 ms; on hardware this variant also
    compiles pathologically (>12 min, killed). Kept as the record of the
    traversal-reduction design; v1 stays the default. Design notes:

    * NO row-max reduction: softmax is shifted by a Cauchy-Schwarz upper
      bound b_i = scale*log2e*||q_i||*max_j||k_j|| >= max_j s_ij, computed
      from (Tp, dh) norms — O(Tp*dh) work instead of a (Tp, Tp) plane
      read. All weights scale by the same 2^-(b_i - max_i), so the
      normalized output is exact; the bound is loose by a few log2 units
      at most, far inside f32 range (exactness vs v1 ~1e-7 f32).
    * ONE shared bias+mask plane: D = where(causal, gk - gq, -inf) is
      built once per batch row and reused by all H heads — the per-head
      chain is then a single fused traversal p = exp2(s + slope*D - b).
    * denominator from the MXU via ones-extended V (v3's trick): no VPU
      plane sum.

    Per-head plane traversals: MXU write s, fused exp2 read/write, PV
    read — ~3 vs v1's ~6."""
    f32 = jnp.float32
    gqi = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    gki = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    diff = (gki - gqi).astype(f32)  # <= 0 in the causal region
    d_scr[:] = jnp.where(gki <= gqi, diff, NEG_INF)

    def head_step(h, carry):
        q = q_ref[0, h]
        k = k_ref[0, h]
        qs = (q.astype(f32) * (scale * LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # (Tp, Tp) log2-domain scores
        # row bound: ||qs_i|| * max_j ||k_j|| >= max_j qs_i . k_j >= max s
        qn = jnp.sqrt(
            jnp.sum(qs.astype(f32) * qs.astype(f32), axis=1, keepdims=True)
        )  # (Tp, 1)
        kn2 = jnp.max(jnp.sum(k.astype(f32) * k.astype(f32), axis=1))
        b = qn * jnp.sqrt(kn2)  # (Tp, 1), >= row max of s
        slope = slope_ref[h] * LOG2E
        p = jnp.exp2(s + slope * d_scr[:] - b).astype(v_ref.dtype)
        v = v_ref[0, h]
        ve = jnp.concatenate([v, jnp.ones_like(v)], axis=-1)  # (Tp, 2*dh)
        pv = jax.lax.dot_general(
            p, ve,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dh = v.shape[-1]
        o_ref[0, h] = (pv[:, :dh] / pv[:, dh : dh + 1]).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, head_step, 0)


def _single_block_kernel_tri(
    slope_ref,  # (H,) SMEM scalar-prefetch — per-head ALiBi slopes
    q_ref,      # (1, H, Tp, dh) VMEM
    k_ref,      # (1, H, Tp, dh) VMEM
    v_ref,      # (1, H, Tp, dh) VMEM
    o_ref,      # (1, H, Tp, dh) VMEM
    *,
    scale: float,
    tp: int,
    n_heads: int,
    cs: int,
):
    """Triangle-chunked variant: query rows are processed in `cs`-row chunks
    and each chunk's scores only span keys [0, chunk_end) — the strictly
    masked upper-triangle tiles (~40% of the (Tp, Tp) plane at cs=256) are
    never computed. Two more plane ops drop out analytically:

    Measured v5e (B=64, H=4, T=1000, bf16, examples/bench_attention.py +
    a 6x25-iter alternating A/B): cs=128/256 LOSE to v1 (4.04/3.67 vs
    ~3.3 ms/pass); cs=512 TIES v1 (median 2.88 vs 2.91 across rounds —
    within tunnel noise; dense f32 XLA: 6.4). The pass is VPU-bound on
    the softmax elementwise chain, so halving the MXU tiles doesn't pay
    while the per-chunk loop overhead does. Kept selectable
    (VAP_FLASH_SINGLE_IMPL=tri, VAP_FLASH_CS) as the shape-dependent
    verdict may flip at larger T; v1 is the default (less padding waste
    below cs rows).

    * ALiBi's per-row term: softmax is shift-invariant per query row, so
      slope*(gk - gq) == slope*gk up to a row constant — the gq subtraction
      is skipped (the row max subtraction keeps exp in range either way).
    * exp2 domain: scores are built as log2-weights directly by folding
      scale*log2(e) into q and log2(e) into the slopes, so the softmax uses
      exp2 without the hidden *log2e multiply inside exp.

    Chunks are unrolled in Python (static shapes per chunk); padded key
    columns (T < Tp) always land in a chunk's diagonal region where the
    causal select zeroes them (Tp - cs < T by construction).
    """
    f32 = jnp.float32

    def head_step(h, carry):
        qs = (q_ref[0, h].astype(f32) * (scale * LOG2E)).astype(q_ref.dtype)
        slope = slope_ref[h] * LOG2E
        for ci in range(tp // cs):
            kend = (ci + 1) * cs
            s = jax.lax.dot_general(
                qs[ci * cs : kend], k_ref[0, h, :kend],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # (cs, kend) log2-domain scores
            gi = ci * cs + jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0)
            gj = jax.lax.broadcasted_iota(jnp.int32, (1, kend), 1)
            s = jnp.where(gj <= gi, s + slope * gj.astype(f32), NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, h, :kend],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o_ref[0, h, ci * cs : kend] = (pv / l).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, head_step, 0)


def _single_block_forward(q, k, v, slopes, scale):
    """All-heads-per-step path for T <= one block (no softmax scratch)."""
    B, H, T, Dh = q.shape
    impl = os.environ.get("VAP_FLASH_SINGLE_IMPL", "v1")
    cs = int(os.environ.get("VAP_FLASH_CS", "256"))
    mult = cs if impl == "tri" else 128
    tp = -(-T // mult) * mult
    pad = tp - T
    if pad:
        zp = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v = (jnp.pad(x, zp) for x in (q, k, v))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, tp, Dh), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, tp, Dh), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, tp, Dh), lambda b, *_: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, tp, Dh), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=(
            [pltpu.VMEM((tp, tp), jnp.float32)] if impl == "v5" else []
        ),
    )
    if impl == "tri":
        kernel = functools.partial(
            _single_block_kernel_tri, scale=scale, tp=tp, n_heads=H, cs=cs
        )
    elif impl == "v2":
        kernel = functools.partial(
            _single_block_kernel_v2, scale=scale, tp=tp, n_heads=H
        )
    elif impl == "v3":
        kernel = functools.partial(
            _single_block_kernel_v3, scale=scale, tp=tp, n_heads=H
        )
    elif impl == "v4":
        kernel = functools.partial(
            _single_block_kernel_v4, scale=scale, tp=tp, n_heads=H
        )
    elif impl == "v5":
        kernel = functools.partial(
            _single_block_kernel_v5, scale=scale, tp=tp, n_heads=H
        )
    else:
        kernel = functools.partial(
            _single_block_kernel, scale=scale, tp=tp, n_heads=H
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, tp, Dh), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(slopes.astype(jnp.float32), q, k, v)
    return out[:, :, :T] if pad else out


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, slopes: jax.Array, scale: float,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    B, H, T, Dh = q.shape
    assert k.shape == v.shape == (B, H, T, Dh)

    if T <= min(block_q, block_k) and 1 < H <= 8:
        return _single_block_forward(q, k, v, slopes, scale)

    # clamp blocks for short sequences (powers of two keep them divisible)
    t128 = -(-T // 128) * 128
    block_q = min(block_q, t128)
    block_k = min(block_k, t128)

    pad = (-T) % max(block_q, block_k)
    assert (T + pad) % block_q == 0 and (T + pad) % block_k == 0, (
        f"block_q={block_q}/block_k={block_k} must both divide the padded "
        f"length {T + pad} (use power-of-two blocks)"
    )
    if pad:
        # zero-pad time; padded queries produce garbage rows that we slice off,
        # padded keys are masked by causality (gk > gq for every real query)
        zp = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v = (jnp.pad(x, zp) for x in (q, k, v))
    Tp = T + pad

    bh = B * H
    qf = q.reshape(bh, Tp, Dh)
    kf = k.reshape(bh, Tp, Dh)
    vf = v.reshape(bh, Tp, Dh)
    slope_bh = jnp.broadcast_to(slopes[None, :], (B, H)).reshape(bh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, Tp // block_q, Tp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, i, j, *_: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, i, j, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_q=block_q, block_k=block_k
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, Tp, Dh), q.dtype),
        interpret=jax.default_backend() == "cpu",  # tests run interpreted
    )(slope_bh, qf, kf, vf)

    out = out.reshape(B, H, Tp, Dh)
    return out[:, :, :T] if pad else out


def _flash_offset_kernel(
    slope_ref,   # (B*H,) SMEM scalar-prefetch — per-(b,h) ALiBi slopes
    offset_ref,  # (1,) SMEM scalar-prefetch — global row index of q row 0
    q_ref,       # (1, bq, dh) VMEM
    k_ref,       # (1, bk, dh) VMEM
    v_ref,       # (1, bk, dh) VMEM
    o_ref,       # (1, bq, dh) VMEM
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    block_q: int,
    block_k: int,
):
    """_flash_kernel generalized to queries that sit at a dynamic global
    offset in a longer key timeline (context-parallel attention: this
    device's T_loc query rows attend the all-gathered T keys causally).
    Skip/finalize conditions compare global ROW ranges (block_q != block_k
    safe; see the block-index bug note in the module docstring)."""
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    off = offset_ref[0]

    q_last = off + iq * block_q + (block_q - 1)  # global last query row
    last_k = q_last // block_k

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(ik * block_k <= q_last)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        gq = (
            off
            + iq * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        )
        gk = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = s + slope_ref[bh] * (gk - gq).astype(s.dtype)
        s = jnp.where(gk <= gq, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = corr * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = corr * acc_scr[:] + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    @pl.when(ik == last_k)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def flash_alibi_attention_offset(
    q: jax.Array, k: jax.Array, v: jax.Array, slopes: jax.Array,
    scale: float, q_offset,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Flash attention for context parallelism: q is (B, H, Tq, Dh) local
    query rows starting at global row `q_offset` (traced scalar) of a
    (B, H, Tk, Dh) key/value timeline; causal + ALiBi in global indices.
    Inference-only (no VJP). Zero-padded tail keys fall at global indices
    >= Tk > every real query row, so causality masks them."""
    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    assert k.shape == v.shape == (B, H, Tk, Dh)
    block_q = min(block_q, -(-Tq // 128) * 128)
    block_k = min(block_k, -(-Tk // 128) * 128)
    pq = (-Tq) % block_q
    pk = (-Tk) % block_k
    if pq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, pq), (0, 0)])
    if pk:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pk), (0, 0)])
    Tqp, Tkp = Tq + pq, Tk + pk

    bh = B * H
    qf = q.reshape(bh, Tqp, Dh)
    kf = k.reshape(bh, Tkp, Dh)
    vf = v.reshape(bh, Tkp, Dh)
    slope_bh = jnp.broadcast_to(slopes[None, :], (B, H)).reshape(bh)
    off = jnp.asarray(q_offset, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, Tqp // block_q, Tkp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, i, j, *_: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, i, j, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_offset_kernel, scale=scale, block_q=block_q, block_k=block_k
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, Tqp, Dh), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(slope_bh, off, qf, kf, vf)
    out = out.reshape(B, H, Tqp, Dh)
    return out[:, :, :Tq] if pq else out


def _dense_reference(q, k, v, slopes, scale):
    """O(T^2) XLA attention with identical semantics (used for the VJP)."""
    T = q.shape[2]
    s = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    s = s + slopes[None, :, None, None] * (j - i)
    s = jnp.where(j <= i, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_alibi_attention(q, k, v, slopes, scale):
    return _flash_forward(q, k, v, slopes, scale)


def _fwd(q, k, v, slopes, scale):
    return _flash_forward(q, k, v, slopes, scale), (q, k, v, slopes)


def _bwd(scale, res, g):
    q, k, v, slopes = res
    _, vjp = jax.vjp(lambda q, k, v, s: _dense_reference(q, k, v, s, scale), q, k, v, slopes)
    return vjp(g)


flash_alibi_attention.defvjp(_fwd, _bwd)
