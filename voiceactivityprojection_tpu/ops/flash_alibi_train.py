"""Training-path Pallas flash attention: ALiBi + causal + in-kernel
attention DROPOUT, with a flash (blockwise, recomputing) backward.

Why: the reference trains with attention dropout on materialized
(B, H, T, T) weights (vap/modules.py:104-108), and our dense path mirrors
that — the score/weight/mask arrays are the top HBM traffic of the
training step (B=16, H=4, T=1000: 256 MB f32 per array per pass, ~14
attention passes forward + backward). This module keeps everything
blockwise: forward saves only `out` and the per-row logsumexp; backward
recomputes scores per block (FlashAttention-2 style) and regenerates the
dropout mask from a counter-based hash instead of storing it.

Dropout mask: `lowbias32`-style integer hash of the GLOBAL (batch*head,
query row, key col) coordinates mixed with a per-call seed — plain VPU
integer ops (pltpu PRNG primitives have no interpret-mode lowering, and a
coordinate hash regenerates identically under ANY block shape, so the
backward kernels never need the forward's blocking). keep = hash >= rate
as a uint32 threshold; applied to the unnormalized exp BEFORE the value
accumulation while the softmax denominator keeps the full sum — equal to
dropping normalized weights as the reference does.

Gradient identities (W = softmax(S), Y = mask . W / keep, out = Y V):
  dV = Y^T dO
  dP = dO V^T ; dW = mask . dP / keep
  dS = W . (dW - delta),  delta = rowsum(dO . out)   [holds WITH dropout:
       rowsum(dW . W) = rowsum(dP . Y) = rowsum(dO . out)]
  dQ = scale . dS K ; dK = scale . dS^T Q
ALiBi slopes get no gradient (requires_grad=False in the reference,
modules.py:116-121).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# per-row stats (lse, delta) are stored replicated across a 128-lane minor
# dim: Mosaic requires output/input block minor dims of (8k, 128) or the
# full array dim, and a (1, block_q) row-vector block satisfies neither
# (same layout as jax.experimental.pallas.ops.tpu.flash_attention's l/m)
LANES = 128
# one block pair per (b,h) at the 1024-frame training shape: measured on
# v5e the 1024/1024 blocking beats smaller blocks for the forward (grid
# overhead dominates). Dtype-aware BACKWARD blocking: at f32 the dkv
# backward's double-buffered 1024-blocks exceed the 16 MB scoped-VMEM
# limit (observed: 16.20M vs 16.00M on a v5e train step at B=16, T=1000),
# so the backward halves block_k for 4-byte dtypes; the forward keeps the
# measured-optimal full blocks.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024


def _bwd_blocks(dtype) -> tuple:
    if jnp.dtype(dtype).itemsize >= 4:
        return DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K // 2
    return DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K


def _clamp_blocks(T: int, block_q: int, block_k: int) -> tuple:
    """Clamp blocks to the 128-padded length and keep block_k a DIVISOR
    of block_q, so padding to a block_q multiple satisfies both grid
    divisibility constraints (t128 is a multiple of 128, not necessarily
    a power of two: T=750 -> t128=768, and 512 does not divide 768 —
    gcd(768, 512)=256 does)."""
    t128 = -(-T // 128) * 128
    block_q = min(block_q, t128)
    block_k = min(block_k, t128)
    if block_q % block_k:
        block_k = math.gcd(block_q, block_k)
    return block_q, block_k


def _hash_keep(gbh, gq, gk, seed, thresh):
    """lowbias32 avalanche hash over global coords -> keep mask.

    All inputs int32/uint32 arrays or scalars; returns bool (gq.shape).
    Runs identically as plain jnp (tests, mask oracle) and inside Pallas.
    """
    u = jnp.uint32
    x = (
        gbh.astype(u) * u(0x9E3779B1)
        + gq.astype(u) * u(0x85EBCA6B)
        + gk.astype(u) * u(0xC2B2AE35)
        + seed.astype(u)
    )
    x = x ^ (x >> u(16))
    x = x * u(0x7FEB352D)
    x = x ^ (x >> u(15))
    x = x * u(0x846CA68B)
    x = x ^ (x >> u(16))
    return x >= thresh.astype(u)


def _rate_threshold(rate: float) -> np.uint32:
    # P(hash < thresh) = rate for uniform uint32
    return np.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))


def dropout_mask_reference(seed, bh_index, T: int, rate: float):
    """(T, T) keep mask for one (batch*head) slice — the oracle the
    kernels must reproduce (tests diff dense-with-this-mask vs flash)."""
    gq = jnp.arange(T, dtype=jnp.int32)[:, None]
    gk = jnp.arange(T, dtype=jnp.int32)[None, :]
    return _hash_keep(
        jnp.int32(bh_index), gq, gk, seed, jnp.uint32(_rate_threshold(rate))
    )


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    slope_ref,  # (bh,) SMEM prefetch
    seed_ref,   # (1,) SMEM prefetch
    q_ref, k_ref, v_ref,          # (1, blk, dh) VMEM
    o_ref,                        # (1, bq, dh)
    lse_ref,                      # (1, bq, LANES) — row value replicated
    m_scr, l_scr, acc_scr,
    *, scale, block_q, block_k, rate,
):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    q_last = iq * block_q + (block_q - 1)
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
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        gq = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        gk = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = s + slope_ref[bh] * (gk - gq).astype(s.dtype)
        s = jnp.where(gk <= gq, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = corr * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _hash_keep(
                bh, gq, gk, seed_ref[0], jnp.uint32(_rate_threshold(rate))
            )
            p = jnp.where(keep, p, 0.0)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = corr * acc_scr[:] + pv
        m_scr[:] = m_new

    @pl.when(ik == last_k)
    def _finalize():
        inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
        o_ref[0] = (acc_scr[:] * inv / l_scr[:]).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_scr[:] + jnp.log(l_scr[:]), (block_q, LANES)
        )


def _flash_train_forward(q, k, v, slopes, seed, scale, rate,
                         block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K):
    B, H, T, Dh = q.shape
    block_q, block_k = _clamp_blocks(T, block_q, block_k)
    pad = (-T) % block_q  # block_k divides block_q (see _clamp_blocks)
    assert (T + pad) % block_q == 0 and (T + pad) % block_k == 0, (
        f"block_q={block_q}/block_k={block_k} must both divide the padded "
        f"length {T + pad}"
    )
    if pad:
        zp = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v = (jnp.pad(x, zp) for x in (q, k, v))
    Tp = T + pad
    bh = B * H
    qf, kf, vf = (x.reshape(bh, Tp, Dh) for x in (q, k, v))
    slope_bh = jnp.broadcast_to(slopes[None, :], (B, H)).reshape(bh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, Tp // block_q, Tp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dh), lambda b, i, j, *_: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j, *_: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
            rate=rate,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((bh, Tp, LANES), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(slope_bh, seed.reshape(1), qf, kf, vf)
    out = out.reshape(B, H, Tp, Dh)
    # slice BOTH to T: the backward re-pads for its own blocking (zero-padded
    # lse rows are harmless — padded dO rows are zero, so their w never mixes)
    return (out[:, :, :T] if pad else out), lse[:, :T, 0]


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_dq_kernel(
    slope_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref,   # (1, blk, dh)
    lse_ref, delta_ref,            # (1, bq, LANES) — row stats replicated
    dq_ref,                        # (1, bq, dh)
    dq_scr,
    *, scale, block_q, block_k, rate,
):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    q_last = iq * block_q + (block_q - 1)
    last_k = q_last // block_k

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(ik * block_k <= q_last)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        gq = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        gk = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = s + slope_ref[bh] * (gk - gq).astype(s.dtype)
        causal = gk <= gq
        s = jnp.where(causal, s, NEG_INF)
        w = jnp.exp(s - lse_ref[0, :, :1])          # softmax weights
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _hash_keep(
                bh, gq, gk, seed_ref[0], jnp.uint32(_rate_threshold(rate))
            )
            dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
        ds = w * (dp - delta_ref[0, :, :1])
        dq_scr[:] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == last_k)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    slope_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref,
    lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale, block_q, block_k, rate,
):
    bh = pl.program_id(0)
    ik = pl.program_id(1)   # k outer
    iq = pl.program_id(2)   # q inner
    nq = pl.num_programs(2)
    q_last = iq * block_q + (block_q - 1)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # this q-block contributes iff its last row sees the k-block's first
    @pl.when(q_last >= ik * block_k)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        gq = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        gk = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = s + slope_ref[bh] * (gk - gq).astype(s.dtype)
        causal = gk <= gq
        s = jnp.where(causal, s, NEG_INF)
        w = jnp.exp(s - lse_ref[0, :, :1])          # (bq, bk)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _hash_keep(
                bh, gq, gk, seed_ref[0], jnp.uint32(_rate_threshold(rate))
            )
            inv = 1.0 / (1.0 - rate)
            y = jnp.where(keep, w * inv, 0.0)         # dropped+rescaled weights
            dp = jnp.where(keep, dp * inv, 0.0)
        else:
            y = w
        # dV += Y^T dO
        dv_scr[:] += jax.lax.dot_general(
            y.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = w * (dp - delta_ref[0, :, :1])
        # dK += scale . dS^T Q
        dk_scr[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    slope_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref,   # (1, Tp, dh)
    lse_ref, delta_ref,            # (1, Tp, LANES)
    dq_ref, dk_ref, dv_ref,
    *, scale, rate,
):
    """Single-block fused backward: when the whole (padded) sequence fits
    one block pair (the 20 s / T=1000 training shape — both split-kernel
    grids collapse to 1x1), computing dQ, dK and dV in ONE kernel saves a
    full recompute of S = QK^T, the softmax weights, and dP = dO V^T that
    the two-kernel path does twice — 7 (Tp, Tp) matmuls + 2 softmax
    chains down to 5 + 1 per attention site. A/B vs the split pair:
    examples/bench_flash_bwd.py; VAP_FLASH_BWD=split opts out."""
    bh = pl.program_id(0)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    Tp = q.shape[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    gq = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    s = s + slope_ref[bh] * (gk - gq).astype(s.dtype)
    s = jnp.where(gk <= gq, s, NEG_INF)
    w = jnp.exp(s - lse_ref[0, :, :1])
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = _hash_keep(
            bh, gq, gk, seed_ref[0], jnp.uint32(_rate_threshold(rate))
        )
        inv = 1.0 / (1.0 - rate)
        y = jnp.where(keep, w * inv, 0.0)
        dp = jnp.where(keep, dp * inv, 0.0)
    else:
        y = w
    dv_ref[0] = jax.lax.dot_general(
        y.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    ds = w * (dp - delta_ref[0, :, :1])
    dq_ref[0] = (scale * jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )).astype(dq_ref.dtype)
    dk_ref[0] = (scale * jax.lax.dot_general(
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )).astype(dk_ref.dtype)


def _flash_train_backward(q, k, v, slopes, seed, out, lse, g, scale, rate,
                          block_q=None, block_k=None):
    if block_q is None or block_k is None:
        dbq, dbk = _bwd_blocks(q.dtype)
        block_q = dbq if block_q is None else block_q
        block_k = dbk if block_k is None else block_k
    B, H, T, Dh = q.shape
    block_q, block_k = _clamp_blocks(T, block_q, block_k)
    pad = (-T) % block_q  # block_k divides block_q (see _clamp_blocks)
    assert (T + pad) % block_q == 0 and (T + pad) % block_k == 0, (
        f"block_q={block_q}/block_k={block_k} must both divide the padded "
        f"length {T + pad}"
    )
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (B, H, T)
    if pad:
        zp = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v, g = (jnp.pad(x, zp) for x in (q, k, v, g))
        lse = jnp.pad(lse, [(0, 0), (0, pad)])
        delta = jnp.pad(delta, [(0, 0), (0, 0), (0, pad)])
    Tp = T + pad
    bh = B * H
    qf, kf, vf, gf = (x.reshape(bh, Tp, Dh) for x in (q, k, v, g))
    # lane-replicated row stats (see LANES note above)
    lse3 = jnp.broadcast_to(lse[:, :, None], (bh, Tp, LANES))
    delta3 = jnp.broadcast_to(
        delta.reshape(bh, Tp)[:, :, None], (bh, Tp, LANES)
    )
    slope_bh = jnp.broadcast_to(slopes[None, :], (B, H)).reshape(bh)
    interp = jax.default_backend() == "cpu"
    nq, nk = Tp // block_q, Tp // block_k

    import os

    if (
        nq == 1 and nk == 1
        and os.environ.get("VAP_FLASH_BWD", "fused") == "fused"
    ):
        # single-block fused path (see _bwd_fused_kernel): one kernel for
        # dQ/dK/dV instead of two, sharing the score/softmax/dP recompute
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale, rate=rate),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bh,),
                in_specs=[
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, LANES), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, LANES), lambda b, *_: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tp, Dh), lambda b, *_: (b, 0, 0)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, Tp, Dh), q.dtype),
                jax.ShapeDtypeStruct((bh, Tp, Dh), k.dtype),
                jax.ShapeDtypeStruct((bh, Tp, Dh), v.dtype),
            ],
            interpret=interp,
        )(slope_bh, seed.reshape(1), qf, kf, vf, gf, lse3, delta3)
        shp = (B, H, Tp, Dh)
        dq, dk, dv = (x.reshape(shp)[:, :, :T] for x in (dq, dk, dv))
        return dq, dk, dv

    qspec = lambda b, i, j, *_: (b, i, 0)
    kspec = lambda b, i, j, *_: (b, j, 0)
    rowspec = lambda b, i, j, *_: (b, i, 0)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), qspec),
            pl.BlockSpec((1, block_k, Dh), kspec),
            pl.BlockSpec((1, block_k, Dh), kspec),
            pl.BlockSpec((1, block_q, Dh), qspec),
            pl.BlockSpec((1, block_q, LANES), rowspec),
            pl.BlockSpec((1, block_q, LANES), rowspec),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), qspec),
        scratch_shapes=[pltpu.VMEM((block_q, Dh), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            rate=rate,
        ),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, Tp, Dh), q.dtype),
        interpret=interp,
    )(slope_bh, seed.reshape(1), qf, kf, vf, gf, lse3, delta3)

    # dk/dv: k outer, q inner (scratch carries across the q sweep)
    qspec2 = lambda b, j, i, *_: (b, i, 0)
    kspec2 = lambda b, j, i, *_: (b, j, 0)
    rowspec2 = lambda b, j, i, *_: (b, i, 0)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), qspec2),
            pl.BlockSpec((1, block_k, Dh), kspec2),
            pl.BlockSpec((1, block_k, Dh), kspec2),
            pl.BlockSpec((1, block_q, Dh), qspec2),
            pl.BlockSpec((1, block_q, LANES), rowspec2),
            pl.BlockSpec((1, block_q, LANES), rowspec2),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, Dh), kspec2),
            pl.BlockSpec((1, block_k, Dh), kspec2),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, Dh), jnp.float32),
            pltpu.VMEM((block_k, Dh), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            rate=rate,
        ),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, Tp, Dh), k.dtype),
            jax.ShapeDtypeStruct((bh, Tp, Dh), v.dtype),
        ],
        interpret=interp,
    )(slope_bh, seed.reshape(1), qf, kf, vf, gf, lse3, delta3)

    shp = (B, H, Tp, Dh)
    dq, dk, dv = (x.reshape(shp)[:, :, :T] for x in (dq, dk, dv))
    return dq, dk, dv


# --------------------------------------------------------------------------
# custom-VJP entry point
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_alibi_attention_train(q, k, v, slopes, seed, scale, rate):
    """Causal ALiBi flash attention with in-kernel attention dropout.

    q/k/v: (B, H, T, Dh); slopes: (H,) non-trainable; seed: int32 scalar
    array (per-call dropout stream); scale/rate: static floats.
    """
    out, _ = _flash_train_forward(q, k, v, slopes, seed, scale, rate)
    return out


def _train_fwd(q, k, v, slopes, seed, scale, rate):
    out, lse = _flash_train_forward(q, k, v, slopes, seed, scale, rate)
    return out, (q, k, v, slopes, seed, out, lse)


def _train_bwd(scale, rate, res, g):
    q, k, v, slopes, seed, out, lse = res
    dq, dk, dv = _flash_train_backward(
        q, k, v, slopes, seed, out, lse, g, scale, rate
    )
    dslopes = jnp.zeros_like(slopes)  # requires_grad=False in the reference
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dslopes, dseed


flash_alibi_attention_train.defvjp(_train_fwd, _train_bwd)
