"""Pallas TPU GRU recurrence kernel.

The GRU is the encoder's only strictly-sequential op (2000 steps for a
20 s chunk at 100 Hz). `ops/gru.py` already hoists the input projection
into one big MXU matmul; this kernel runs the remaining O(H^2) recurrence
with the recurrent weights RESIDENT IN VMEM across all steps:

* grid = (T,): TPU grid execution is sequential, so the hidden state can
  live in VMEM scratch across iterations;
* the (B, 1, 3H) per-step input-projection slices stream HBM -> VMEM via
  the automatic block pipeline (double-buffered by Pallas);
* per step: one (B,H) x (H,3H) MXU matmul + fused gate math on the VPU,
  torch gate order (r, z, n) for checkpoint parity with ops/gru.py.

Tile alignment requires H % 128 == 0 and B padded to 8; the public entry
falls back to `lax.scan` otherwise (and on CPU).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TIME_BLOCK = 8  # sequential steps per grid iteration (cuts grid overhead)
# batch-group interleave: the per-step chain MXU(h@W) -> VPU(gates) -> next
# step is latency-bound (measured ~2.7 us/step vs ~0.5 us of issue work at
# B=128); splitting the batch rows into G independent groups and emitting
# [dot_0..dot_{G-1}, gates_0..gates_{G-1}] per step gives the Mosaic
# scheduler cross-group ILP to hide each unit's latency under the other's
# work. Rows are independent, so the math is identical. Env knob for
# on-chip A/B; groups must divide the padded batch into 8-row multiples.
# Read at trace time (not import time) so tests and A/B scripts can flip
# it per call; jitted callers re-trace per shape, and A/B runs use fresh
# processes, so a stale jit cache entry is not a concern in practice.


def _groups() -> int:
    g = int(os.environ.get("VAP_GRU_GROUPS", "1"))
    return g if g > 0 else 1


def _gru_kernel(
    xp_ref, w_hh_ref, b_hh_ref, h0_ref, ys_ref, h_scr, *, hidden: int, groups: int
):
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(h_scr.dtype)

    bp = h_scr.shape[0]
    bg = bp // groups
    hs = [h_scr[g * bg : (g + 1) * bg] for g in range(groups)]
    # statically-unrolled block of TIME_BLOCK sequential steps; the input
    # projections for the whole block arrive via one pipelined load
    for t in range(TIME_BLOCK):
        xp = xp_ref[t].astype(jnp.float32)  # (B, 3H) — time-major block
        projs = [
            jax.lax.dot_general(
                hs[g], w_hh_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_hh_ref[:]
            for g in range(groups)
        ]
        for g in range(groups):
            h_proj = projs[g]
            rows = slice(g * bg, (g + 1) * bg)
            xr = xp[rows, :hidden]
            xz = xp[rows, hidden : 2 * hidden]
            xn = xp[rows, 2 * hidden :]
            hr = h_proj[:, :hidden]
            hz = h_proj[:, hidden : 2 * hidden]
            hn = h_proj[:, 2 * hidden :]

            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            hs[g] = ((1.0 - z) * n + z * hs[g]).astype(jnp.float32)
            ys_ref[t, rows] = hs[g].astype(ys_ref.dtype)

    for g in range(groups):
        h_scr[g * bg : (g + 1) * bg] = hs[g].astype(h_scr.dtype)


def _gru_ds_kernel(
    xp_ref,      # (TIME_BLOCK, Bp, 3H) input projections, time-major
    w_hh_ref,    # (H, 3H)
    b_hh_ref,    # (1, 3H)
    h0_ref,      # (Bp, H)
    wd_ref,      # (5H, H) downsample conv taps stacked along rows
    bd_ref,      # (1, H)
    g_ref,       # (1, H) downsample LayerNorm gamma
    be_ref,      # (1, H) downsample LayerNorm beta
    o_ref,       # (TIME_BLOCK//2, Bp, H) 50 Hz outputs, time-major
    h_scr,       # (Bp, H)
    tail_scr,    # (4, Bp, H) last 4 GRU planes of the previous block
    *,
    hidden: int,
    groups: int,
):
    """GRU recurrence + CAUSAL downsample conv (k=5, s=2) + LayerNorm in
    one kernel (the exact-erf GELU is applied by the
    `gru_downsample_fused` wrapper because Mosaic lowers neither erf nor
    erfc in-kernel): the (B, T, H) GRU output — consumed ONLY by the
    downsample in the batch forward (models/encoder.py apply_encoder) —
    never touches HBM. In the kernel's time-major layout each conv tap is
    a whole (Bp, H) plane, so the stride-2 window is 5 plane-matmuls per
    output frame (no sublane striding). tail starts at zeros == the causal
    left padding (encoder_components.py:453-460 contract)."""
    tb = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(tb == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(h_scr.dtype)
        tail_scr[:] = jnp.zeros_like(tail_scr)

    bp = h_scr.shape[0]
    bg = bp // groups
    hs = [h_scr[g * bg : (g + 1) * bg] for g in range(groups)]
    ys = []
    for t in range(TIME_BLOCK):
        xp = xp_ref[t].astype(f32)
        projs = [
            jax.lax.dot_general(
                hs[g], w_hh_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + b_hh_ref[:]
            for g in range(groups)
        ]
        parts = []
        for g in range(groups):
            h_proj = projs[g]
            rows = slice(g * bg, (g + 1) * bg)
            r = jax.nn.sigmoid(xp[rows, :hidden] + h_proj[:, :hidden])
            z = jax.nn.sigmoid(
                xp[rows, hidden : 2 * hidden] + h_proj[:, hidden : 2 * hidden]
            )
            n = jnp.tanh(
                xp[rows, 2 * hidden :] + r * h_proj[:, 2 * hidden :]
            )
            hs[g] = ((1.0 - z) * n + z * hs[g]).astype(f32)
            parts.append(hs[g])
        ys.append(parts[0] if groups == 1 else jnp.concatenate(parts, axis=0))

    ext = [tail_scr[i].astype(f32) for i in range(4)] + ys  # 12 planes
    dn = (((1,), (0,)), ((), ()))
    for j in range(TIME_BLOCK // 2):
        acc = bd_ref[:].astype(f32)
        for tap in range(5):
            acc = acc + jax.lax.dot_general(
                ext[2 * j + tap],
                wd_ref[tap * hidden : (tap + 1) * hidden],
                dimension_numbers=dn,
                preferred_element_type=f32,
            )
        mu = acc.mean(-1, keepdims=True)
        var = ((acc - mu) ** 2).mean(-1, keepdims=True)
        y = (acc - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[:] + be_ref[:]
        # GELU is applied OUTSIDE the kernel: Mosaic TPU lowers neither
        # erfc (jax.nn.gelu's path) nor erf in-kernel, and the exact-erf
        # GELU must stay bit-identical to the unfused path. The post-LN
        # output here is already 2x downsampled (100x smaller than the
        # GRU sequence the fusion keeps out of HBM), so one XLA
        # elementwise pass over it costs ~nothing.
        o_ref[j] = y.astype(o_ref.dtype)

    for i in range(4):
        tail_scr[i] = ext[TIME_BLOCK + i].astype(tail_scr.dtype)
    for g in range(groups):
        h_scr[g * bg : (g + 1) * bg] = hs[g].astype(h_scr.dtype)


def gru_downsample_fused(
    x_proj: jax.Array,  # (B, T, 3H) precomputed GRU input projections
    w_hh: jax.Array, b_hh: jax.Array, h0: jax.Array,
    w_d: jax.Array,     # (5, H, H) downsample conv weights
    b_d: jax.Array,     # (H,)
    ln_w: jax.Array, ln_b: jax.Array,
) -> jax.Array:
    """Fused GRU + causal k=5 s=2 downsample + LN + GELU.
    Returns the 50 Hz features (B, T//2, H). Inference/frozen-encoder
    forward only (no VJP — callers guard with stop_gradient)."""
    B, T, threeH = x_proj.shape
    H = threeH // 3
    assert T % 2 == 0, T
    groups = _groups()
    pad_b = (-B) % (8 * groups)
    pad_t = (-T) % TIME_BLOCK
    if pad_b or pad_t:
        x_proj = jnp.pad(x_proj, [(0, pad_b), (0, pad_t), (0, 0)])
        h0 = jnp.pad(h0, [(0, pad_b), (0, 0)])
    Bp, Tp = B + pad_b, T + pad_t

    xp_tm = jnp.swapaxes(x_proj, 0, 1)
    wd = w_d.reshape(5 * H, H)

    o_tm = pl.pallas_call(
        functools.partial(_gru_ds_kernel, hidden=H, groups=groups),
        grid=(Tp // TIME_BLOCK,),
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, Bp, threeH), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, threeH), lambda t: (0, 0)),
            pl.BlockSpec((1, threeH), lambda t: (0, 0)),
            pl.BlockSpec((Bp, H), lambda t: (0, 0)),
            pl.BlockSpec((5 * H, H), lambda t: (0, 0)),
            pl.BlockSpec((1, H), lambda t: (0, 0)),
            pl.BlockSpec((1, H), lambda t: (0, 0)),
            pl.BlockSpec((1, H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TIME_BLOCK // 2, Bp, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp // 2, Bp, H), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bp, H), jnp.float32),
            pltpu.VMEM((4, Bp, H), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(
        xp_tm, w_hh, b_hh.reshape(1, threeH), h0, wd,
        b_d.reshape(1, H), ln_w.reshape(1, H), ln_b.reshape(1, H),
    )
    out = jnp.swapaxes(o_tm, 0, 1)[:B, : T // 2]
    # exact-erf GELU outside the kernel (Mosaic lowers neither erf nor
    # erfc in-kernel); XLA fuses it into the copy of the small output.
    return jax.nn.gelu(out, approximate=False)


def _scan_recurrence(x_proj, w_hh, b_hh, h0):
    """lax.scan reference recurrence (used for the backward pass). Reuses
    ops/gru.py's gate math so the two paths cannot drift."""
    from voiceactivityprojection_tpu.ops.gru import _gru_gates

    hidden = w_hh.shape[0]

    def step(h, xp_t):
        h = _gru_gates(xp_t, h, w_hh, b_hh, hidden)
        return h, h

    h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last


@jax.custom_vjp
def gru_recurrence_pallas(
    x_proj: jax.Array,  # (B, T, 3H) — precomputed input projections
    w_hh: jax.Array,    # (H, 3H)
    b_hh: jax.Array,    # (3H,)
    h0: jax.Array,      # (B, H)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (ys (B, T, H), h_last (B, H))."""
    return _forward_pallas(x_proj, w_hh, b_hh, h0)


def _forward_pallas(x_proj, w_hh, b_hh, h0):
    B, T, threeH = x_proj.shape
    H = threeH // 3
    groups = _groups()
    pad_b = (-B) % (8 * groups)
    pad_t = (-T) % TIME_BLOCK
    if pad_b or pad_t:
        x_proj = jnp.pad(x_proj, [(0, pad_b), (0, pad_t), (0, 0)])
        h0 = jnp.pad(h0, [(0, pad_b), (0, 0)])
    Bp = B + pad_b
    Tp = T + pad_t

    # time-major so per-step blocks are (TIME_BLOCK, B, 3H): the last two
    # dims then satisfy the (8, 128) tile constraint
    xp_tm = jnp.swapaxes(x_proj, 0, 1)  # (Tp, Bp, 3H)

    ys_tm = pl.pallas_call(
        functools.partial(_gru_kernel, hidden=H, groups=groups),
        grid=(Tp // TIME_BLOCK,),
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, Bp, threeH), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, threeH), lambda t: (0, 0)),
            pl.BlockSpec((1, threeH), lambda t: (0, 0)),
            pl.BlockSpec((Bp, H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TIME_BLOCK, Bp, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, H), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(xp_tm, w_hh, b_hh.reshape(1, threeH), h0)

    ys = jnp.swapaxes(ys_tm, 0, 1)[:B, :T]
    return ys, ys[:, -1]


def _gru_bwd_kernel(
    xp_ref,      # (TIME_BLOCK, Bp, 3H) input projections (reverse blocks)
    hprev_ref,   # (TIME_BLOCK, Bp, H) h_{t-1} planes (h0-prepended ys)
    dys_ref,     # (TIME_BLOCK, Bp, H) output cotangents (dh_last folded in)
    w_hh_ref,    # (H, 3H)
    b_hh_ref,    # (1, 3H)
    dxp_ref,     # out (TIME_BLOCK, Bp, 3H)
    dw_ref,      # out (H, 3H) — accumulated across the whole grid
    db_ref,      # out (1, 3H) — accumulated
    dh0_ref,     # out (Bp, H) — the carry after the final (t=0) step
    dh_scr,      # (Bp, H) f32 carry dL/dh_{t-1}
    *,
    hidden: int,
    n_blocks: int,
):
    """Reverse-time BPTT recurrence. Grid iteration i processes time
    block n_blocks-1-i (the index maps reverse the block order); within a
    block, steps run newest-to-oldest. Gates are RECOMPUTED from the
    streamed x-projections and h_{t-1} planes (flash-style: one extra
    (B,H)x(H,3H) MXU matmul per step instead of 3 gate planes in HBM);
    dW_hh/db_hh accumulate in the resident output blocks; the dh carry
    lives in VMEM scratch across the whole grid."""
    i = pl.program_id(0)
    H = hidden

    @pl.when(i == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dh = dh_scr[:]
    dw_acc = jnp.zeros_like(dw_ref, dtype=jnp.float32)
    db_acc = jnp.zeros_like(db_ref, dtype=jnp.float32)
    for tt in range(TIME_BLOCK - 1, -1, -1):
        xp = xp_ref[tt].astype(jnp.float32)        # (Bp, 3H)
        h_prev = hprev_ref[tt].astype(jnp.float32)  # (Bp, H)
        G = dh + dys_ref[tt].astype(jnp.float32)

        h_proj = jax.lax.dot_general(
            h_prev, w_hh_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_hh_ref[:]
        r = jax.nn.sigmoid(xp[:, :H] + h_proj[:, :H])
        z = jax.nn.sigmoid(xp[:, H:2 * H] + h_proj[:, H:2 * H])
        hn = h_proj[:, 2 * H:]
        n = jnp.tanh(xp[:, 2 * H:] + r * hn)

        dn_pre = G * (1.0 - z) * (1.0 - n * n)
        dz_pre = G * (h_prev - n) * z * (1.0 - z)
        dr_pre = dn_pre * hn * r * (1.0 - r)

        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dgates = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
        dxp_ref[tt] = dxp.astype(dxp_ref.dtype)

        # dh_{t-1} = z*G + dgates @ W_hh^T   (contract the 3H dim)
        dh = G * z + jax.lax.dot_general(
            dgates, w_hh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dW_hh += h_{t-1}^T @ dgates ; db_hh += sum_b dgates
        dw_acc = dw_acc + jax.lax.dot_general(
            h_prev, dgates,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_acc = db_acc + jnp.sum(dgates, axis=0, keepdims=True)

    dh_scr[:] = dh
    dw_ref[:] = dw_ref[:] + dw_acc.astype(dw_ref.dtype)
    db_ref[:] = db_ref[:] + db_acc.astype(db_ref.dtype)

    @pl.when(i == n_blocks - 1)
    def _final():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


def _backward_pallas(x_proj, w_hh, b_hh, h0, ys, dys, dh_last):
    """Pallas reverse recurrence; returns (dx_proj, dw_hh, db_hh, dh0)."""
    B, T, threeH = x_proj.shape
    H = threeH // 3
    # fold the h_last cotangent into the last real step's output grad
    dys = dys.at[:, T - 1].add(dh_last)
    pad_b = (-B) % 8
    pad_t = (-T) % TIME_BLOCK
    # h_{t-1} stream: h0 plane prepended, last plane dropped
    hprev = jnp.concatenate([h0[:, None], ys[:, :-1]], axis=1)
    if pad_b or pad_t:
        # padded steps carry zero cotangents and zero inputs -> the
        # reverse recurrence starts with dh=0 and stays 0 through them
        x_proj = jnp.pad(x_proj, [(0, pad_b), (0, pad_t), (0, 0)])
        dys = jnp.pad(dys, [(0, pad_b), (0, pad_t), (0, 0)])
        hprev = jnp.pad(hprev, [(0, pad_b), (0, pad_t), (0, 0)])
    Bp, Tp = B + pad_b, T + pad_t
    nb = Tp // TIME_BLOCK

    xp_tm = jnp.swapaxes(x_proj, 0, 1)
    hprev_tm = jnp.swapaxes(hprev, 0, 1)
    dys_tm = jnp.swapaxes(dys, 0, 1)
    rev = lambda i: (nb - 1 - i, 0, 0)

    dxp_tm, dw, db, dh0 = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, hidden=H, n_blocks=nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, Bp, threeH), rev),
            pl.BlockSpec((TIME_BLOCK, Bp, H), rev),
            pl.BlockSpec((TIME_BLOCK, Bp, H), rev),
            pl.BlockSpec((H, threeH), lambda i: (0, 0)),
            pl.BlockSpec((1, threeH), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TIME_BLOCK, Bp, threeH), rev),
            pl.BlockSpec((H, threeH), lambda i: (0, 0)),
            pl.BlockSpec((1, threeH), lambda i: (0, 0)),
            pl.BlockSpec((Bp, H), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, threeH), x_proj.dtype),
            jax.ShapeDtypeStruct((H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(xp_tm, hprev_tm, dys_tm, w_hh, b_hh.reshape(1, threeH))

    dxp = jnp.swapaxes(dxp_tm, 0, 1)[:B, :T]
    return (
        dxp,
        dw.astype(w_hh.dtype),
        db.reshape(threeH).astype(b_hh.dtype),
        dh0[:B].astype(h0.dtype),
    )


def _vjp_fwd(x_proj, w_hh, b_hh, h0):
    out = _forward_pallas(x_proj, w_hh, b_hh, h0)
    ys, _ = out
    return out, (x_proj, w_hh, b_hh, h0, ys)


def _vjp_bwd(res, g):
    x_proj, w_hh, b_hh, h0, ys = res
    dys, dh_last = g
    if os.environ.get("VAP_GRU_BWD", "pallas") == "pallas":
        return _backward_pallas(x_proj, w_hh, b_hh, h0, ys, dys, dh_last)
    # scan-BPTT fallback (VAP_GRU_BWD=scan): recompute + XLA backward
    def f(xp, w, b, h):
        return _scan_recurrence(xp, w, b, h)

    _, vjp = jax.vjp(f, x_proj, w_hh, b_hh, h0)
    return vjp(g)


gru_recurrence_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_gru_supported(hidden: int) -> bool:
    """Kernel tile constraint: H must fill whole 128-wide lanes (batch is
    padded internally, so it does not constrain support)."""
    return hidden % 128 == 0
