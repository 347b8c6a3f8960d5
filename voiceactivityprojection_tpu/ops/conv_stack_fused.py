"""Experimental: the ENTIRE CPC conv stack (conv0..conv4) in one Pallas
TPU kernel, VMEM-resident between layers.

Why: unfused, conv0's (R, n/5, 256) output (4.2 GB bf16 at the bench
shape) must round-trip HBM for ChannelNorm, putting an HBM floor of
~27 ms on conv0 alone and ~51 ms on the 5-layer stack (measured v5e,
128 rows x 320k samples). Keeping every intermediate in VMEM removes all
of it: HBM traffic collapses to the overlapping raw-sample rows
(~0.17 GB read; the tap windows are expanded IN-kernel by a one-hot MXU
matmul, see _selection_matrix) plus the final 100 Hz features (~0.26 GB
write). Measured v5e at the bench shape: 33.5 ms vs ~51 XLA (and vs
38.0 for the earlier variant whose windows were gathered host-side).

Reference semantics mirrored exactly (encoder_components.py:73-104): five
Conv1d layers k=10,8,4,4,4 / s=5,4,2,2,2 / symmetric pad 3,2,1,1,1, each
followed by ChannelNorm (unbiased variance) + ReLU.

Layout — PARITY-SPLIT rows (the key trick): Mosaic cannot take stride-2
sublane slices, which a stride-2 conv chain naively needs at every level.
Instead each level's activation lives as SEPARATE VMEM arrays per row
parity: conv0's packed rows (4 outputs / row, as in ops/conv_fused.py)
split mod 8, conv1 outputs mod 8, conv2 mod 4, conv3 mod 2, conv4 dense.
A stride-2 window then reads CONSECUTIVE rows of the right parity arrays
(plus +-1 row handled with pltpu.roll), and every layer is a plain
lane-concat + one MXU matmul per parity:

  z1_p[s]  = [z0_p[s] | z0_{p+1}[s]]                    @ W1   (p mod 8)
  z2_q[m]  = [z1_{2q-1} | z1_2q | z1_{2q+1} | z1_{2q+2}] @ W2  (q mod 4)
  z3_r[m]  = [z2_{2r-1} | z2_2r | z2_{2r+1} | z2_{2r+2}] @ W3  (r mod 2)
  z4[m]    = [z3_1 | z3_0^-1 | z3_1^-1 | z3_0^-2]        @ W4
  (negative parities wrap to the other array rolled by one row)

Each grid step produces T4OUT = T1OUT/8 conv4 outputs (default 256, env
VAP_CONV_T1OUT) for one input row. The DMA ships MS overlapping raw rows
(ROWLEN=256 samples at stride 160, see _input_rows) and the in-kernel
one-hot matmul expands them to the MS window rows; the cross-level halo
(8 conv1 rows left, 48 right) is covered by the 16-row overlap baked
into MS, masked by global-index validity at each level (symmetric zero
padding == zeroed out-of-range rows).

ChannelNorm: level 0 folds the channel mean into CENTERED conv weights
(the conv directly yields z - mean) and computes the channel variance as
a quadratic form in the input windows (see _prep_stack_weights); levels
1-4 are feature-last (M, 256) so plain lane reductions work.

Default on TPU for inference and frozen-encoder training (the stop
gradient keeps the VJP off the hot path); VAP_CONV_IMPL=xla|fused|
fused_stack overrides. Backward falls back to the unfused ops via
custom VJP (only reached with an unfrozen encoder forced to this impl).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voiceactivityprojection_tpu.ops.conv_fused import (
    C,
    K0,
    K1,
    KW,
    P0,
    P1,
    S0,
    S1,
)

Params = Dict[str, Any]

import os as _os

PACK = 4                 # conv0 outputs per packed row (as conv_fused)
NPAR = 8                 # parity split of conv1/packed-z0 rows
# conv1 outputs per grid step (bigger M per parity matmul: at 1024/MS=136
# the kernel measured overhead-bound, 46.6 ms ~= XLA; 2048 is the ceiling —
# 4096 needs a 17 MB kernel stack, over v5e's 16 MB scoped-vmem limit, and
# fails to compile). Env override for tile experiments — read at TRACE
# time (not import) so A/B harnesses and tests can flip it per call.
def _t1out() -> int:
    return int(_os.environ.get("VAP_CONV_T1OUT", "2048"))


LEFT = 8                 # left halo in conv1 rows (one parity row)
# conv2..conv4 all share (k=4, s=2, pad=1)
KU, SU, PU = 4, 2, 1


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _out_len(n: int, k: int, s: int, p: int) -> int:
    return (n + 2 * p - k) // s + 1


def _kernel(
    ns_ref,     # (5,) SMEM: n0p (conv0 outs + 2*P1), n1, n2, n3, n4
    raw_hbm,    # (R, W, 256) ANY: overlapping raw-sample rows (stride 160)
    gsel_ref,   # (256, NPAR*128) one-hot window expand (row S only)
    w0c_ref,    # (128, 1024) conv0 block-diag CENTERED weights (conv gives z-mean)
    b0c_ref,    # (1, 1024) centered bias
    w0quad_ref, # (128, 128) block-diag M = u u^T (centered weight gram)
    lin_ref,    # (1, 128) 2*u@beta per tap, tiled per block
    cst_ref,    # (1, 512) sum(beta^2) everywhere
    bsumb_ref,  # (128, 512) tap-block l//KW -> 128-lane group broadcast sum
    g0_ref, be0_ref,             # (1, 1024)
    w1_ref,     # (2048, 256)
    b1_ref, g1_ref, be1_ref,     # (1, 256)
    w2_ref,     # (1024, 256)
    b2_ref, g2_ref, be2_ref,
    w3_ref,     # (1024, 256)
    b3_ref, g3_ref, be3_ref,
    w4_ref,     # (1024, 256)
    b4_ref, g4_ref, be4_ref,
    o_ref,      # (1, t4out, 256)
    raw_vmem,   # (2, ms, 256) double-buffered DMA scratch (raw rows)
    sem,        # (2,)
    *,
    t1out: int,
    t4out: int,
    ms: int,
):
    r = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_rows = pl.num_programs(0)
    step = r * n_tiles + i
    slot = step % 2

    def dma_for(row, tile, s):
        return pltpu.make_async_copy(
            raw_hbm.at[row, pl.ds(tile * (t1out // NPAR), ms), :],
            raw_vmem.at[s], sem.at[s],
        )

    @pl.when(step == 0)
    def _warm():
        dma_for(r, i, slot).start()

    nxt = step + 1
    nr = nxt // n_tiles
    ni = nxt % n_tiles

    @pl.when(nxt < n_rows * n_tiles)
    def _prefetch():
        dma_for(nr, ni, (slot + 1) % 2).start()

    dma_for(r, i, slot).wait()

    f32 = jnp.float32
    dn = (((1,), (0,)), ((), ()))
    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=f32
    )
    n0p, n1, n2, n3, n4 = (ns_ref[j] for j in range(5))

    # in-kernel window expand (exact, each output lane selects one raw
    # sample): all 128 taps per parity block of window row S live inside
    # the overlapping 256-sample raw row S — ONE one-hot MXU matmul
    # replaces both the former host-side XLA gather (measured 15.3 ms at
    # the bench shape) and the 4x-larger window-array DMA
    win = dot(raw_vmem[slot], gsel_ref[:]).astype(raw_vmem.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ms, PACK * C), 0)
    blocks = jax.lax.broadcasted_iota(jnp.int32, (ms, PACK * C), 1) // C
    rows256 = jax.lax.broadcasted_iota(jnp.int32, (ms, C), 0)

    # ---- level 0: conv0 + block ChannelNorm + ReLU, per parity ----------
    # parity p, local row s -> packed z0 row g = i*t1out - LEFT + 8s + p
    #
    # ChannelNorm without the expensive stat matmuls: the conv weights are
    # CENTERED per tap (u_c = w_c - mean_c w_c), so the conv directly
    # yields d = z - mean_c(z). The channel variance is then a quadratic
    # form in the input window, sum_c d_c^2 = win.M.win + lin.win + cst
    # with M = u u^T precomputed host-side — two K=128 matmuls instead of
    # the former mean-expand / d^2-blocksum / inv-expand trio (each as
    # expensive as conv0 itself). Measured v5e, 128 rows x 320k samples
    # bf16: 44.0 -> 37.9 ms (identical on-chip checksum).
    z0 = []
    for p in range(NPAR):
        win_p = win[:, p * 128 : (p + 1) * 128]
        wf = win_p.astype(f32)
        d = dot(win_p, w0c_ref[:]) + b0c_ref[:]        # (ms, 1024) = z - mean
        q = dot(wf, w0quad_ref[:])                     # (ms, 128)
        s2 = dot((q + lin_ref[:]) * wf, bsumb_ref[:]) + cst_ref[:]  # (ms, 512)
        s2 = jnp.maximum(s2, 0.0)                      # guard fp cancellation
        inv = jax.lax.rsqrt(s2 / (C - 1) + 1e-5)
        # block b's sum sits broadcast over lane group [128b, 128(b+1));
        # each 256-lane channel block needs it twice
        inv_l = jnp.concatenate(
            [inv[:, 128 * b : 128 * (b + 1)] for b in range(PACK) for _ in (0, 1)],
            axis=-1,
        )
        z = jnp.maximum(d * inv_l * g0_ref[:] + be0_ref[:], 0.0)
        # conv1's symmetric pad: zero conv0 positions outside [P1, n0p - P1)
        g = i * t1out - LEFT + 8 * rows + p
        t0p = PACK * g + blocks
        z = jnp.where((t0p >= P1) & (t0p < n0p - P1), z, 0.0)
        # store inter-level activations in the I/O dtype (bf16 in mixed
        # precision): halves VMEM residency, matching the XLA path's
        # layer-boundary precision
        z0.append(z.astype(o_ref.dtype))

    def lane_norm(z, gm, bt):
        mu = z.mean(-1, keepdims=True)
        var = z.var(-1, keepdims=True) * (C / (C - 1))
        return jnp.maximum((z - mu) * jax.lax.rsqrt(var + 1e-5) * gm[:] + bt[:], 0.0)

    def tap(arrs, np_l, npos):
        """Row m of the result holds level value at local index np_l*m + npos.

        par = npos mod np_l selects the parity array; d = floor(npos/np_l)
        is a whole-row offset realized as a roll (out[m] = arr[m + d]).
        Rows that wrap are out-of-halo and never reach valid outputs.
        """
        par = npos % np_l
        d = npos // np_l  # Python floor division: negative npos -> d = -1
        a = arrs[par]
        if d == 0:
            return a
        if a.dtype.itemsize < 4:
            # Mosaic only supports 32-bit sublane rotates: roll in f32
            return pltpu.roll(
                a.astype(jnp.float32), shift=(-d) % ms, axis=0
            ).astype(a.dtype)
        return pltpu.roll(a, shift=(-d) % ms, axis=0)

    # ---- level 1: conv1, 8 parities; t = i*t1out - LEFT + 8s + p --------
    # out t needs packed z0 rows t, t+1 -> local indices 8s+p, 8s+p+1
    z1 = []
    for p in range(NPAR):
        w = jnp.concatenate(
            [tap(z0, NPAR, p), tap(z0, NPAR, p + 1)], axis=-1
        ).astype(w1_ref.dtype)
        z = dot(w, w1_ref[:]) + b1_ref[:]
        z = lane_norm(z, g1_ref, be1_ref)
        t = i * t1out - LEFT + 8 * rows256 + p
        z1.append(jnp.where((t >= 0) & (t < n1), z, 0.0).astype(o_ref.dtype))

    # ---- level 2: conv2, 4 parities; u = i*(t1out//2) - LEFT//2 + 4m + q
    # input t = 2u + dtap (dtap -1..2) -> z1 local 8m + 2q + dtap
    z2 = []
    for q in range(4):
        w = jnp.concatenate(
            [tap(z1, NPAR, 2 * q + dtap) for dtap in range(-1, 3)], axis=-1
        ).astype(w2_ref.dtype)
        z = dot(w, w2_ref[:]) + b2_ref[:]
        z = lane_norm(z, g2_ref, be2_ref)
        u = i * (t1out // 2) - LEFT // 2 + 4 * rows256 + q
        z2.append(jnp.where((u >= 0) & (u < n2), z, 0.0).astype(o_ref.dtype))

    # ---- level 3: conv3, 2 parities; v = i*(t1out//4) - LEFT//4 + 2m + r
    z3 = []
    for rr in range(2):
        w = jnp.concatenate(
            [tap(z2, 4, 2 * rr + dtap) for dtap in range(-1, 3)], axis=-1
        ).astype(w3_ref.dtype)
        z = dot(w, w3_ref[:]) + b3_ref[:]
        z = lane_norm(z, g3_ref, be3_ref)
        v = i * (t1out // 4) - LEFT // 4 + 2 * rows256 + rr
        z3.append(jnp.where((v >= 0) & (v < n3), z, 0.0).astype(o_ref.dtype))

    # ---- level 4: conv4 dense; w_out = i*t4out - LEFT//8 + m ------------
    w = jnp.concatenate(
        [tap(z3, 2, dtap) for dtap in range(-1, 3)], axis=-1
    ).astype(w4_ref.dtype)
    z4 = dot(w, w4_ref[:]) + b4_ref[:]
    z4 = lane_norm(z4, g4_ref, be4_ref)

    # output rows m: w_out = i*t4out - LEFT//8 + m; keep m = 1 .. t4out
    # (LEFT//8 == 1 left-halo row)
    o_ref[0] = z4[1 : 1 + t4out].astype(o_ref.dtype)


def _prep_stack_weights(enc: Params, dtype):
    l0, l1 = enc["gEncoder"][0], enc["gEncoder"][1]
    f32 = jnp.float32
    w0 = l0["conv"]["w"][:, 0].astype(f32)              # (K0, C)
    b0 = l0["conv"]["b"].astype(f32)                    # (C,)
    w0p = jnp.zeros((KW, C), f32).at[:K0].set(w0)
    u = w0p - w0p.mean(-1, keepdims=True)               # centered per tap
    beta = b0 - b0.mean()
    # block-diagonal centered conv weights: tap-block b feeds lane-block b
    wblock = jnp.zeros((PACK * KW, PACK * C), dtype)
    for bi in range(PACK):
        wblock = wblock.at[bi * KW : (bi + 1) * KW, bi * C : (bi + 1) * C].set(
            u.astype(dtype)
        )
    # quadratic-form pieces for the channel variance (shared by all blocks:
    # every block is the same conv): sum_c d_c^2 = win.M.win + lin.win + cst
    m = u @ u.T                                          # (KW, KW)
    w0quad = jnp.zeros((PACK * KW, 128), f32)
    for bi in range(PACK):
        w0quad = w0quad.at[bi * KW : (bi + 1) * KW, bi * KW : (bi + 1) * KW].set(m)
    lin = jnp.tile((2.0 * (u @ beta)).reshape(1, KW), (1, PACK))     # (1, 128)
    cst = jnp.full((1, 4 * 128), jnp.sum(beta * beta), f32)
    # tap-block l//KW -> broadcast sum over 128-lane group j//128
    li_ = jax.lax.broadcasted_iota(jnp.int32, (PACK * KW, 4 * 128), 0) // KW
    ci_ = jax.lax.broadcasted_iota(jnp.int32, (PACK * KW, 4 * 128), 1) // 128
    bsumb = (li_ == ci_).astype(f32)

    row = lambda a: a.reshape(1, -1).astype(f32)
    tile4 = lambda a: jnp.tile(a.reshape(1, -1), (1, PACK)).astype(f32)
    out = [
        wblock, tile4(beta), w0quad, lin, cst, bsumb,
        tile4(l0["norm"]["w"]), tile4(l0["norm"]["b"]),
        l1["conv"]["w"].astype(dtype).reshape(K1 * C, C),
        row(l1["conv"]["b"]), row(l1["norm"]["w"]), row(l1["norm"]["b"]),
    ]
    for li in (2, 3, 4):
        l = enc["gEncoder"][li]
        wf = l["conv"]["w"].astype(dtype).reshape(KU * C, C)
        out += [wf, row(l["conv"]["b"]), row(l["norm"]["w"]), row(l["norm"]["b"])]
    return tuple(out)


ROWLEN = 256  # samples per (overlapping) input row: 2 lane-tiles, aligned


def _selection_matrix(dtype):
    """One-hot lane-selection matrix for the in-kernel window expand.

    Input rows overlap: row S holds samples [160*S, 160*S + 256) (stride
    160 = one window row's worth, 256-lane rows for DMA tiling). Window
    row S, lane l = (p, b, tap) is sample 160*S + o(p, b, tap) with
    o = PACK*S0*(p - LEFT) + S0*b + tap + 160 in [0, 187) — entirely
    inside row S, so the expand is ONE matmul with a constant 0/1 matrix
    instead of an element gather (the XLA gather measured 15.3 ms at the
    bench shape; the in-kernel matmul is ~1 ms of MXU work)."""
    import numpy as np

    assert LEFT == NPAR, "left-halo masking assumes LEFT == NPAR"
    stride = NPAR * PACK * S0  # 160
    p, b, tap = np.meshgrid(
        np.arange(NPAR), np.arange(PACK), np.arange(KW), indexing="ij"
    )
    o = (PACK * S0 * (p - LEFT) + S0 * b + tap + stride).reshape(-1)
    assert o.min() >= 0 and o.max() < ROWLEN
    g = np.zeros((ROWLEN, NPAR * PACK * KW), np.float32)
    g[o, np.arange(NPAR * PACK * KW)] = 1.0
    return jnp.asarray(g, dtype)


def _input_rows(x: jax.Array, n_tiles: int, t1out: int, ms: int) -> jax.Array:
    """(R, n) -> (R, W, 256): overlapping raw-sample rows, row S holding
    samples [160*S, 160*S + 256) — every tap of window row S lives in row
    S (see _selection_matrix); the expand itself happens in-kernel on the
    MXU. The leading 160-sample shift makes every o(p, b, tap) offset
    non-negative; window row 0 (entirely left-halo, g < 0) and tap >= K0
    lanes are neutralized downstream by the kernel's t0p validity mask
    and the zero-padded tap weights respectively.

    Why this XLA-side relayout exists at all (~3-5 ms of the 71 ms B=64
    forward; ROADMAP perf backlog): a fully in-kernel construction was
    analyzed and is blocked structurally, not by tuning. The map from
    contiguous sample rows to stride-160 window rows CHANGES THE ROW
    COUNT (one window row per 160 samples vs one DMA row per 128/256/640
    lanes), and (a) an MXU one-hot matmul preserves the row dimension —
    it can only reshuffle lanes, which is why the in-kernel tap expand
    works (window row == input row) but the row expand cannot; (b) every
    legal DMA row width (multiples of 128 lanes) is incommensurate with
    the 160-sample stride, so window rows have 8/16 distinct alignment
    classes whose interleave is a sublane shuffle Mosaic has no cheap
    form for. The measured alternatives: XLA gather 15.3 ms, identity-
    conv patches ~6 ms, this pad+reshape+concat ~3-5 ms.

    VAP_CONV_ROWPREP=write selects a concat-free variant (two writes into
    one preallocated buffer) for on-chip A/B."""
    R, n = x.shape
    left = S0 * P1 + P0
    stride = NPAR * PACK * S0  # 160 samples per window row
    Wrows = (n_tiles - 1) * (t1out // NPAR) + ms
    L = stride * (Wrows + 1)
    xq = jnp.zeros((R, max(L, stride + left + n)), dtype=x.dtype)
    xq = xq.at[:, stride + left : stride + left + n].set(x)
    xr = xq[:, :L].reshape(R, Wrows + 1, stride)
    if _os.environ.get("VAP_CONV_ROWPREP") == "write":
        out = jnp.zeros((R, Wrows, ROWLEN), dtype=x.dtype)
        out = out.at[:, :, :stride].set(xr[:, :Wrows])
        out = out.at[:, :, stride:].set(
            xr[:, 1 : Wrows + 1, : ROWLEN - stride]
        )
        return out
    # overlap: append the next row's first (ROWLEN - stride) samples
    return jnp.concatenate(
        [xr[:, :Wrows], xr[:, 1 : Wrows + 1, : ROWLEN - stride]], axis=-1
    )


def _forward_stack(enc: Params, x: jax.Array) -> jax.Array:
    R, n = x.shape
    dtype = x.dtype
    n0 = _out_len(n, K0, S0, P0)
    n1 = _out_len(n0, K1, S1, P1)
    n2 = _out_len(n1, KU, SU, PU)
    n3 = _out_len(n2, KU, SU, PU)
    n4 = _out_len(n3, KU, SU, PU)
    t1out = _t1out()
    t4out = t1out // 8       # conv4 outputs per grid step
    ms = t1out // 8 + 16     # rows per parity array (+ halo, mult of 8)
    n_tiles = _cdiv(n4, t4out)

    rows = _input_rows(x, n_tiles, t1out, ms)
    sel = _selection_matrix(dtype)
    weights = _prep_stack_weights(enc, dtype)
    ns = jnp.asarray([n0 + 2 * P1, n1, n2, n3, n4], dtype=jnp.int32)

    lane_specs = []
    for shape in [
        (ROWLEN, NPAR * 128),
        (PACK * KW, PACK * C), (1, PACK * C),
        (PACK * KW, 128), (1, 128), (1, 4 * 128), (PACK * KW, 4 * 128),
        (1, PACK * C), (1, PACK * C),
        (K1 * C, C), (1, C), (1, C), (1, C),
        (KU * C, C), (1, C), (1, C), (1, C),
        (KU * C, C), (1, C), (1, C), (1, C),
        (KU * C, C), (1, C), (1, C), (1, C),
    ]:
        lane_specs.append(pl.BlockSpec(shape, lambda r, i, *_: (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + lane_specs,
        out_specs=pl.BlockSpec((1, t4out, C), lambda r, i, *_: (r, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ms, ROWLEN), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, t1out=t1out, t4out=t4out, ms=ms),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, n_tiles * t4out, C), dtype),
        interpret=jax.default_backend() == "cpu",
    )(ns, rows, sel, *weights)
    return out[:, :n4]


def _reference_stack(enc: Params, x: jax.Array) -> jax.Array:
    from voiceactivityprojection_tpu.models.encoder import CPC_CONV_SPECS
    from voiceactivityprojection_tpu.ops.conv import channel_norm, conv1d

    z = x[..., None]
    for layer, (k, s, p) in zip(enc["gEncoder"], CPC_CONV_SPECS):
        z = conv1d(z, layer["conv"]["w"], layer["conv"]["b"], stride=s, padding=(p, p))
        z = channel_norm(z, layer["norm"]["w"], layer["norm"]["b"])
        z = jax.nn.relu(z)
    return z


@jax.custom_vjp
def fused_conv_stack(enc: Params, x: jax.Array) -> jax.Array:
    """x: (rows, n_samples) -> (rows, n/160, 256): the full 5-layer CPC
    conv feature extractor (100 Hz features)."""
    return _forward_stack(enc, x)


def _vjp_fwd(enc, x):
    return _forward_stack(enc, x), (enc, x)


def _vjp_bwd(res, g):
    enc, x = res
    _, vjp = jax.vjp(_reference_stack, enc, x)
    return vjp(g)


fused_conv_stack.defvjp(_vjp_fwd, _vjp_bwd)
