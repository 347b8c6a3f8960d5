"""Fused conv0+conv1 Pallas kernel for the CPC encoder front-end.

Why: conv0 (1->256, k=10, s=5) writes a (rows, 64000, 256) intermediate —
4.2 GB bf16 at the bench batch — that conv1 (k=8, s=4) immediately
re-reads. Measured on v5e, that HBM round-trip makes the pair ~50 ms while
conv1's FLOP bound is ~11 ms. This kernel keeps conv0's output in VMEM.

Mosaic-friendly design (no gathers, no sublane-splitting reshapes, no
misaligned slices — all of which Mosaic rejects): a PACKED-4 layout where
one matrix row carries FOUR consecutive conv0 outputs across 4*256 lanes.

  host (XLA): im2col of the RAW input into packed windows
      win4[r, t4, 64] = 4 conv0 windows (16 taps each) for outputs
      4*t4 .. 4*t4+3 — only 2x the 82 MB input;
  kernel, per (row, conv1-tile of 512) grid step:
      DMA (514, 64) window slice -> VMEM
      conv0: (T4, 128) @ block-diag(w0) (128, 1024) -> packed z0, one MXU op
      ChannelNorm per 256-lane block: mean from the INPUT windows
      (win @ colsum(w0), K=128), variance via block-sum/expand matmuls
      (padded to 128 stat lanes) + ReLU; padding rows masked to literal
      zero (conv1's symmetric pad)
      conv1: win1 = [packed_t | packed_{t+1}] (lane concat + roll-by-1)
             -> (512, 2048) @ w1 (2048, 256) MXU -> norm -> ReLU
      write the (512, 256) tile.

Used on the inference/frozen-encoder path; a custom VJP falls back to the
unfused ops for the (rare) unfrozen-encoder backward.

Measured (v5e, 128 rows x 320k samples bf16): 43.3 ms vs 49.3 ms for the
XLA unfused pair in isolation; inside the full jitted forward the two tie
(XLA overlaps the unfused convs with flash-attention work), so the kernel
stays opt-in via VAP_CONV_IMPL=fused.

Precision note: on TPU hardware, f32 dot_generals run at MXU default
precision (bf16-truncated operands), and this kernel groups contractions
differently from XLA's conv lowering — conv-activation diffs vs the XLA
path are ~1.3e-2 ON CHIP even with f32 params (interpret mode matches to
1e-5). End-model p_now difference is 2.6e-4. Use the XLA path when
bit-level f32 parity matters.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

K0, S0, P0 = 10, 5, 3
K1, S1, P1 = 8, 4, 2
KW = 32                        # conv0 taps padded 10 -> 32 (DMA lane alignment: PACK*KW = 128)
PACK = 4                       # conv0 outputs packed per row (= S1)
C = 256
T1_TILE = 1024                 # conv1 outputs per grid step (bigger tiles
                               # amortize per-grid-step overhead: ~11 us/step
                               # measured at 512, of which only ~6 us is MXU)
T4_TILE = T1_TILE + 8          # packed rows incl. +1 halo, sublane-aligned (8)


def _block_mats(dtype=jnp.float32):
    """Block-sum (PACK*C, 128) and expansion (128, PACK*C) constants.

    Padded to 128 in the per-block axis so every kernel operand keeps
    >= 128 lanes (Mosaic rejects narrower blocks); columns/rows past PACK
    are zero, so garbage in the padded stat lanes never reaches outputs.
    """
    # built from iota compares (Mosaic cannot lower scatter/.at[].set):
    # bsum[i, j] = 1 iff j == i // C;  bexp[i, j] = 1 iff i == j // C
    ri = jax.lax.broadcasted_iota(jnp.int32, (PACK * C, 128), 0) // C
    ci = jax.lax.broadcasted_iota(jnp.int32, (PACK * C, 128), 1)
    bsum = (ri == ci).astype(dtype)
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (128, PACK * C), 0)
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (128, PACK * C), 1) // C
    bexp = (ri2 == ci2).astype(dtype)
    return bsum, bexp


def _fused_kernel(
    n0_ref,       # (1,) scalar-prefetch: number of REAL conv0 outputs
    win_hbm,      # (R, T4_total, 128) ANY — packed conv0 input windows
    w0_ref,       # (128, 1024) VMEM — block-diagonal conv0 weights
    w0cs_ref,     # (128, PACK) f32 — block-diag per-tap colsum (+bias row
                  # folded): mean of conv0 channels straight from the input
    b0_ref, g0_ref, be0_ref,   # (1, 1024) f32 — tiled conv0 bias/affine
    w1_ref,       # (2048, 256) VMEM — conv1 im2col weights (k-major)
    b1_ref, g1_ref, be1_ref,   # (1, 256) f32
    o_ref,        # (1, T1_TILE, 256) VMEM out
    win_vmem,     # (2, T4_TILE, 128) double-buffered scratch
    sem,          # (2,) DMA semaphores
):
    r = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_rows = pl.num_programs(0)
    t4_start = i * T1_TILE
    step = r * n_tiles + i
    slot = step % 2

    def dma_for(row, tile, s):
        return pltpu.make_async_copy(
            win_hbm.at[row, pl.ds(tile * T1_TILE, T4_TILE), :],
            win_vmem.at[s], sem.at[s],
        )

    @pl.when(step == 0)
    def _warmup():
        dma_for(r, i, slot).start()

    # prefetch the next grid step's slice while we compute this one
    next_step = step + 1
    nr = next_step // n_tiles
    ni = next_step % n_tiles

    @pl.when(next_step < n_rows * n_tiles)
    def _prefetch():
        dma_for(nr, ni, (slot + 1) % 2).start()

    dma_for(r, i, slot).wait()

    z0 = jax.lax.dot_general(
        win_vmem[slot], w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b0_ref[:]  # (T4_TILE, 1024) — 4 packed conv0 outputs per row

    # per-block ChannelNorm (unbiased) via block-sum/expand matmuls.
    # NOTE: a lane-split reshape + pltpu.repeat variant measured 2x SLOWER
    # on hardware AND numerically wrong (Mosaic's lane grouping for
    # (T, 1024) -> (T, 4, 256) is tile-interleaved, not contiguous, even
    # though interpret mode matches) — keep the matmul formulation.
    # The channel MEAN comes straight from the INPUT windows:
    # sum_c z0 = win @ blockdiag-colsum(W0) + sum(b0), a K=128 dot that is
    # ~8x cheaper than block-summing the (T4, 1024) activations.
    dn = (((1,), (0,)), ((), ()))
    bsum, bexp = _block_mats()
    b0sum = jnp.sum(b0_ref[0, 0:C])
    mean_raw = (
        jax.lax.dot_general(
            win_vmem[slot].astype(jnp.float32), w0cs_ref[:],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        + b0sum
    ) / C  # (T4_TILE, 128); only the first PACK columns are meaningful
    mean_l = jax.lax.dot_general(
        mean_raw, bexp, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    d = z0 - mean_l
    var_raw = jax.lax.dot_general(
        d * d, bsum, dimension_numbers=dn, preferred_element_type=jnp.float32
    ) / (C - 1)  # unbiased; padded columns hold 0 -> rsqrt(eps), zeroed by bexp
    inv_l = jax.lax.dot_general(
        jax.lax.rsqrt(var_raw + 1e-5), bexp,
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    z0 = d * inv_l
    z0 = jnp.maximum(z0 * g0_ref[:] + be0_ref[:], 0.0)

    # conv1's symmetric padding is literal zeros: mask packed positions
    # t0p = 4*(t4_start + row) + block outside [P1, n0 + P1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T4_TILE, PACK * C), 0)
    blocks = jax.lax.broadcasted_iota(jnp.int32, (T4_TILE, PACK * C), 1) // C
    t0p = PACK * (t4_start + rows) + blocks
    valid = (t0p >= P1) & (t0p < n0_ref[0] + P1)
    z0 = jnp.where(valid, z0, 0.0)

    # conv1 windows: output t needs z0 packed rows t (j=0..3) and t+1 (j=4..7)
    z0n = pltpu.roll(z0, shift=T4_TILE - 1, axis=0)  # row t -> packed row t+1
    win1 = jnp.concatenate(
        [z0[0:T1_TILE], z0n[0:T1_TILE]], axis=-1
    ).astype(o_ref.dtype)  # (T1_TILE, 2048), k-major blocks j=0..7

    z1 = jax.lax.dot_general(
        win1, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]

    mu = z1.mean(-1, keepdims=True)
    var1 = z1.var(-1, keepdims=True) * (C / (C - 1))
    z1 = (z1 - mu) * jax.lax.rsqrt(var1 + 1e-5)
    o_ref[0] = jnp.maximum(z1 * g1_ref[:] + be1_ref[:], 0.0).astype(o_ref.dtype)


def _input_windows_packed(x: jax.Array, t4_total: int) -> jax.Array:
    """Host-side im2col: (R, t4_total, 64). Packed row t4, tap-block b
    (b < PACK) covers conv0 output t0p = 4*t4 + b, whose window starts at
    padded-x index 5*t0p (left pad = S0*P1 + P0 = 13)."""
    R, n = x.shape
    left = S0 * P1 + P0
    need = S0 * (PACK * t4_total - 1) + K0
    xp = jnp.zeros((R, left + need), dtype=x.dtype)
    xp = xp.at[:, left : left + n].set(x)
    t4 = jnp.arange(t4_total)
    b = jnp.arange(PACK)
    tap = jnp.arange(KW)
    idx = (
        (PACK * t4[:, None, None] + b[None, :, None]) * S0 + tap[None, None, :]
    )  # (t4_total, PACK, KW)
    return xp[:, idx.reshape(t4_total, PACK * KW)]


def _prep_weights(enc: Params, dtype):
    l0, l1 = enc["gEncoder"][0], enc["gEncoder"][1]
    w0 = l0["conv"]["w"][:, 0]  # (10, 256)
    w0p = jnp.zeros((KW, C), dtype=jnp.float32).at[:K0].set(w0.astype(jnp.float32))
    # block-diagonal (PACK*KW, PACK*C): tap-block b feeds lane-block b
    wblock = jnp.zeros((PACK * KW, PACK * C), dtype=dtype)
    for bidx in range(PACK):
        wblock = wblock.at[
            bidx * KW : (bidx + 1) * KW, bidx * C : (bidx + 1) * C
        ].set(w0p.astype(dtype))
    # block-diagonal per-tap channel colsum, f32, padded to 128 columns:
    # mean of conv0's channels = (win @ w0cs + sum(b0)) / C
    colsum = w0p.astype(jnp.float32).sum(-1)  # (KW,)
    w0cs = jnp.zeros((PACK * KW, 128), dtype=jnp.float32)
    for bidx in range(PACK):
        w0cs = w0cs.at[bidx * KW : (bidx + 1) * KW, bidx].set(colsum)
    w1 = l1["conv"]["w"].astype(dtype)  # (8, 256, 256)
    w1f = w1.reshape(K1 * C, C)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    tile4 = lambda a: jnp.tile(a.reshape(1, -1), (1, PACK)).astype(jnp.float32)
    return (
        wblock, w0cs,
        tile4(l0["conv"]["b"]), tile4(l0["norm"]["w"]), tile4(l0["norm"]["b"]),
        w1f, row(l1["conv"]["b"]), row(l1["norm"]["w"]), row(l1["norm"]["b"]),
    )


def _forward_fused(enc: Params, x: jax.Array) -> jax.Array:
    """x: (rows, n_samples) -> (rows, n1, 256) — equals
    conv0->norm->relu->conv1->norm->relu of the generic path."""
    R, n = x.shape
    dtype = x.dtype
    n0 = (n + 2 * P0 - K0) // S0 + 1
    n1 = (n0 + 2 * P1 - K1) // S1 + 1
    n_tiles = -(-n1 // T1_TILE)
    t4_total = (n_tiles - 1) * T1_TILE + T4_TILE

    windows = _input_windows_packed(x, t4_total)  # (R, t4_total, 64)
    weights = _prep_weights(enc, dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole windows array
            pl.BlockSpec((PACK * KW, PACK * C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((PACK * KW, 128), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((1, PACK * C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((1, PACK * C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((1, PACK * C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((K1 * C, C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda r, i, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda r, i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T1_TILE, C), lambda r, i, *_: (r, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, T4_TILE, PACK * KW), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, n_tiles * T1_TILE, C), dtype),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray([n0], dtype=jnp.int32), windows, *weights)
    return out[:, :n1]


def _reference_unfused(enc: Params, x: jax.Array) -> jax.Array:
    from voiceactivityprojection_tpu.ops.conv import channel_norm, conv1d

    z = x[..., None]
    for layer, (k, s, p) in zip(enc["gEncoder"][:2], ((K0, S0, P0), (K1, S1, P1))):
        z = conv1d(z, layer["conv"]["w"], layer["conv"]["b"], stride=s, padding=(p, p))
        z = channel_norm(z, layer["norm"]["w"], layer["norm"]["b"])
        z = jax.nn.relu(z)
    return z


@jax.custom_vjp
def fused_conv01(enc: Params, x: jax.Array) -> jax.Array:
    return _forward_fused(enc, x)


def _vjp_fwd(enc, x):
    return _forward_fused(enc, x), (enc, x)


def _vjp_bwd(res, g):
    enc, x = res
    _, vjp = jax.vjp(_reference_unfused, enc, x)
    return vjp(g)


fused_conv01.defvjp(_vjp_fwd, _vjp_bwd)


def fused_conv01_supported(enc: Params) -> bool:
    try:
        return (
            enc["gEncoder"][0]["conv"]["w"].shape == (K0, 1, C)
            and enc["gEncoder"][1]["conv"]["w"].shape == (K1, C, C)
        )
    except Exception:
        return False
