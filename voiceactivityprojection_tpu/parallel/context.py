"""Context (sequence) parallelism: EXACT single-shot inference on long
audio with the time axis sharded over a device mesh.

The reference caps single-shot audio at ~164 s on a 24 GB GPU
(/root/reference/run.py:223-229) and falls back to overlapped chunking
with seam approximations (/root/reference/vap/extraction.py:176-260).
One TPU chip already moves that wall to ~600 s+; this module removes it
entirely: N chips each hold T/N frames and the math stays EXACTLY the
single-device forward (allclose-tested against it on an 8-device mesh).

How each stage shards (device d owns 50 Hz frames [d*T50/D, (d+1)*T50/D)):

* Conv stack — zero communication. The waveform is padded with M margin
  frames of zeros and every device runs the standard symmetrically-padded
  conv stack on its sample slice + margins, cropping M frames per side.
  Exactness argument: a cropped frame's full receptive field (465 samples,
  153 left / 312 right => M*160 >= 312, M=4 used) lies inside the slice,
  so every intermediate it reads is computed from slice content — which
  equals global content because the injected margin zeros coincide with
  the reference's symmetric ZERO padding at the true edges
  (encoder_components.py:83-92).
* GRU (CPC gAR) — inherently sequential carry; relayed device-to-device
  with ppermute (D carry hops of (rows, C) bytes). Wall time equals the
  single-device scan — the recurrence is ~7% of the forward — while convs
  and attention, the bulk, run fully parallel.
* Downsample conv (k=5, s=2, causal) — one ppermute of the previous
  device's last 4 GRU frames; device 0 receives ppermute's zero fill,
  which IS the causal left padding (encoder.py:453-460 contract).
* ALiBi-causal attention — K/V are projected locally and all-gathered
  over ICI ((H, T, Dh) bf16 per layer; ~184 MB/layer at one hour), and
  queries carry a global row offset in the causal/ALiBi terms. O(T^2)
  score memory never materializes (flash kernel on TPU; the dense path
  used on CPU meshes materializes (T_loc, T) per device).
* LayerNorm / FFN / Combinator / heads / probs — pointwise over time,
  no communication.

Restrictions: batch 1 (it exists for one long file), stereo model,
inference only (no dropout), and T50 divisible by the mesh size (pad the
waveform to a multiple of 320*D samples; `pad_waveform_for_mesh` does).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.encoder import (
    CPC_DOWNSAMPLE,
    DOWNSAMPLE_KERNEL,
    DOWNSAMPLE_STRIDE,
    TOTAL_DOWNSAMPLE,
    _conv_stack,
)
from voiceactivityprojection_tpu.models.vap import _compute_cast, probs_from_logits
from voiceactivityprojection_tpu.models.transformer import apply_combinator
from voiceactivityprojection_tpu.ops.attention import _merge_heads, _split_heads
from voiceactivityprojection_tpu.ops.conv import conv1d, layer_norm
from voiceactivityprojection_tpu.ops.gru import gru

Params = Dict[str, Any]

MARGIN_FRAMES = 4  # 100 Hz margin per side; M*160=640 >= the 312-sample
#                    right receptive-field extent of the conv stack
NEG_INF = -1e30


# --------------------------------------------------------------------------
# sharded stages (run inside shard_map; `axis` is the mesh axis name)
# --------------------------------------------------------------------------
def _conv_features_local(
    enc: Params, wav_rows: jax.Array, t100_loc: int, axis: str, n_dev: int
):
    """wav_rows: (rows, n + 2*M*160) zero-margin-padded samples, replicated.
    Returns this device's exact (rows, t100_loc, C) conv features.

    Interior devices slice [F0 - M, F0 + t100_loc + M) frames of real
    signal and crop M per side: every kept frame's receptive field lies in
    the slice, so all intermediates match the global computation. The
    EDGE devices must instead slice flush with the true signal edge so the
    conv stack's own symmetric padding applies there — margin zeros are
    NOT equivalent at the edges, because the intermediate layers' padding
    injects zeros in ACTIVATION space while conv-of-zero-samples passes
    through bias+norm+relu to nonzero values (the first/last global frame
    would differ). Crop offsets: device 0 -> 0, interior -> M, last -> 2M."""
    d = jax.lax.axis_index(axis)
    m = MARGIN_FRAMES
    rows = wav_rows.shape[0]
    margin = m * CPC_DOWNSAMPLE
    n = wav_rows.shape[1] - 2 * margin  # true signal samples
    size = (t100_loc + 2 * m) * CPC_DOWNSAMPLE

    start_interior = d * t100_loc * CPC_DOWNSAMPLE
    start = jnp.where(
        d == 0,
        margin,
        jnp.where(d == n_dev - 1, n + margin - size, start_interior),
    )
    off = jnp.where(d == 0, 0, jnp.where(d == n_dev - 1, 2 * m, m))

    sl = jax.lax.dynamic_slice(wav_rows, (0, start), (rows, size))
    z = _conv_stack(enc, sl[..., None])
    return jax.lax.dynamic_slice(
        z, (0, off, 0), (rows, t100_loc, z.shape[-1])
    )


def _gru_relay(enc: Params, x_loc: jax.Array, axis: str, n_dev: int):
    """Sequential GRU over the time-sharded features: device s scans its
    chunk on its turn, then ppermutes the carry to s+1. Exactly the
    single-device recurrence, split at chunk boundaries."""
    rows, _, c = x_loc.shape
    hidden = enc["gAR"]["w_hh"].shape[0]
    me = jax.lax.axis_index(axis)
    perm = [(i, i + 1) for i in range(n_dev - 1)]

    def body(s, state):
        carry, ys = state

        def run(_):
            y, c_out = gru(enc["gAR"], x_loc, h0=carry)
            return c_out, y

        def skip(_):
            return carry, ys

        carry, ys = jax.lax.cond(me == s, run, skip, None)
        carry = jax.lax.ppermute(carry, axis, perm)  # no-source devices get 0
        return carry, ys

    init = (
        jnp.zeros((rows, hidden), x_loc.dtype),
        jnp.zeros((rows, x_loc.shape[1], hidden), x_loc.dtype),
    )
    _, ys = jax.lax.fori_loop(0, n_dev, body, init)
    return ys


def _downsample_local(enc: Params, y_loc: jax.Array, axis: str, n_dev: int):
    """Causal k=5 s=2 downsample conv + LN + GELU with a 4-frame halo from
    the previous device (device 0's ppermute zero fill == the causal pad)."""
    halo = jax.lax.ppermute(
        y_loc[:, -(DOWNSAMPLE_KERNEL - 1) :],
        axis,
        [(i, i + 1) for i in range(n_dev - 1)],
    )
    ext = jnp.concatenate([halo, y_loc], axis=1)
    d = enc["downsample"]
    z = conv1d(ext, d["conv"]["w"], d["conv"]["b"], stride=DOWNSAMPLE_STRIDE)
    z = layer_norm(z, d["ln"]["w"], d["ln"]["b"])
    return jax.nn.gelu(z, approximate=False)


def _attn_ctx(mha: Params, q_in: jax.Array, kv_in: jax.Array, num_heads: int,
              q_offset: jax.Array, axis: str):
    """Causal ALiBi attention where this device holds query rows
    [q_offset, q_offset + T_loc) of the global sequence; K/V are projected
    locally and all-gathered along time. Mirrors ops/attention.py semantics
    (full-dim 1/sqrt(D) scale, slopes non-trainable)."""
    D = q_in.shape[-1]
    scale = 1.0 / (D ** 0.5)
    q = _split_heads(q_in @ mha["query"]["w"].T, num_heads)
    k = _split_heads(kv_in @ mha["key"]["w"].T, num_heads)
    v = _split_heads(kv_in @ mha["value"]["w"].T, num_heads)
    k = jax.lax.all_gather(k, axis, axis=2, tiled=True)  # (B, H, T, Dh)
    v = jax.lax.all_gather(v, axis, axis=2, tiled=True)
    slopes = jax.lax.stop_gradient(mha["m"])

    if jax.default_backend() not in ("cpu",):
        from voiceactivityprojection_tpu.ops.flash_alibi import (
            flash_alibi_attention_offset,
        )

        out = flash_alibi_attention_offset(q, k, v, slopes, scale, q_offset)
    else:
        tq, tk = q.shape[2], k.shape[2]
        s = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * scale
        gi = q_offset + jnp.arange(tq)[:, None]
        gj = jnp.arange(tk)[None, :]
        s = s + slopes.astype(s.dtype)[:, None, None] * (gj - gi)[None]
        s = jnp.where(gj <= gi, s, NEG_INF)
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", w, v)
    return _merge_heads(out) @ mha["proj"]["w"].T


def _layer_ctx(layer: Params, x: jax.Array, src: Optional[jax.Array],
               num_heads: int, q_offset: jax.Array, axis: str):
    """Pre-LN transformer layer on local rows (inference; mirrors
    models/transformer.py apply_transformer_layer — keep in sync)."""
    z = layer_norm(x, layer["ln_self_attn"]["w"], layer["ln_self_attn"]["b"])
    x = x + _attn_ctx(layer["mha"], z, z, num_heads, q_offset, axis)
    if src is not None and "mha_cross" in layer:
        z = layer_norm(x, layer["ln_src_attn"]["w"], layer["ln_src_attn"]["b"])
        x = x + _attn_ctx(layer["mha_cross"], z, src, num_heads, q_offset, axis)
    z = layer_norm(x, layer["ln_ffnetwork"]["w"], layer["ln_ffnetwork"]["b"])
    h = jax.nn.gelu(z @ layer["ffn"]["w_in"]["w"].T, approximate=False)
    return x + h @ layer["ffn"]["w_out"]["w"].T


def _forward_local(params: Params, wav_rows: jax.Array, conf: VapConfig,
                   t50: int, axis: str, n_dev: int):
    """Per-device slice of the stereo forward (vap/model.py:249-268)."""
    t50_loc = t50 // n_dev
    t100_loc = 2 * t50_loc
    enc = params["encoder"]

    z = _conv_features_local(enc, wav_rows, t100_loc, axis, n_dev)
    y = _gru_relay(enc, z, axis, n_dev)
    z50 = _downsample_local(enc, y, axis, n_dev)  # (2, t50_loc, C)

    x1 = z50[:1]
    x2 = z50[1:]
    q_offset = jax.lax.axis_index(axis) * t50_loc
    nh = conf.num_heads

    for layer in params["ar_channel"]["layers"]:
        x1 = _layer_ctx(layer, x1, None, nh, q_offset, axis)
        x2 = _layer_ctx(layer, x2, None, nh, q_offset, axis)
    for layer in params["ar"]["layers"]:
        n1 = _layer_ctx(layer, x1, x2, nh, q_offset, axis)
        n2 = _layer_ctx(layer, x2, x1, nh, q_offset, axis)
        x1, x2 = n1, n2
    x = apply_combinator(params["ar"]["combinator"], x1, x2)

    v1 = x1 @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    v2 = x2 @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    vad = jnp.concatenate([v1, v2], axis=-1).astype(jnp.float32)
    logits = (x @ params["vap_head"]["w"].T + params["vap_head"]["b"]).astype(
        jnp.float32
    )
    return logits, vad


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------
def pad_waveform_for_mesh(waveform: jax.Array, n_dev: int) -> jax.Array:
    """Right-pad (..., n) samples with zeros to a multiple of 320*n_dev."""
    n = waveform.shape[-1]
    unit = TOTAL_DOWNSAMPLE * n_dev
    pad = (-n) % unit
    if pad == 0:
        return waveform
    widths = [(0, 0)] * (waveform.ndim - 1) + [(0, pad)]
    return jnp.pad(waveform, widths)


def forward_context_parallel(
    params: Params,
    waveform: jax.Array,
    conf: VapConfig,
    mesh: Mesh,
    axis: str = "data",
) -> Dict[str, jax.Array]:
    """Single-shot stereo forward with time sharded over `mesh[axis]`.

    waveform: (1, 2, n) or (2, n) with n % (320 * mesh.shape[axis]) == 0
    (see pad_waveform_for_mesh). Returns {"logits": (1, T50, heads),
    "vad": (1, T50, 2)} — identical to models.vap.forward."""
    if waveform.ndim == 3:
        assert waveform.shape[0] == 1 and waveform.shape[1] == 2, waveform.shape
        wav_rows = waveform[0]
    else:
        assert waveform.shape[0] == 2, waveform.shape
        wav_rows = waveform
    n = wav_rows.shape[-1]
    n_dev = mesh.shape[axis]
    t50 = n // TOTAL_DOWNSAMPLE
    assert n % (TOTAL_DOWNSAMPLE * n_dev) == 0, (
        f"n={n} must be a multiple of {TOTAL_DOWNSAMPLE * n_dev} "
        f"(320 samples x {n_dev} devices); use pad_waveform_for_mesh"
    )
    assert n_dev == 1 or 2 * (t50 // n_dev) >= MARGIN_FRAMES, (
        f"chunks too small: need >= {MARGIN_FRAMES} 100 Hz frames per device"
    )
    if n_dev == 1:  # degenerate mesh: the plain forward IS the answer
        from voiceactivityprojection_tpu.models.vap import forward

        out = forward(params, wav_rows[None], conf)
        return {"logits": out["logits"], "vad": out["vad"]}

    params_c, wav_c = _compute_cast(params, wav_rows, conf)
    margin = MARGIN_FRAMES * CPC_DOWNSAMPLE
    wav_pad = jnp.pad(wav_c, ((0, 0), (margin, margin)))

    logits, vad = _jit_stereo(conf, t50, axis, n_dev, mesh)(params_c, wav_pad)
    return {"logits": logits, "vad": vad}


@functools.lru_cache(maxsize=16)
def _jit_stereo(conf, t50: int, axis: str, n_dev: int, mesh: Mesh):
    """Cache the jitted shard_map per (conf, shape, mesh) so repeated
    calls (extraction over many files) don't re-trace."""
    local = functools.partial(
        _forward_local, conf=conf, t50=t50, axis=axis, n_dev=n_dev
    )
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(None, axis, None), P(None, axis, None)),
            check_vma=False,
        )
    )


def _forward_mono_local(params: Params, wav_row: jax.Array, va: jax.Array,
                        *maybe_vah, conf, t50: int, axis: str, n_dev: int):
    """Per-device slice of the mono forward (vap/model.py:367-393):
    encoder + VAD conditioning (pointwise over time) + two plain GPTs.
    An optional trailing vah array adds the history conditioning
    (vap/model.py:354-359) — pointwise too, sliced like va."""
    vah = maybe_vah[0] if maybe_vah else None
    t50_loc = t50 // n_dev
    t100_loc = 2 * t50_loc
    enc = params["encoder"]

    z = _conv_features_local(enc, wav_row, t100_loc, axis, n_dev)
    y = _gru_relay(enc, z, axis, n_dev)
    x = _downsample_local(enc, y, axis, n_dev)  # (1, t50_loc, C)

    d = jax.lax.axis_index(axis)
    f0 = d * t50_loc
    va_loc = jax.lax.dynamic_slice(
        va, (0, f0, 0), (va.shape[0], t50_loc, va.shape[-1])
    )
    cond = va_loc @ params["va_condition"]["w"].T + params["va_condition"]["b"]
    if vah is not None:
        vah_loc = jax.lax.dynamic_slice(
            vah, (0, f0, 0), (vah.shape[0], t50_loc, vah.shape[-1])
        )
        cond = cond + (
            vah_loc @ params["va_cond_history"]["w"].T
            + params["va_cond_history"]["b"]
        )
    cond = layer_norm(cond, params["va_cond_ln"]["w"], params["va_cond_ln"]["b"])
    x = x + cond.astype(x.dtype)

    q_offset = d * t50_loc
    nh = conf.num_heads
    for layer in params["ar_channel"]["layers"]:
        x = _layer_ctx(layer, x, None, nh, q_offset, axis)
    for layer in params["ar"]["layers"]:
        x = _layer_ctx(layer, x, None, nh, q_offset, axis)

    logits = x @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    return logits.astype(jnp.float32)


def forward_mono_context_parallel(
    params: Params,
    waveform: jax.Array,
    va: jax.Array,
    conf,
    mesh: Mesh,
    axis: str = "data",
    va_history: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Mono (VAD-conditioned) forward with time sharded over `mesh[axis]`.
    waveform: (1, 1, n), (1, n) or (n,); va: (1, Tva, 2) with Tva >= T50;
    optional va_history (1, Tvah, bins) adds the history conditioning
    (vap/model.py:354-359 — pointwise over time, so it shards like va).
    Returns {"logits": (1, T50, n_classes), "vad": va[:, :T50]} — matching
    models.vap.forward_mono."""
    wav = waveform.reshape(1, -1)
    n = wav.shape[-1]
    n_dev = mesh.shape[axis]
    t50 = n // TOTAL_DOWNSAMPLE
    if va.ndim == 2:
        va = va[None]
    assert n % (TOTAL_DOWNSAMPLE * n_dev) == 0, (
        f"n={n} must be a multiple of {TOTAL_DOWNSAMPLE * n_dev}; "
        "use pad_waveform_for_mesh"
    )
    assert va.shape[1] >= t50, (va.shape, t50)
    use_vah = (
        va_history is not None
        and bool(getattr(conf, "va_history", False))
        and "va_cond_history" in params
    )
    if use_vah:
        if va_history.ndim == 2:
            va_history = va_history[None]
        assert va_history.shape[1] >= t50, (va_history.shape, t50)

    if n_dev == 1:
        from voiceactivityprojection_tpu.models.vap import forward_mono

        out = forward_mono(
            params, wav, va, conf,
            va_history=va_history if use_vah else None,
        )
        return {"logits": out["logits"][:, :t50], "vad": va[:, :t50]}

    assert 2 * (t50 // n_dev) >= MARGIN_FRAMES, "chunks too small"
    params_c, wav_c = _compute_cast(params, wav, conf)
    margin = MARGIN_FRAMES * CPC_DOWNSAMPLE
    wav_pad = jnp.pad(wav_c, ((0, 0), (margin, margin)))

    args = (params_c, wav_pad, va.astype(jnp.float32))
    if use_vah:
        args = args + (va_history.astype(jnp.float32),)
    logits = _jit_mono(conf, t50, axis, n_dev, mesh, use_vah)(*args)
    return {"logits": logits, "vad": va[:, :t50]}


@functools.lru_cache(maxsize=16)
def _jit_mono(conf, t50: int, axis: str, n_dev: int, mesh: Mesh,
              use_vah: bool = False):
    local = functools.partial(
        _forward_mono_local, conf=conf, t50=t50, axis=axis, n_dev=n_dev
    )
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P()) + ((P(),) if use_vah else ()),
            out_specs=P(None, axis, None),
            check_vma=False,
        )
    )


def probs_context_parallel(
    params: Params,
    waveform: jax.Array,
    conf: VapConfig,
    mesh: Mesh,
    axis: str = "data",
) -> Dict[str, jax.Array]:
    """Context-parallel equivalent of VapModel.probs (no vad-loss path)."""
    out = forward_context_parallel(params, waveform, conf, mesh, axis)
    return probs_from_logits(out["logits"], out["vad"], conf)
