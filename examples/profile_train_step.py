"""Decompose the training step's 59.8 ms (B=16 bf16 frozen) into stages.

bench.py --train gives the end-to-end step time and MFU (17.0% on v5e);
this script splits it so optimization effort lands on the real stall:

  fwd        — loss forward only (no grad)
  grad       — jax.value_and_grad of the same loss (fwd + bwd)
  step       — the full fused augmented train step (grad + optimizer)
  aug        — augment_on_device alone (noise branch)

--deep adds the level-2 split of the backward (VERDICT r3 item 1):

  enc_fwd    — frozen encoder forward alone (conv+GRU fused, XLA
               downsample; no backward exists for this stage)
  labels     — projection-window label computation alone
  tf_fwd     — transformer section (ar_channel x2 + stereo stack + heads
               + losses) from precomputed (x1, x2) features
  tf_grad    — value_and_grad of the transformer section; tf_bwd =
               tf_grad - tf_fwd is the real transformer backward
  attn_site  — ONE flash-train attention site (B, 4, 1000, 64) fwd and
               fwd+bwd; the full model runs 14 sites/step
  opt        — optimizer update alone (AdamW masked multi-transform,
               real grads pytree)

--unfrozen profiles the UNFROZEN-encoder step (vap/encoder.py:39-47's
opposite; the de-facto recipe while no pretrained blob exists): the conv
stack + GRU get a real backward and train, so --deep swaps the frozen
enc_fwd stage for

  enc_fwd    — unfused XLA encoder forward (the unfrozen training path;
               the fused kernel's VJP would recompute, ROADMAP #3)
  enc_grad   — encoder fwd+bwd vs a fixed output cotangent; enc_bwd =
               enc_grad - enc_fwd is the conv+GRU+downsample backward
  conv_grad  — conv-stack-only fwd+bwd (same cotangent trick)
  gru_grad   — GRU-only fwd+bwd from precomputed conv features

Every timing is chained-dispatch with a single host fetch (tunnel-safe).

Usage: python examples/profile_train_step.py [batch] [--deep] [--unfrozen]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import OptConfig, VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.train.augment import augment_on_device
from voiceactivityprojection_tpu.train.step import (
    init_train_state,
    loss_fn,
    make_optimizer,
    make_train_step_augmented,
)


from _bench_util import timed as _timed

# --iters N (default 20): CPU smoke runs pass e.g. --iters 2 so each
# timing block stays tractable in interpret/XLA-CPU mode
_ITERS = 20
if "--iters" in sys.argv:
    _ITERS = int(sys.argv[sys.argv.index("--iters") + 1])


def timed(name, fn, iters=None, warmup=None):
    it = _ITERS if iters is None else iters
    wu = max(1, it // 3) if warmup is None else warmup
    return _timed(name, fn, it, wu, width=28)


def main():
    argv = list(sys.argv[1:])
    if "--iters" in argv:
        i = argv.index("--iters")
        del argv[i:i + 2]  # flag + value are not positionals
    pos = [a for a in argv if not a.startswith("-")]
    B = int(pos[0]) if pos else 16
    sr, chunk_s = 16_000, 20.0
    n = int(chunk_s * sr)
    conf = VapConfig(dtype="bfloat16",
                     freeze_encoder="--unfrozen" not in sys.argv)
    params = init_vap(jax.random.key(0), conf)
    tx = make_optimizer(OptConfig(), conf.freeze_encoder)
    state = init_train_state(params, tx)

    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray(
            rng.normal(size=(B, 2, n)).astype(np.float32) * 0.1
        ),
        "vad": jnp.asarray(
            (rng.random((B, int((chunk_s + 2) * 50), 2)) < 0.4).astype(np.float32)
        ),
    }
    key = jax.device_put(jax.random.key(1))

    fwd = jax.jit(lambda p, b, k: loss_fn(p, b, conf, k)[0])
    # NOTE: must return the grads too — returning only the value would
    # let XLA dead-code-eliminate the entire backward at compile time
    # (measured: "backward = 0.03 ms"), silently timing just the forward
    grad = jax.jit(
        lambda p, b, k: jax.value_and_grad(
            lambda pp: loss_fn(pp, b, conf, k)[0]
        )(p)
    )
    aug = jax.jit(
        lambda b, k: augment_on_device(
            dict(b), k, 1, do_flip=True, flip_prob=0.5, do_mask=False,
            mask_prob=0.5, noise_amplitude=0.01, sample_rate=sr, frame_hz=50,
        )["waveform"]
    )
    step = make_train_step_augmented(
        conf, tx, mono=False, do_flip=True, flip_prob=0.5, do_mask=False,
        mask_prob=0.5, noise_amplitude=0.01, sample_rate=sr, frame_hz=50,
    )

    t_aug = timed("augment (noise branch)", lambda: aug(batch, key))
    t_fwd = timed("loss forward", lambda: fwd(params, batch, key))
    t_grad = timed("value_and_grad", lambda: grad(params, batch, key))

    # the donated full step mutates state; rebuild per timing block
    holder = {"s": init_train_state(
        jax.tree.map(jnp.copy, params), tx)}

    def run_step():
        holder["s"], m = step(holder["s"], batch, key, 1)
        return m["loss"]

    t_step = timed("full fused train step", run_step)
    print(
        f"\n# decomposition (B={B}): backward = grad - fwd = "
        f"{t_grad - t_fwd:.2f} ms; optimizer+augment+dispatch overhead = "
        f"step - grad - aug = {t_step - t_grad - t_aug:.2f} ms"
    )

    if "--deep" in sys.argv:
        deep(B, conf, params, tx, state, batch, key,
             t_step=t_step, t_aug=t_aug, t_fwd=t_fwd, t_grad=t_grad)


def deep(B, conf, params, tx, state, batch, key, *, t_step, t_aug, t_fwd,
         t_grad):
    """Level-2 backward decomposition (see module docstring)."""
    import math

    from voiceactivityprojection_tpu.models.encoder import apply_encoder
    from voiceactivityprojection_tpu.models.transformer import (
        apply_gpt,
        apply_gpt_stereo,
    )
    from voiceactivityprojection_tpu.models.vap import _compute_cast
    from voiceactivityprojection_tpu.ops.codebook import get_labels
    from voiceactivityprojection_tpu.ops.losses import loss_vad, loss_vap
    from voiceactivityprojection_tpu.utils.flops import (
        device_peak_tflops,
        stereo_forward_flops,
    )

    print("\n# ---- deep (level-2) decomposition ----")

    # ---- encoder forward alone. Frozen: conv+GRU fused on TPU, no bwd.
    # Unfrozen: the XLA path the real training step uses (the fused
    # kernel's VJP would recompute the whole stack, ROADMAP #3).
    @jax.jit
    def enc_fwd(p, wf):
        p, wf = _compute_cast(p, wf, conf)
        Bb = wf.shape[0]
        both = wf.reshape(Bb * 2, wf.shape[-1])
        z = apply_encoder(
            p["encoder"], both, fused_auto=conf.freeze_encoder,
            fuse_downsample=False,
        )
        z = z.reshape(Bb, 2, *z.shape[1:])
        return z[:, 0], z[:, 1]

    enc_tag = "frozen, no bwd" if conf.freeze_encoder else "unfrozen, XLA"
    t_enc = timed(f"enc_fwd ({enc_tag})", lambda: enc_fwd(params, batch["waveform"]))

    t_enc_grad = float("nan")
    if not conf.freeze_encoder:
        t_enc_grad = unfrozen_encoder_split(conf, params, batch, B)

    # ---- label computation alone
    lab = jax.jit(lambda v: get_labels(v, conf.bin_frames))
    t_lab = timed("labels (projection windows)", lambda: lab(batch["vad"]))

    # ---- transformer section from precomputed features
    x1, x2 = enc_fwd(params, batch["waveform"])
    x1 = jax.block_until_ready(x1)
    tf_params = {
        "ar_channel": params["ar_channel"],
        "ar": params["ar"],
        "va_classifier": params["va_classifier"],
        "vap_head": params["vap_head"],
    }
    if conf.dtype == "bfloat16":
        cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
        tf_params = jax.tree.map(cast, tf_params)

    def tf_loss(tp, x1, x2, vad, k):
        drop = conf.dropout
        r = jax.random.split(k, 3)
        o1 = apply_gpt(tp["ar_channel"], x1, num_heads=conf.num_heads,
                       dropout=drop, rng=r[0], attn_impl=conf.attn_impl)
        o2 = apply_gpt(tp["ar_channel"], x2, num_heads=conf.num_heads,
                       dropout=drop, rng=r[1], attn_impl=conf.attn_impl)
        out = apply_gpt_stereo(tp["ar"], o1["x"], o2["x"],
                               num_heads=conf.num_heads, dropout=drop,
                               rng=r[2], attn_impl=conf.attn_impl)
        v1 = out["x1"] @ tp["va_classifier"]["w"].T + tp["va_classifier"]["b"]
        v2 = out["x2"] @ tp["va_classifier"]["w"].T + tp["va_classifier"]["b"]
        vlog = jnp.concatenate([v1, v2], axis=-1)
        logits = out["x"] @ tp["vap_head"]["w"].T + tp["vap_head"]["b"]
        logits = logits.astype(jnp.float32)
        vlog = vlog.astype(jnp.float32)
        return (loss_vap(logits, get_labels(vad, conf.bin_frames))
                + loss_vad(vlog, vad))

    tf_fwd = jax.jit(tf_loss)
    tf_grad = jax.jit(
        lambda tp, a, b, v, k: jax.value_and_grad(tf_loss)(tp, a, b, v, k)
    )
    t_tf_fwd = timed("tf_fwd (transformer+heads+loss)",
                     lambda: tf_fwd(tf_params, x1, x2, batch["vad"], key))
    t_tf_grad = timed("tf_grad (fwd+bwd)",
                      lambda: tf_grad(tf_params, x1, x2, batch["vad"], key))

    # ---- one flash-train attention site
    from voiceactivityprojection_tpu.ops.flash_alibi_train import (
        flash_alibi_attention_train,
    )
    from voiceactivityprojection_tpu.ops.attention import alibi_slopes

    H, T, D = conf.num_heads, x1.shape[1], conf.dim // conf.num_heads
    rngq = np.random.default_rng(1)
    mk = lambda: jnp.asarray(
        rngq.normal(size=(B, H, T, D)).astype(np.float32) * 0.05,
        dtype=jnp.bfloat16 if conf.dtype == "bfloat16" else jnp.float32,
    )
    q, k_, v_ = mk(), mk(), mk()
    slopes = jnp.asarray(alibi_slopes(H), jnp.float32).reshape(-1)
    scale = 1.0 / math.sqrt(conf.dim)  # full-dim quirk (modules.py:52)

    if jax.default_backend() == "cpu":
        print("attn site: skipped on CPU (interpret-mode Pallas)")
        t_site_f = t_site_g = float("nan")
    else:
        site_fwd = jax.jit(
            lambda a, b, c: flash_alibi_attention_train(
                a, b, c, slopes, jnp.int32(7), scale, conf.dropout
            ).sum()
        )
        site_grad = jax.jit(
            lambda a, b, c: jax.grad(
                lambda aa, bb, cc: flash_alibi_attention_train(
                    aa, bb, cc, slopes, jnp.int32(7), scale, conf.dropout
                ).sum().astype(jnp.float32),
                argnums=(0, 1, 2),
            )(a, b, c)
        )
        t_site_f = timed("attn site fwd (B,4,T,64)", lambda: site_fwd(q, k_, v_))
        t_site_g = timed("attn site fwd+bwd", lambda: site_grad(q, k_, v_))

    # ---- optimizer update alone (real grads)
    _, grads = tf_grad(tf_params, x1, x2, batch["vad"], key)
    full_grads = jax.tree.map(jnp.zeros_like, params)
    for kk in tf_params:
        full_grads[kk] = jax.tree.map(
            lambda g: g.astype(jnp.float32), grads[kk]
        )
    full_grads = jax.block_until_ready(full_grads)

    @jax.jit
    def opt_step(g, opt_state, p):
        import optax

        updates, new_os = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), new_os

    holder = {"os": state.opt_state, "p": params}

    def run_opt():
        holder["p"], holder["os"] = opt_step(full_grads, holder["os"], holder["p"])
        return holder["p"]["vap_head"]["b"]

    t_opt = timed("optimizer (AdamW update)", run_opt)

    # ---- summary
    n_sites = 2 * conf.channel_layers + 2 * cross_sites(conf)
    t_tf_bwd = t_tf_grad - t_tf_fwd
    import math as _math

    enc_cost = t_enc if conf.freeze_encoder else (
        t_enc_grad if not _math.isnan(t_enc_grad) else t_enc
    )
    resid = t_step - t_aug - enc_cost - t_tf_grad - t_opt
    peak = device_peak_tflops() or float("nan")
    st = stereo_forward_flops(batch["waveform"].shape[-1], conf.dim,
                              conf.channel_layers, conf.cross_layers)
    tf_fwd_fl = (st["ar_channel"] + st["ar_stereo"] + st["combinator_heads"]) * B
    print(f"\n# deep summary (B={B}):")
    print(f"#   enc_fwd {t_enc:.2f} ms  "
          f"({st['conv_stack'] + st['gru'] + st['downsample']:.2e} F/chunk, "
          f"{(st['conv_stack'] + st['gru'] + st['downsample']) * B / (t_enc * 1e-3) / 1e12:.1f} TF/s"
          f" = {(st['conv_stack'] + st['gru'] + st['downsample']) * B / (t_enc * 1e-3) / 1e12 / peak * 100:.0f}% peak)")
    print(f"#   tf_fwd {t_tf_fwd:.2f} ms ({tf_fwd_fl / (t_tf_fwd * 1e-3) / 1e12:.1f} TF/s = "
          f"{tf_fwd_fl / (t_tf_fwd * 1e-3) / 1e12 / peak * 100:.0f}% peak), "
          f"tf_bwd {t_tf_bwd:.2f} ms (~2x fwd FLOPs -> "
          f"{2 * tf_fwd_fl / (t_tf_bwd * 1e-3) / 1e12:.1f} TF/s = "
          f"{2 * tf_fwd_fl / (t_tf_bwd * 1e-3) / 1e12 / peak * 100:.0f}% peak)")
    print(f"#   attn: {n_sites} sites x (fwd {t_site_f:.2f} / bwd "
          f"{t_site_g - t_site_f:.2f} ms) = {n_sites * t_site_f:.1f} fwd / "
          f"{n_sites * (t_site_g - t_site_f):.1f} bwd ms if serial")
    print(f"#   labels {t_lab:.2f}  opt {t_opt:.2f}  aug {t_aug:.2f} ms")
    enc_name = "enc" if conf.freeze_encoder else "enc_grad"
    print(f"#   step {t_step:.2f} = aug {t_aug:.2f} + {enc_name} "
          f"{enc_cost:.2f} + tf_grad {t_tf_grad:.2f} + opt {t_opt:.2f} + "
          f"residual {resid:.2f} ms (residual = downsample bwd + dispatch/"
          f"fusion differences between the pieces and the fused step)")
    from voiceactivityprojection_tpu.utils.flops import stereo_train_flops

    tr = stereo_train_flops(
        batch["waveform"].shape[-1], conf.dim, conf.channel_layers,
        conf.cross_layers, frozen_encoder=conf.freeze_encoder,
    )
    step_tfs = tr["total"] * B / (t_step * 1e-3) / 1e12
    print(f"#   step MFU ({'frozen' if conf.freeze_encoder else 'unfrozen'}"
          f" accounting): {tr['total'] * B / 1e9:.1f} GF/step -> "
          f"{step_tfs:.1f} TF/s = {step_tfs / peak * 100:.1f}% peak")


def unfrozen_encoder_split(conf, params, batch, B):
    """Encoder fwd+bwd decomposition for the UNFROZEN step: time the
    encoder (and its conv-stack / GRU pieces) against a FIXED output
    cotangent — the grads must be returned or XLA dead-code-eliminates
    the backward (same trap as the r3 grad-timing bug)."""
    import numpy as np

    from voiceactivityprojection_tpu.models.encoder import _conv_stack, apply_encoder
    from voiceactivityprojection_tpu.models.vap import _compute_cast
    from voiceactivityprojection_tpu.ops.gru import gru as gru_op

    pc, wfc = _compute_cast(params, batch["waveform"], conf)
    enc_p = pc["encoder"]
    both = wfc.reshape(B * 2, wfc.shape[-1])

    z_shape_probe = jax.eval_shape(
        lambda e, w: apply_encoder(e, w, fused_auto=False, fuse_downsample=False),
        enc_p, both,
    )
    rng = np.random.default_rng(2)
    ct = jnp.asarray(
        rng.normal(size=z_shape_probe.shape).astype(np.float32)
    )

    def enc_loss(e, w):
        z = apply_encoder(e, w, fused_auto=False, fuse_downsample=False)
        return (z.astype(jnp.float32) * ct).sum()

    enc_grad = jax.jit(lambda e, w: jax.grad(enc_loss)(e, w))
    t_enc_grad = timed("enc_grad (fwd+bwd, cotangent)",
                       lambda: enc_grad(enc_p, both))

    conv_probe = jax.eval_shape(
        lambda e, w: _conv_stack(e, w[..., None]), enc_p, both
    )
    ct_c = jnp.asarray(rng.normal(size=conv_probe.shape).astype(np.float32))

    def conv_loss(e, w):
        return (_conv_stack(e, w[..., None]).astype(jnp.float32) * ct_c).sum()

    conv_fwd = jax.jit(lambda e, w: _conv_stack(e, w[..., None]))
    conv_grad = jax.jit(lambda e, w: jax.grad(conv_loss)(e, w))
    t_conv_fwd = timed("conv_fwd (XLA, stack only)",
                       lambda: conv_fwd(enc_p, both))
    t_conv_grad = timed("conv_grad (fwd+bwd)", lambda: conv_grad(enc_p, both))

    feats = jax.block_until_ready(conv_fwd(enc_p, both))

    def gru_loss(g):
        out, _ = gru_op(g, feats)
        return (out.astype(jnp.float32) * ct_c).sum()

    gru_grad = jax.jit(lambda g: jax.grad(gru_loss)(g))
    gru_fwd_j = jax.jit(lambda g: gru_op(g, feats)[0])
    t_gru_fwd = timed("gru_fwd (from conv feats)",
                      lambda: gru_fwd_j(enc_p["gAR"]))
    t_gru_grad = timed("gru_grad (fwd+bwd)", lambda: gru_grad(enc_p["gAR"]))

    print(f"#   enc_bwd = enc_grad - enc_fwd; pieces: conv bwd "
          f"{t_conv_grad - t_conv_fwd:.2f} ms, gru bwd "
          f"{t_gru_grad - t_gru_fwd:.2f} ms")
    return t_enc_grad


def cross_sites(conf):
    return 2 * conf.cross_layers  # self+cross per channel per stereo layer


if __name__ == "__main__":
    main()
