"""Parity-regress a TRAINED checkpoint through the reference's own VapGPT
(VERDICT r4 next-round #7).

tests/test_reference_full_model.py proves the export chain at RANDOM init
(0.02-std weights); trained weights stress the numerics differently
(larger norms, saturated gates, sharp attention). This CLI loads a real
training checkpoint, exports it to the torch state-dict layout, loads it
into /root/reference/vap/model.py's VapGPT exactly like run.py:200-201,
and diffs probs() on a held-out dialog.

    VAP_PLATFORM=cpu python examples/check_trained_parity.py \
        --checkpoint /tmp/runs_arm_ru/<run>/ckpt_best \
        --audio /tmp/phrases_dialog_r5/val_0003.wav

Prints max-abs diffs for p_now / p_future / vad / H and exits nonzero if
p_now or p_future exceed --tol (default 5e-4: looser than the random-init
2e-4 bound — trained logit ranges legitimately amplify f32 noise)."""

import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax  # noqa: E402

REF = "/root/reference"


def load_reference_vapgpt(torch):
    """Import the reference model package with torchaudio stubbed and the
    CPC download replaced by a minimal stand-in (same recipe as
    tests/test_reference_full_model.py — weights come from
    load_state_dict, so the stand-in never contributes numbers)."""
    for name in ("torchaudio", "torchaudio.functional", "torchaudio.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import vap.encoder_components as ec

    fake = "/tmp/_fake_cpc_standin.pt"
    torch.save({"config": {"arMode": "GRU"}, "weights": {}}, fake)
    ec.CHECKPOINTS["cpc"] = fake
    import vap.model as ref_model

    return ref_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="orbax ckpt dir")
    ap.add_argument("--audio", required=True, help="stereo wav to diff on")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--tol", type=float, default=5e-4)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import torch

    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.checkpoint import (
        export_vap_state_dict,
        restore_checkpoint,
    )
    from voiceactivityprojection_tpu.models.vap import VapModel, init_vap
    from voiceactivityprojection_tpu.ops.audio import load_waveform

    conf = VapConfig()  # checkpoint-parity shape (f32: the export target)
    params = init_vap(jax.random.key(0), conf)
    restored = restore_checkpoint(
        os.path.abspath(args.checkpoint), {"params": params}
    )
    params = restored["params"]
    ours = VapModel(conf, params)
    print(f"restored {args.checkpoint}")

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_vap_state_dict(params).items()}
    ref_model = load_reference_vapgpt(torch)
    ref = ref_model.VapGPT(ref_model.VapConfig())
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert list(missing) == ["objective.codebook.emb.weight"], missing
    assert not unexpected, unexpected
    ref = ref.eval()

    x, sr = load_waveform(args.audio, sample_rate=conf.sample_rate)
    x = np.asarray(x, np.float32)
    if x.shape[0] == 1:
        x = np.concatenate([x, np.zeros_like(x)], 0)
    n = int(args.seconds * sr)
    wav = x[None, :, :n]
    print(f"audio {args.audio}: {wav.shape[-1] / sr:.1f}s")

    with torch.no_grad():
        out_ref = ref.probs(torch.from_numpy(wav))
    out_ours = ours.probs(wav)

    report = {"checkpoint": args.checkpoint, "audio": args.audio}
    worst = 0.0
    for key in ("p_now", "p_future", "vad", "H"):
        a = np.asarray(out_ours[key], np.float64)
        b = out_ref[key].numpy().astype(np.float64)
        assert a.shape == b.shape, (key, a.shape, b.shape)
        d = float(np.max(np.abs(a - b)))
        report[f"max_abs_diff_{key}"] = d
        if key in ("p_now", "p_future"):
            worst = max(worst, d)
        print(f"  {key:10s} max|Δ| = {d:.3e}")
    ok = worst <= args.tol
    report["tol"] = args.tol
    report["ok"] = ok
    print(f"trained-parity {'OK' if ok else 'FAIL'} "
          f"(worst p diff {worst:.3e} vs tol {args.tol})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"-> {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
