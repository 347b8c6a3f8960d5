"""Child process for the float64 exactness parity chain.

Run by tests/test_reference_parity_f64.py in a FRESH interpreter so
`jax_enable_x64` never leaks into the main suite. Proves the
importer/epsilon chain EXACT (VERDICT round-1 item 1):

1. Stereo + mono full-model diff: our randomly-initialized weights,
   rounded through float32 (so both sides share bit-identical values),
   exported to the torch layout and loaded into the reference's own
   VapGPT/VapGPTMono (/root/reference/vap/model.py, loaded exactly like
   run.py:200-201); both pipelines run end to end in float64 on CPU.
   Logits must agree to <=1e-8 (observed ~1e-12) — at this precision any
   residual gap is a real layout/epsilon bug, not accumulation noise.
2. CPC blob round-trip: a synthetic checkpoint written in the EXACT
   libri-light on-disk format ({"config": argparse-namespace dict,
   "weights": CPCModel state dict + extra prediction-net keys},
   encoder_components.py:206-217,371-402) is loaded by the reference's
   own `load_CPC` AND by our `load_cpc_blob`; forward outputs
   (encodedData @100 Hz, cFeature) must agree in float64.

Prints one line per check: "CHECK <name> <max_abs_diff>" and exits 0
only if every check passes its bound.
"""

import os
import sys
import tempfile
import types

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
FAILED = []


def setup_reference():
    for name in ("torchaudio", "torchaudio.functional", "torchaudio.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import vap.encoder_components as ec

    fake = os.path.join(tempfile.mkdtemp(), "fake_cpc.pt")
    torch.save({"config": {"arMode": "GRU"}, "weights": {}}, fake)
    ec.CHECKPOINTS["cpc"] = fake

    import vap.model as ref_model

    return ec, ref_model


def round_f32(params):
    """Round every float leaf through float32 so our f64 params and the
    torch-loaded-then-doubled params hold bit-identical values."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


def to_f64(params):
    return jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


def check(name, ours, ref_t, atol):
    a = np.asarray(ours, dtype=np.float64)
    b = ref_t.numpy() if hasattr(ref_t, "numpy") else np.asarray(ref_t)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    d = float(np.max(np.abs(a - b))) if a.size else 0.0
    ok = d <= atol
    print(f"CHECK {name} {d:.3e} (atol {atol:g}) {'ok' if ok else 'FAIL'}")
    if not ok:
        FAILED.append(name)


def run_stereo(ref_model):
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapModel, init_vap

    conf = VapConfig()
    params = round_f32(init_vap(jax.random.key(7), conf))

    sd = {
        k: torch.from_numpy(np.asarray(v, dtype=np.float32).copy())
        for k, v in export_vap_state_dict(params).items()
    }
    ref = ref_model.VapGPT(ref_model.VapConfig())
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert list(missing) == ["objective.codebook.emb.weight"], missing
    assert not unexpected, unexpected
    ref = ref.double().eval()
    ours = VapModel(conf, to_f64(params))

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(1, 2, 48000)) * 0.1  # float64

    with torch.no_grad():
        ref_fwd = ref(torch.from_numpy(wav))
        ref_probs = ref.probs(torch.from_numpy(wav))
    our_fwd = ours.forward(wav)
    our_probs = ours.probs(wav)
    assert our_fwd["logits"].dtype == jnp.float64, our_fwd["logits"].dtype

    check("stereo.logits", our_fwd["logits"], ref_fwd["logits"], 1e-8)
    check("stereo.vad", our_fwd["vad"], ref_fwd["vad"], 1e-8)
    check("stereo.p_now", our_probs["p_now"], ref_probs["p_now"], 1e-10)
    check("stereo.p_future", our_probs["p_future"], ref_probs["p_future"], 1e-10)
    check("stereo.H", our_probs["H"], ref_probs["H"], 1e-9)


def run_mono(ref_model):
    from voiceactivityprojection_tpu.config import VapMonoConfig
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapMonoModel, init_vap_mono

    conf = VapMonoConfig()
    params = round_f32(init_vap_mono(jax.random.key(3), conf))

    sd = {
        k: torch.from_numpy(np.asarray(v, dtype=np.float32).copy())
        for k, v in export_vap_state_dict(params).items()
    }
    ref = ref_model.VapGPTMono(ref_model.VapMonoConfig())
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert list(missing) == ["objective.codebook.emb.weight"], missing
    assert not unexpected, unexpected
    ref = ref.double().eval()
    ours = VapMonoModel(conf, to_f64(params))

    rng = np.random.default_rng(2)
    wav = rng.normal(size=(1, 1, 32000)) * 0.1
    va = (rng.random((1, 100, 2)) < 0.5).astype(np.float64)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(wav), torch.from_numpy(va))
    our_out = ours.forward(wav, va)
    check("mono.logits", our_out["logits"], ref_out["logits"], 1e-8)


def make_synthetic_cpc_blob(ec, path):
    """Synthesize a checkpoint in the EXACT libri-light on-disk layout:
    the full training argparse namespace as 'config' (field set of
    get_default_cpc_config, encoder_components.py:196-360, with the 60k
    blob's GRU override) and a real CPCModel state dict as 'weights',
    plus extra prediction-network keys that load_state_dict(strict=False)
    must ignore (encoder_components.py:398-400)."""
    config = {
        "hiddenEncoder": 256,
        "hiddenGar": 256,
        "nPredicts": 12,
        "negativeSamplingExt": 128,
        "learningRate": 2e-4,
        "schedulerStep": -1,
        "schedulerRamp": None,
        "beta1": 0.9,
        "beta2": 0.999,
        "epsilon": 1e-08,
        "sizeWindow": 20480,
        "nEpoch": 200,
        "samplingType": "samespeaker",
        "nLevelsPhone": 1,
        "cpc_mode": None,
        "encoder_type": "cpc",
        "normMode": "layerNorm",
        "onEncoder": False,
        "random_seed": None,
        "speakerEmbedding": 0,
        "arMode": "GRU",
        "nLevelsGRU": 1,
        "rnnMode": "transformer",
        "dropout": False,
        "abspos": False,
    }
    torch.manual_seed(1234)
    model = ec.CPCModel(
        ec.CPCEncoder(256, "layerNorm"),
        ec.CPCAR(256, 256, False, 1, mode="GRU"),
    )
    weights = model.state_dict()
    # the published blob carries the CPC prediction network too; it is
    # dropped by strict=False — simulate with extra keys
    weights["wPrediction.predictors.0.weight"] = torch.zeros(256, 256)
    weights["wPrediction.predictors.0.bias"] = torch.zeros(256)
    torch.save({"config": config, "weights": weights}, path)


def run_cpc_blob(ec):
    from voiceactivityprojection_tpu.models.checkpoint import load_cpc_blob
    from voiceactivityprojection_tpu.models.encoder import _conv_stack
    from voiceactivityprojection_tpu.ops.gru import gru

    blob = os.path.join(tempfile.mkdtemp(), "synthetic_60k.pt")
    make_synthetic_cpc_blob(ec, blob)

    # reference path: load_CPC reads CHECKPOINTS['cpc'] from disk
    # (encoder_components.py:371-402)
    ec.CHECKPOINTS["cpc"] = blob
    ref = ec.load_CPC(load_state_dict=True).double().eval()

    ours = to_f64(load_cpc_blob(blob))

    rng = np.random.default_rng(5)
    wav = rng.normal(size=(2, 1, 16000)) * 0.1
    with torch.no_grad():
        c_feature, encoded, _ = ref(torch.from_numpy(wav), None)

    z = _conv_stack(ours, jnp.asarray(wav)[:, 0, :, None])
    check("cpc.encodedData", z, encoded, 1e-9)
    seq, _ = gru(ours["gAR"], z)
    check("cpc.cFeature", seq, c_feature, 1e-9)


def run_extraction(ref_model):
    """L7 chunked sliding-window extraction in f64: our batched
    VapExtractor vs the reference's sequential step_extraction
    (run.py:23-131) with identical weights on a 36.5 s waveform."""
    import importlib.util

    # run.py -> plot_utils -> phrases.functional imports parselmouth
    for name in ("parselmouth", "parselmouth.praat"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules["parselmouth"], "praat"):
        sys.modules["parselmouth"].praat = sys.modules["parselmouth.praat"]
    if not hasattr(sys.modules["parselmouth.praat"], "call"):
        sys.modules["parselmouth.praat"].call = lambda *a, **k: None
    if not hasattr(sys.modules["parselmouth"], "Sound"):
        sys.modules["parselmouth"].Sound = type("Sound", (), {})
    spec = importlib.util.spec_from_file_location(
        "ref_run", os.path.join(REF, "run.py")
    )
    ref_run = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_run)

    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.inference.extraction import VapExtractor
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapModel, init_vap

    conf = VapConfig()
    params = round_f32(init_vap(jax.random.key(5), conf))
    ours = VapModel(conf, to_f64(params))
    ex = VapExtractor(ours, context_time=20.0, step_time=5.0, chunk_batch=4)

    sd = {
        k: torch.from_numpy(np.asarray(v, dtype=np.float32).copy())
        for k, v in export_vap_state_dict(params).items()
    }
    ref = ref_model.VapGPT(ref_model.VapConfig())
    ref.load_state_dict(sd, strict=False)
    ref = ref.double().eval()

    rng = np.random.default_rng(4)
    wav = rng.normal(size=(1, 2, int(16000 * 36.5))) * 0.1  # float64
    with torch.no_grad():
        out_ref = ref_run.step_extraction(torch.from_numpy(wav), ref, pbar=False)
    out_ours = ex.step_extraction(wav)
    for key, atol in (("p_now", 1e-10), ("p_future", 1e-10), ("H", 1e-9)):
        check(f"extract.{key}", out_ours[key], out_ref[key], atol)


def main():
    torch.set_num_threads(2)
    ec, ref_model = setup_reference()
    run_stereo(ref_model)
    run_mono(ref_model)
    run_cpc_blob(ec)
    run_extraction(ref_model)
    if FAILED:
        print("FAILED:", FAILED)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
