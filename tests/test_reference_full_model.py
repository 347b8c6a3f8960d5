"""FULL-MODEL behavioral parity against the reference's own VapGPT.

The strongest parity statement available without the missing pretrained
blobs (.MISSING_LARGE_BLOBS): export OUR randomly-initialized weights to
the torch state-dict layout, load them into the reference's VapGPT
(/root/reference/vap/model.py) exactly like run.py:200-201 does, and diff
`probs()` end to end on the same waveform — both full pipelines (conv
stack, GRU, downsample, ALiBi transformers, heads, p_now/p_future
aggregation) must agree numerically.

The reference's CPC constructor insists on a checkpoint file for its
config (encoder_components.py:371-379, zero egress here), so a minimal
{"config": {}, "weights": {}} stand-in is injected via the CHECKPOINTS
path table; all real weights then come from load_state_dict, making the
stand-in irrelevant.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax

REF = "/root/reference"

pytestmark = [pytest.mark.model, pytest.mark.slow]

torch = pytest.importorskip("torch")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "vap")), reason="no reference mount"
)


@pytest.fixture(scope="module")
def ref_vapgpt(tmp_path_factory):
    for name in ("torchaudio", "torchaudio.functional", "torchaudio.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import vap.encoder_components as ec

    fake = str(tmp_path_factory.mktemp("cpc") / "fake_cpc.pt")
    # the default argparse config has arMode="LSTM" (encoder_components.py
    # :324-329); the real 60k blob's config selects the GRU the VAP models
    # are built on — mirror that here (weights all come from
    # load_state_dict afterwards, so {} suffices there)
    torch.save({"config": {"arMode": "GRU"}, "weights": {}}, fake)
    ec.CHECKPOINTS["cpc"] = fake

    import vap.model as ref_model

    return ref_model


@needs_ref
def test_full_model_probs_match_reference(ref_vapgpt):
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapModel, init_vap

    conf = VapConfig()  # full default size = the reference's defaults
    params = init_vap(jax.random.key(7), conf)
    ours = VapModel(conf, params)

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_vap_state_dict(params).items()}
    ref = ref_vapgpt.VapGPT(ref_vapgpt.VapConfig())
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    # the ONLY tolerated mismatch: the frozen codebook embedding (a
    # deterministic binary-code table, objective.py:112-139)
    assert list(missing) == ["objective.codebook.emb.weight"], missing
    assert not unexpected, unexpected
    ref = ref.eval()

    # > 100 output frames: the reference's probs() always runs its loss
    # branch against its own sigmoid VAD (the vad-shadowing bug,
    # vap/model.py:190) and the projection unfold needs T - 1 >= 100
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(1, 2, 48000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.probs(torch.from_numpy(wav))
    out_ours = ours.probs(wav)

    for key, atol in (("p_now", 2e-4), ("p_future", 2e-4), ("H", 2e-3)):
        a = np.asarray(out_ours[key])
        b = out_ref[key].numpy()
        assert a.shape == b.shape, (key, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=atol, err_msg=key)

    # model VAD sigmoid too (reference returns it as "vad")
    np.testing.assert_allclose(
        np.asarray(out_ours["vad"]), out_ref["vad"].numpy(), atol=2e-4
    )


@needs_ref
def test_full_model_logits_match_reference(ref_vapgpt):
    """Raw logits path (forward, not probs) on a second seed."""
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapModel, init_vap

    conf = VapConfig()
    params = init_vap(jax.random.key(11), conf)
    ours = VapModel(conf, params)

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_vap_state_dict(params).items()}
    ref = ref_vapgpt.VapGPT(ref_vapgpt.VapConfig())
    ref.load_state_dict(sd, strict=False)
    ref = ref.eval()

    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(1, 2, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(wav))
    our_out = ours.forward(wav)

    np.testing.assert_allclose(
        np.asarray(our_out["logits"]), ref_out["logits"].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(our_out["vad"]), ref_out["vad"].numpy(), atol=2e-3
    )


@needs_ref
def test_full_mono_model_matches_reference(ref_vapgpt):
    """Same end-to-end diff for the VAD-conditioned mono model
    (vap/model.py:271-393)."""
    from voiceactivityprojection_tpu.config import VapMonoConfig
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapMonoModel, init_vap_mono

    conf = VapMonoConfig()
    params = init_vap_mono(jax.random.key(3), conf)
    ours = VapMonoModel(conf, params)

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_vap_state_dict(params).items()}
    ref = ref_vapgpt.VapGPTMono(ref_vapgpt.VapMonoConfig())
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert list(missing) == ["objective.codebook.emb.weight"], missing
    assert not unexpected, unexpected
    ref = ref.eval()

    rng = np.random.default_rng(2)
    wav = (rng.normal(size=(1, 1, 32000)) * 0.1).astype(np.float32)
    va = (rng.random((1, 100, 2)) < 0.5).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(wav), torch.from_numpy(va))
    our_out = ours.forward(wav, va)

    np.testing.assert_allclose(
        np.asarray(our_out["logits"]), ref_out["logits"].numpy(), atol=2e-3
    )


@needs_ref
def test_chunked_extraction_matches_reference(ref_vapgpt):
    """L7 extraction-layer diff: our batched VapExtractor.step_extraction
    vs the reference's sequential step_extraction (run.py:23-131), both
    running the SAME weights on the same 36.5 s waveform (ragged tail
    exercises the omitted-frames re-run)."""
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.inference.extraction import VapExtractor
    from voiceactivityprojection_tpu.models.checkpoint import export_vap_state_dict
    from voiceactivityprojection_tpu.models.vap import VapModel, init_vap

    # run.py -> plot_utils -> phrases.functional needs parselmouth (absent
    # here; praat is an offline probe, unused by step_extraction) — stub it
    for name in ("parselmouth", "parselmouth.praat"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules["parselmouth"], "praat"):
        sys.modules["parselmouth"].praat = sys.modules["parselmouth.praat"]
    if not hasattr(sys.modules["parselmouth.praat"], "call"):
        sys.modules["parselmouth.praat"].call = lambda *a, **k: None
    if not hasattr(sys.modules["parselmouth"], "Sound"):
        sys.modules["parselmouth"].Sound = type("Sound", (), {})

    # our repo root also has a run.py — load the REFERENCE one by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_run", os.path.join(REF, "run.py")
    )
    ref_run = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_run)

    conf = VapConfig()
    params = init_vap(jax.random.key(5), conf)
    ours = VapModel(conf, params)
    ex = VapExtractor(ours, context_time=20.0, step_time=5.0, chunk_batch=4)

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_vap_state_dict(params).items()}
    ref = ref_vapgpt.VapGPT(ref_vapgpt.VapConfig())
    ref.load_state_dict(sd, strict=False)
    ref = ref.eval()

    rng = np.random.default_rng(4)
    wav = (rng.normal(size=(1, 2, int(16000 * 36.5))) * 0.1).astype(np.float32)

    with torch.no_grad():
        out_ref = ref_run.step_extraction(
            torch.from_numpy(wav), ref, pbar=False
        )
    out_ours = ex.step_extraction(wav)

    for key in ("p_now", "p_future", "H"):
        a = np.asarray(out_ours[key])
        b = out_ref[key].numpy()
        assert a.shape == b.shape, (key, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=3e-4, err_msg=key)
