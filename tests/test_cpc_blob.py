"""`load_cpc_blob`: libri-light on-disk CPC checkpoint format round-trip.

The published 60k blob (encoder_components.py:371-402) is a torch pickle
{"config": <training argparse namespace dict>, "weights": <CPCModel state
dict incl. prediction network>}. These tests prove our loader against
that EXACT layout using the reference's own modules as the oracle (the
f64 exactness version runs in tests/test_reference_parity_f64.py).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"

pytestmark = [pytest.mark.model]

torch = pytest.importorskip("torch")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "vap")), reason="no reference mount"
)

FULL_CONFIG = {
    # the architecture-relevant subset of get_default_cpc_config
    # (encoder_components.py:196-360) with the 60k blob's GRU override
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


@pytest.fixture(scope="module")
def ec():
    for name in ("torchaudio", "torchaudio.functional", "torchaudio.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import vap.encoder_components as ec_mod

    return ec_mod


def write_blob(ec_mod, path, config=None, extra_keys=True):
    torch.manual_seed(99)
    model = ec_mod.CPCModel(
        ec_mod.CPCEncoder(256, "layerNorm"),
        ec_mod.CPCAR(256, 256, False, 1, mode="GRU"),
    )
    weights = model.state_dict()
    if extra_keys:
        weights["wPrediction.predictors.0.weight"] = torch.zeros(8, 8)
    torch.save({"config": dict(FULL_CONFIG, **(config or {})), "weights": weights}, str(path))
    return model


@needs_ref
def test_blob_roundtrip_forward_parity(ec, tmp_path):
    """Our load_cpc_blob on a blob in the exact on-disk layout must
    reproduce the reference CPCModel's (encodedData, cFeature)."""
    from voiceactivityprojection_tpu.models.checkpoint import load_cpc_blob
    from voiceactivityprojection_tpu.models.encoder import _conv_stack
    from voiceactivityprojection_tpu.ops.gru import gru

    blob = tmp_path / "synthetic_60k.pt"
    write_blob(ec, blob)

    ec.CHECKPOINTS["cpc"] = str(blob)
    ref = ec.load_CPC(load_state_dict=True).eval()

    ours = load_cpc_blob(str(blob))

    rng = np.random.default_rng(5)
    wav = (rng.normal(size=(2, 1, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        c_feature, encoded, _ = ref(torch.from_numpy(wav), None)

    z = _conv_stack(ours, jnp.asarray(wav)[:, 0, :, None])
    np.testing.assert_allclose(
        np.asarray(z), encoded.numpy(), atol=2e-5, err_msg="encodedData"
    )
    seq, _ = gru(ours["gAR"], z)
    np.testing.assert_allclose(
        np.asarray(seq), c_feature.numpy(), atol=2e-5, err_msg="cFeature"
    )


@needs_ref
def test_blob_guard_rails(ec, tmp_path):
    """Unsupported architectures in the config namespace must raise, not
    silently import garbage."""
    from voiceactivityprojection_tpu.models.checkpoint import load_cpc_blob

    cases = [
        ({"arMode": "LSTM"}, "arMode"),
        ({"normMode": "batchNorm"}, "normMode"),
        ({"nLevelsGRU": 2}, "nLevelsGRU"),
        ({"cpc_mode": "reverse"}, "reverse"),
        ({"samplingType": "sequential"}, "sequential"),
    ]
    for override, frag in cases:
        blob = tmp_path / f"bad_{frag}.pt"
        write_blob(ec, blob, config=override)
        with pytest.raises(ValueError, match=frag):
            load_cpc_blob(str(blob))

    bad = tmp_path / "not_a_blob.pt"
    torch.save({"state": 1}, str(bad))
    with pytest.raises(ValueError, match="not a CPC checkpoint blob"):
        load_cpc_blob(str(bad))


@needs_ref
def test_blob_defaults_reject_missing_armode(ec, tmp_path):
    """A config that does NOT override arMode falls back to the argparse
    default 'LSTM' (encoder_components.py:324-329) — the loader must
    apply the same default and refuse."""
    from voiceactivityprojection_tpu.models.checkpoint import load_cpc_blob

    blob = tmp_path / "default_armode.pt"
    cfg = {k: v for k, v in FULL_CONFIG.items() if k != "arMode"}
    torch.manual_seed(7)
    model = ec.CPCModel(
        ec.CPCEncoder(256, "layerNorm"),
        ec.CPCAR(256, 256, False, 1, mode="GRU"),
    )
    torch.save({"config": cfg, "weights": model.state_dict()}, str(blob))
    with pytest.raises(ValueError, match="arMode"):
        load_cpc_blob(str(blob))


@needs_ref
def test_trainer_grafts_cpc_blob(ec, tmp_path):
    """train/loop.py `init_encoder_from=<blob.pt>` grafts gEncoder+gAR
    from the libri-light blob into fresh VAP params and keeps the fresh
    learned downsample."""
    import jax

    from voiceactivityprojection_tpu.models.checkpoint import load_cpc_blob
    from voiceactivityprojection_tpu.models.vap import init_vap
    from voiceactivityprojection_tpu.config import VapConfig

    blob = tmp_path / "synthetic_60k.pt"
    write_blob(ec, blob)

    params = init_vap(jax.random.key(0), VapConfig())
    before_ds = np.asarray(params["encoder"]["downsample"]["conv"]["w"]).copy()
    cpc = load_cpc_blob(str(blob))
    params["encoder"] = {**params["encoder"], **cpc}

    got = np.asarray(params["encoder"]["gEncoder"][0]["conv"]["w"])
    want = np.asarray(cpc["gEncoder"][0]["conv"]["w"])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["downsample"]["conv"]["w"]), before_ds
    )


@needs_ref
def test_export_cpc_blob_roundtrip(ec, tmp_path):
    """Our encoder exported in the libri-light on-disk format is (a)
    re-imported identically by load_cpc_blob and (b) consumable by the
    reference's own load_CPC with matching forward outputs — so encoders
    pretrained in this framework work for reference users."""
    import jax

    from voiceactivityprojection_tpu.models.checkpoint import (
        export_cpc_blob,
        load_cpc_blob,
    )
    from voiceactivityprojection_tpu.models.encoder import _conv_stack, init_encoder
    from voiceactivityprojection_tpu.ops.gru import gru

    enc = init_encoder(jax.random.key(42), 256)
    blob = tmp_path / "exported.pt"
    export_cpc_blob(enc, str(blob))

    back = load_cpc_blob(str(blob))
    for a, b in zip(
        jax.tree.leaves({"gEncoder": enc["gEncoder"], "gAR": enc["gAR"]}),
        jax.tree.leaves(back),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ec.CHECKPOINTS["cpc"] = str(blob)
    ref = ec.load_CPC(load_state_dict=True).eval()
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(1, 1, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        c_feature, encoded, _ = ref(torch.from_numpy(wav), None)
    z = _conv_stack(enc, jnp.asarray(wav)[:, 0, :, None])
    np.testing.assert_allclose(np.asarray(z), encoded.numpy(), atol=2e-5)
    seq, _ = gru(enc["gAR"], z)
    np.testing.assert_allclose(np.asarray(seq), c_feature.numpy(), atol=2e-5)
