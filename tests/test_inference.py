"""Inference-surface tests: chunked extraction stitching, streaming loop,
SDS step, minimal outputs."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import SDSConfig, VapConfig
from voiceactivityprojection_tpu.inference.extraction import VapExtractor
from voiceactivityprojection_tpu.inference.sds import TurnTakingSDS, WavSource
from voiceactivityprojection_tpu.inference.streaming import StreamingVap
from voiceactivityprojection_tpu.models.vap import VapModel

pytestmark = pytest.mark.inference

CONF = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
EXAMPLE_WAV = "/root/reference/example/student_long_female_en-US-Wavenet-G.wav"


@pytest.fixture(scope="module")
def model():
    return VapModel.init(jax.random.key(0), CONF)


def test_single_shot_extract(model):
    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    w = np.random.default_rng(0).normal(size=(2, 16000 * 3)).astype(np.float32)
    out = ex.extract(w)
    assert out["p_now"].shape == (1, 150, 2)


def test_mono_input_gets_silent_channel(model):
    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    w = np.random.default_rng(0).normal(size=(1, 16000 * 2)).astype(np.float32)
    out = ex.extract(w)
    assert out["p_now"].shape == (1, 100, 2)


def test_chunked_extraction_stitching(model):
    """Chunked output must have exactly duration*frame_hz frames and match
    single-shot on the early (context-covered) frames."""
    ex = VapExtractor(model, context_time=4.0, step_time=1.0, chunk_batch=4)
    seconds = 12.3
    n = int(16000 * seconds)
    w = np.random.default_rng(1).normal(size=(2, n)).astype(np.float32) * 0.1
    out = ex.step_extraction(w[None])
    total_frames = int(seconds * 50)
    assert out["p_now"].shape == (1, total_frames, 2)
    assert out["H"].shape == (1, total_frames)

    # first chunk (5 s = 250 frames) must equal a direct model pass
    direct = model.probs(jnp.asarray(w[None, :, : ex.chunk_samples]))
    np.testing.assert_allclose(
        out["p_now"][0, : ex.chunk_frames],
        np.asarray(direct["p_now"])[0],
        atol=1e-5,
    )


def test_chunked_with_vad_loss(model):
    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    seconds = 11.0
    n = int(16000 * seconds)
    w = np.random.default_rng(2).normal(size=(1, 2, n)).astype(np.float32)
    frames = int(seconds * 50) + 100
    vad = (np.random.default_rng(3).random((1, frames, 2)) < 0.5).astype(np.float32)
    out = ex.step_extraction(w, vad=vad)
    assert "loss" in out and out["loss"].shape[1] > 0


def test_minimal_output_json_csv(model, tmp_path):
    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    w = np.random.default_rng(0).normal(size=(2, 16000 * 2)).astype(np.float32)
    out = ex.extract(w)
    jpath = tmp_path / "out.json"
    cpath = tmp_path / "out.csv"
    ex.save_json(out, str(jpath))
    ex.save_csv(out, str(cpath))
    data = json.loads(jpath.read_text())
    assert set(data) == {"p_now", "p_future", "model_vad0", "model_vad1", "H"}
    assert len(data["p_now"]) == 100
    lines = cpath.read_text().strip().splitlines()
    assert len(lines) == 101  # header + frames


def test_streaming_vap(model):
    s = StreamingVap(model, context_time=2.0, hop_frames=5)
    s.reset()
    rng = np.random.default_rng(0)
    for _ in range(4):
        out = s.push(rng.normal(size=(2, 5 * 320)).astype(np.float32))
    assert out["p_now"].shape == (100, 2)  # context_frames rows
    assert not s.warmed_up  # 20 frames < 100
    for _ in range(16):
        out = s.push(rng.normal(size=(2, 5 * 320)).astype(np.float32))
    assert s.warmed_up


def test_streaming_is_shape_stable(model):
    """Same compiled shape regardless of how much context has accumulated."""
    s = StreamingVap(model, context_time=1.0, hop_frames=1)
    s.reset()
    rng = np.random.default_rng(1)
    shapes = set()
    for _ in range(3):
        out = s.push(rng.normal(size=(2, 320)).astype(np.float32))
        shapes.add(tuple(np.asarray(out["p_now"]).shape))
    assert shapes == {(50, 2)}


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="no example wav")
def test_sds_loop_over_wav(model):
    conf = SDSConfig(context_time=2.0, chunk_time=0.1, zmq_port=0)
    sds = TurnTakingSDS(model, conf)
    src = WavSource(EXAMPLE_WAV, chunk_samples=sds.stream.hop_samples)
    probs = []
    sds.source = src
    sds.run(max_chunks=10, log=lambda s: probs.append(s))
    assert len(probs) == 10


@pytest.mark.skipif(not os.path.exists(EXAMPLE_WAV), reason="no example wav")
def test_sds_loop_kv_mode(model):
    """KV-cache transformer mode drives the same SDS loop."""
    conf = SDSConfig(context_time=2.0, chunk_time=0.1, zmq_port=0,
                     transformer_mode="kv")
    sds = TurnTakingSDS(model, conf)
    src = WavSource(EXAMPLE_WAV, chunk_samples=sds.stream.hop_samples)
    probs = []
    sds.source = src
    sds.run(max_chunks=10, log=lambda s: probs.append(s))
    assert len(probs) == 10
    vals = [float(p.split("=")[1]) for p in probs]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_sds_rejects_unknown_transformer_mode(model):
    with pytest.raises(ValueError):
        TurnTakingSDS(model, SDSConfig(zmq_port=0, transformer_mode="nope"))


def test_sds_zero_smoothing_means_newest_frame(model):
    """prob_smooth_time=0 = 'no smoothing' (the newest frame), NOT the
    whole window (p_now[-0:]) in window mode / unbounded history in kv."""
    sds = TurnTakingSDS(model, SDSConfig(zmq_port=0, prob_smooth_time=0.0))
    assert sds.smooth_frames == 1


def test_run_cli_on_example_wav(model, tmp_path):
    """Drive the run.py CLI end-to-end on the real example wav."""
    if not os.path.exists(EXAMPLE_WAV):
        pytest.skip("no example wav")
    import subprocess, sys

    out = tmp_path / "o.json"
    env = dict(os.environ, VAP_PLATFORM="cpu")
    r = subprocess.run(
        [
            sys.executable, "run.py", "-a", EXAMPLE_WAV, "-o", str(out),
            "--vap_dim", "16", "--vap_encoder_dim", "16",
            "--vap_channel_layers", "1", "--vap_cross_layers", "1",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(out.read_text())
    assert "p_now" in data and "H" in data


def test_run_cli_context_parallel(model, tmp_path):
    """run.py --context_parallel over the 8-device CPU mesh must agree
    with the plain single-shot CLI on the shared frames."""
    if not os.path.exists(EXAMPLE_WAV):
        pytest.skip("no example wav")
    import subprocess, sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf_args = [
        "--vap_dim", "16", "--vap_encoder_dim", "16",
        "--vap_channel_layers", "1", "--vap_cross_layers", "1",
    ]
    env = dict(
        os.environ,
        VAP_PLATFORM="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8",
    )
    outs = {}
    for tag, extra in (("ctx", ["--context_parallel"]), ("plain", [])):
        out = tmp_path / f"{tag}.json"
        r = subprocess.run(
            [sys.executable, "run.py", "-a", EXAMPLE_WAV, "-o", str(out)]
            + conf_args + extra,
            cwd=root, capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = json.loads(out.read_text())
    a = np.asarray(outs["ctx"]["p_now"])
    b = np.asarray(outs["plain"]["p_now"])
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_allclose(a[:, :n], b[:, :n], rtol=1e-4, atol=1e-4)


def test_extract_single_shot_beyond_chunk_time(model):
    """Reference parity (vap/extraction.py:13,264-265): audio between one
    chunk and 160 s runs SINGLE shot — chunking would limit context to the
    rolling window."""
    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    seconds = 8.0  # > chunk_time (5 s), well under 160 s
    w = np.random.default_rng(5).normal(size=(2, int(16000 * seconds)))
    w = (w * 0.1).astype(np.float32)
    out = ex.extract(w)
    direct = model.probs(jnp.asarray(w[None]))
    np.testing.assert_allclose(
        out["p_now"], np.asarray(direct["p_now"]), atol=1e-6
    )


def test_csv_pads_short_loss_column(model, tmp_path):
    """The loss column is label-horizon shorter; the CSV keeps full length
    and zero-pads it (reference run.py json_data_to_df)."""
    import csv as csv_mod

    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    seconds = 6.0
    w = np.random.default_rng(6).normal(size=(1, 2, int(16000 * seconds)))
    w = (w * 0.1).astype(np.float32)
    # no 2 s label horizon in the VAD -> loss column is 100 frames shorter
    frames = int(seconds * 50)
    vad = (np.random.default_rng(7).random((1, frames, 2)) < 0.5).astype(
        np.float32
    )
    out = ex.step_extraction(w, vad=vad)
    assert out["loss"].shape[1] < out["p_now"].shape[1]
    cpath = tmp_path / "out.csv"
    ex.save_csv(out, str(cpath))
    with open(cpath) as f:
        rows = list(csv_mod.reader(f))
    assert len(rows) - 1 == out["p_now"].shape[1]  # header + full length
    li = rows[0].index("loss")
    assert float(rows[-1][li]) == 0.0  # padded tail


def test_chunked_shorter_than_one_chunk(model):
    """--chunk forced on audio shorter than chunk_time must not crash
    (starts list would be empty); a single pass is the chunked result."""
    ex = VapExtractor(model, context_time=4.0, step_time=1.0)
    w = np.random.default_rng(8).normal(size=(1, 2, 16000 * 3))
    w = (w * 0.1).astype(np.float32)
    out = ex.step_extraction(w)
    assert out["p_now"].shape == (1, 150, 2)
