"""Direct behavioral parity against the reference implementation itself.

These tests import the reference's own torch modules from the read-only
mount (/root/reference) and diff their outputs against ours on identical
random inputs — no re-implemented oracles in between. torchaudio (absent
in this image) is stubbed since the imported code paths never call it.

Covered: ObjectiveVAP (labels, losses, p-aggregation), ZeroShot subsets +
dialog-state dispatch, TurnTakingEvents (full extraction incl. balancing,
with seeded RNG), MultiHeadAttentionAlibi + TransformerLayer weights-level
equivalence, and vad morphology utils.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.model

torch = pytest.importorskip("torch")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "vap")), reason="no reference mount"
)


@pytest.fixture(scope="module")
def refmod():
    """Import reference modules with torchaudio stubbed."""
    for name in ("torchaudio", "torchaudio.functional", "torchaudio.transforms"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import vap.objective as ref_objective
    import vap.zero_shot as ref_zero_shot
    import vap.events as ref_events
    import vap.modules as ref_modules
    import vap.utils as ref_utils

    return types.SimpleNamespace(
        objective=ref_objective,
        zero_shot=ref_zero_shot,
        events=ref_events,
        modules=ref_modules,
        utils=ref_utils,
    )


def rand_vad(B=4, N=1100, seed=0):
    rng = np.random.default_rng(seed)
    vad = np.zeros((B, N, 2), dtype=np.float32)
    for b in range(B):
        for c in range(2):
            t = 0
            while t < N:
                dur = int(rng.integers(10, 120))
                if rng.random() < 0.5:
                    vad[b, t : t + dur, c] = 1.0
                t += dur
    return vad


# ----------------------------------------------------------------------
# objective
# ----------------------------------------------------------------------
@needs_ref
def test_labels_match_reference(refmod):
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.ops.codebook import get_labels

    ob = refmod.objective.ObjectiveVAP()
    vad = rand_vad(seed=1)
    want = ob.get_labels(torch.from_numpy(vad)).numpy()
    got = np.asarray(get_labels(jnp.asarray(vad), [10, 20, 30, 40]))
    np.testing.assert_array_equal(got, want)


@needs_ref
def test_probs_aggregate_matches_reference(refmod):
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.ops.codebook import (
        probs_next_speaker_aggregate,
    )

    ob = refmod.objective.ObjectiveVAP()
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 37, 256)).astype(np.float32)
    probs = torch.from_numpy(logits).softmax(-1)
    for frm, to in [(0, 1), (2, 3), (0, 3)]:
        want = ob.probs_next_speaker_aggregate(probs, frm, to).numpy()
        got = np.asarray(
            probs_next_speaker_aggregate(jnp.asarray(probs.numpy()), frm, to)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


@needs_ref
def test_loss_vap_matches_reference(refmod):
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.ops.losses import loss_vap

    ob = refmod.objective.ObjectiveVAP()
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 1100, 256)).astype(np.float32)
    vad = rand_vad(B=2, seed=4)
    labels = ob.get_labels(torch.from_numpy(vad))
    want = ob.loss_vap(torch.from_numpy(logits), labels).item()
    got = float(loss_vap(jnp.asarray(logits), jnp.asarray(labels.numpy())))
    assert got == pytest.approx(want, rel=1e-5)


# ----------------------------------------------------------------------
# zero-shot
# ----------------------------------------------------------------------
@needs_ref
def test_zero_shot_subsets_match_reference(refmod):
    from voiceactivityprojection_tpu.events.zero_shot import ZeroShot

    ref = refmod.zero_shot.ZeroShot()
    ours = ZeroShot()
    np.testing.assert_array_equal(
        np.sort(np.asarray(ours.subset_silence)), np.sort(ref.subset_silence.numpy())
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(ours.subset_active)), np.sort(ref.subset_active.numpy())
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(ours.subset_active_hold)),
        np.sort(ref.subset_active_hold.numpy()),
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(ours.bc_prediction)), np.sort(ref.bc_prediction.numpy())
    )


@needs_ref
def test_zero_shot_probs_match_reference(refmod):
    from voiceactivityprojection_tpu.events.zero_shot import ZeroShot

    ref = refmod.zero_shot.ZeroShot()
    ours = ZeroShot()
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(2, 200, 256)).astype(np.float32)
    vad = rand_vad(B=2, N=200, seed=6)
    want = ref.get_probs(torch.from_numpy(logits), torch.from_numpy(vad))
    got = ours.get_probs(logits, vad)
    np.testing.assert_allclose(got["p"], want["p"].numpy(), atol=1e-5)
    np.testing.assert_allclose(got["p_bc"], want["p_bc"].numpy(), atol=1e-5)


# ----------------------------------------------------------------------
# events
# ----------------------------------------------------------------------
@needs_ref
def test_hold_shift_regions_match_reference(refmod):
    from voiceactivityprojection_tpu.events.events import hold_shift_regions
    from voiceactivityprojection_tpu.ops.vad import get_dialog_states_np

    vad = rand_vad(B=6, seed=7)
    for b in range(6):
        ds = get_dialog_states_np(vad[b])
        got = hold_shift_regions(
            vad[b], ds,
            pre_cond_frames=50, post_cond_frames=50,
            prediction_region_frames=25, prediction_region_on_active=True,
            long_onset_condition_frames=50, long_onset_region_frames=10,
            min_silence_frames=12, min_context_frames=150, max_frame=1000,
        )
        tv = torch.from_numpy(vad[b])
        tds = refmod.events.get_dialog_states(tv)
        want = refmod.events.hold_shift_regions(
            vad=tv, ds=tds,
            pre_cond_frames=50, post_cond_frames=50,
            prediction_region_frames=25, prediction_region_on_active=True,
            long_onset_condition_frames=50, long_onset_region_frames=10,
            min_silence_frames=12, min_context_frames=150, max_frame=1000,
        )
        for key in ("shift", "hold", "long", "pred_shift", "pred_hold"):
            assert got[key] == [tuple(e) for e in want[key]], (b, key)


@needs_ref
def test_backchannel_regions_match_reference(refmod):
    from voiceactivityprojection_tpu.events.events import backchannel_regions
    from voiceactivityprojection_tpu.ops.vad import get_dialog_states_np

    vad = rand_vad(B=6, seed=8)
    for b in range(6):
        ds = get_dialog_states_np(vad[b])
        got = backchannel_regions(
            vad[b], ds,
            pre_cond_frames=50, post_cond_frames=50,
            prediction_region_frames=25, min_context_frames=150,
            max_bc_frames=50, max_frame=1000,
        )
        tv = torch.from_numpy(vad[b])
        tds = refmod.events.get_dialog_states(tv)
        want = refmod.events.backchannel_regions(
            vad=tv, ds=tds,
            pre_cond_frames=50, post_cond_frames=50,
            prediction_region_frames=25, min_context_frames=150,
            max_bc_frames=50, max_frame=1000,
        )
        for key in ("backchannel", "pred_backchannel"):
            assert got[key] == [tuple(e) for e in want[key]], (b, key)


@needs_ref
def test_negative_regions_match_reference(refmod):
    from voiceactivityprojection_tpu.events.events import (
        get_negative_sample_regions,
    )
    from voiceactivityprojection_tpu.ops.vad import get_dialog_states_np

    vad = rand_vad(B=6, seed=9)
    for b in range(6):
        ds = get_dialog_states_np(vad[b])
        got = get_negative_sample_regions(
            vad[b], ds,
            min_pad_left_frames=50, min_pad_right_frames=100,
            min_region_frames=25, min_context_frames=150, max_frame=1000,
        )
        tv = torch.from_numpy(vad[b])
        tds = refmod.events.get_dialog_states(tv)
        want = refmod.events.get_negative_sample_regions(
            vad=tv, ds=tds,
            min_pad_left_frames=50, min_pad_right_frames=100,
            min_region_frames=25, min_context_frames=150, max_frame=1000,
        )
        assert got == [tuple(e) for e in want], b


@needs_ref
def test_fill_pauses_matches_reference(refmod):
    from voiceactivityprojection_tpu.events.events import fill_pauses
    from voiceactivityprojection_tpu.ops.vad import get_dialog_states_np

    vad = rand_vad(B=4, seed=10)
    for b in range(4):
        ds = get_dialog_states_np(vad[b])
        got = fill_pauses(vad[b], ds)
        tv = torch.from_numpy(vad[b].copy())
        want = refmod.events.fill_pauses(tv, refmod.events.get_dialog_states(tv))
        np.testing.assert_array_equal(got, want.numpy())


# ----------------------------------------------------------------------
# attention / transformer (reference weights -> our apply)
# ----------------------------------------------------------------------
@needs_ref
def test_reference_attention_weights_match(refmod):
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.ops.attention import attention_dense

    m = refmod.modules.MultiHeadAttentionAlibi(dim=32, num_heads=4, dropout=0.0)
    m.eval()
    x = torch.randn(2, 15, 32)
    with torch.no_grad():
        want, want_w = m(Q=x, K=x, V=x)

    params = {
        "query": {"w": jnp.asarray(m.query.weight.detach().numpy())},
        "key": {"w": jnp.asarray(m.key.weight.detach().numpy())},
        "value": {"w": jnp.asarray(m.value.weight.detach().numpy())},
        "proj": {"w": jnp.asarray(m.proj.weight.detach().numpy())},
        "m": jnp.asarray(m.m.detach().numpy()),
    }
    got, got_w = attention_dense(
        params, jnp.asarray(x.numpy()), jnp.asarray(x.numpy()), 4, return_weights=True
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), atol=1e-5)


@needs_ref
def test_reference_transformer_layer_matches(refmod):
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.models.transformer import (
        apply_transformer_layer,
    )

    layer = refmod.modules.TransformerLayer(
        dim=32, ffn_dim=96, num_heads=4, dropout=0.0, cross_attention=True
    )
    layer.eval()
    x = torch.randn(1, 11, 32)
    src = torch.randn(1, 11, 32)
    with torch.no_grad():
        want, _, _ = layer(x, src=src)

    def j(t):
        return jnp.asarray(t.detach().numpy())

    def mha(m):
        return {
            "query": {"w": j(m.query.weight)}, "key": {"w": j(m.key.weight)},
            "value": {"w": j(m.value.weight)}, "proj": {"w": j(m.proj.weight)},
            "m": j(m.m),
        }

    params = {
        "ln_self_attn": {"w": j(layer.ln_self_attn.weight), "b": j(layer.ln_self_attn.bias)},
        "ln_ffnetwork": {"w": j(layer.ln_ffnetwork.weight), "b": j(layer.ln_ffnetwork.bias)},
        "ln_src_attn": {"w": j(layer.ln_src_attn.weight), "b": j(layer.ln_src_attn.bias)},
        "mha": mha(layer.mha),
        "mha_cross": mha(layer.mha_cross),
        "ffn": {
            "w_in": {"w": j(layer.ffnetwork[0].weight)},
            "w_out": {"w": j(layer.ffnetwork[3].weight)},
        },
    }
    got, _, _ = apply_transformer_layer(
        params, j(x), src=j(src), num_heads=4
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


# ----------------------------------------------------------------------
# utils
# ----------------------------------------------------------------------
@needs_ref
def test_vad_morphology_matches_reference(refmod):
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.ops.vad import (
        vad_fill_silences,
        vad_omit_spikes,
    )

    vad = rand_vad(B=1, N=400, seed=11)[0]
    for t in (0.02, 0.1, 0.2):
        want_fill = refmod.utils.vad_fill_silences(
            torch.from_numpy(vad.copy()), max_fill_time=t, frame_hz=50
        ).numpy()
        got_fill = np.asarray(vad_fill_silences(jnp.asarray(vad), t, 50))
        np.testing.assert_array_equal(got_fill, want_fill)

        want_omit = refmod.utils.vad_omit_spikes(
            torch.from_numpy(vad.copy()), max_omit_time=t, frame_hz=50
        ).numpy()
        got_omit = np.asarray(vad_omit_spikes(jnp.asarray(vad), t, 50))
        np.testing.assert_array_equal(got_omit, want_omit)
