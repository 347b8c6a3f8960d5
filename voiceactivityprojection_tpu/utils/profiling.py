"""Profiling / tracing utilities (SURVEY.md §5.1).

The reference has no profiler integration (closest: manual forward/backward
hooks in analyzes/model_params_grad.py:8-156). TPU-native replacements:

* `trace(...)` — context manager around `jax.profiler` writing a
  TensorBoard-loadable trace directory (host + device timelines, HLO).
* `annotate(name)` — `jax.profiler.TraceAnnotation` for custom spans.
* `activation_stats` / `gradient_stats` — functional equivalents of the
  reference's layer-output/grad histogram hooks: per-subtree statistics
  (mean/std/absmax/histogram) of any pytree of activations or gradients.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vap_trace"):
    """Profile the enclosed block: `with trace("dir"): run_step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def _leaf_stats(x: np.ndarray, bins: int) -> Dict[str, Any]:
    x = np.asarray(x, dtype=np.float64).ravel()
    hist, edges = np.histogram(x, bins=bins)
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
        "frac_zero": float((x == 0).mean()),
        "hist": hist.tolist(),
        "bin_edges": edges.tolist(),
    }


def tree_stats(tree: Any, bins: int = 30, prefix: str = "") -> Dict[str, Dict]:
    """Per-leaf statistics keyed by '/'-joined pytree path — works for
    params, activations, or gradients (reference model_params_grad.py
    histogram equivalent)."""
    out: Dict[str, Dict] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        name = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = _leaf_stats(np.asarray(leaf), bins)
    return out


def activation_stats(
    model, waveform, layer_outputs: bool = True, bins: int = 30
) -> Dict[str, Dict]:
    """Forward the model capturing intermediate outputs, return stats per
    stage (encoder features, per-stack outputs, logits)."""
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.models.encoder import apply_encoder
    from voiceactivityprojection_tpu.models.transformer import apply_gpt, apply_gpt_stereo

    conf = model.conf
    params = model.params
    w = jnp.asarray(waveform)
    B = w.shape[0]
    both = w.reshape(B * 2, w.shape[-1])
    z = apply_encoder(params["encoder"], both).reshape(B, 2, -1, conf.dim)
    x1, x2 = z[:, 0], z[:, 1]
    acts = {"encoder_x1": x1, "encoder_x2": x2}
    o1 = apply_gpt(params["ar_channel"], x1, num_heads=conf.num_heads)
    o2 = apply_gpt(params["ar_channel"], x2, num_heads=conf.num_heads)
    acts["ar_channel_x1"] = o1["x"]
    acts["ar_channel_x2"] = o2["x"]
    out = apply_gpt_stereo(params["ar"], o1["x"], o2["x"], num_heads=conf.num_heads)
    acts["ar_x"] = out["x"]
    acts["logits"] = out["x"] @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    return {k: _leaf_stats(np.asarray(v), bins) for k, v in acts.items()}


def gradient_stats(model, batch: Dict[str, Any], bins: int = 30) -> Dict[str, Dict]:
    """Gradient histograms of the multitask loss wrt every param leaf."""
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.train.step import loss_fn

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    grads = jax.grad(lambda p: loss_fn(p, jbatch, model.conf)[0])(model.params)
    return tree_stats(grads, bins=bins, prefix="grad/")
