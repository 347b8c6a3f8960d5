"""Checkpoint interop.

Three formats (SURVEY.md §5.4):
1. Reference torch state dicts (`.pt` plain and legacy Lightning `.ckpt`
   via `remap_legacy_state_dict`, vap/model.py:28-39) — imported into our
   param pytree with layout transposes (torch Conv1d (O,I,K) -> (K,I,O);
   Linear (O,I) kept row-major, applied as x @ W.T; GRU (3H,*) -> (*,3H)).
2. Native checkpoints via orbax (params + opt state + step).
3. Export back to a torch-layout state dict for cross-validation.

torch is only needed for reading `.pt` files; the importer itself works on
any {name: ndarray} mapping.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.encoder import CPC_CONV_SPECS

Params = Dict[str, Any]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pt/.ckpt into {name: numpy} (host-side)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = remap_legacy_state_dict(obj["state_dict"])
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def remap_legacy_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Older Lightning ckpt -> current names (vap/model.py:28-39):
    strip 'net.' prefix, drop 'VAP.codebook', rename
    'vap_head.projection_head' -> 'vap_head'."""
    out = {}
    for k, v in sd.items():
        if "VAP.codebook" in k:
            continue
        if "vap_head" in k:
            k = k.replace("vap_head.projection_head", "vap_head")
        out[k.replace("net.", "")] = v
    return out


def _j(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x))


def _conv_w(x) -> jnp.ndarray:
    """torch Conv1d weight (O, I, K) -> lax HIO (K, I, O)."""
    return _j(np.asarray(x).transpose(2, 1, 0))


def _import_mha(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "query": {"w": _j(sd[f"{prefix}.query.weight"])},
        "key": {"w": _j(sd[f"{prefix}.key.weight"])},
        "value": {"w": _j(sd[f"{prefix}.value.weight"])},
        "proj": {"w": _j(sd[f"{prefix}.proj.weight"])},
        "m": _j(sd[f"{prefix}.m"]),
    }


def _import_layer(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    p: Params = {
        "ln_self_attn": {
            "w": _j(sd[f"{prefix}.ln_self_attn.weight"]),
            "b": _j(sd[f"{prefix}.ln_self_attn.bias"]),
        },
        "ln_ffnetwork": {
            "w": _j(sd[f"{prefix}.ln_ffnetwork.weight"]),
            "b": _j(sd[f"{prefix}.ln_ffnetwork.bias"]),
        },
        "mha": _import_mha(sd, f"{prefix}.mha"),
        "ffn": {
            # reference ffn_block Sequential: [0]=Linear in, [3]=Linear out
            # (vap/modules.py:9-21)
            "w_in": {"w": _j(sd[f"{prefix}.ffnetwork.0.weight"])},
            "w_out": {"w": _j(sd[f"{prefix}.ffnetwork.3.weight"])},
        },
    }
    if f"{prefix}.mha_cross.query.weight" in sd:
        p["ln_src_attn"] = {
            "w": _j(sd[f"{prefix}.ln_src_attn.weight"]),
            "b": _j(sd[f"{prefix}.ln_src_attn.bias"]),
        }
        p["mha_cross"] = _import_mha(sd, f"{prefix}.mha_cross")
    return p


def _num_layers(sd: Mapping[str, np.ndarray], stack: str) -> int:
    pat = re.compile(rf"^{re.escape(stack)}\.layers\.(\d+)\.")
    idxs = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return (max(idxs) + 1) if idxs else 0


def import_encoder_state_dict(
    sd: Mapping[str, np.ndarray], prefix: str = "encoder"
) -> Params:
    """Reference EncoderCPC subtree -> encoder param pytree.

    Key map (vap/encoder.py:7-66, encoder_components.py:73-159,485-499):
      {prefix}.encoder.gEncoder.conv{i}.{weight,bias}
      {prefix}.encoder.gEncoder.batchNorm{i}.{weight,bias}  # (1, C, 1)
      {prefix}.encoder.gAR.baseNet.{weight_ih_l0,weight_hh_l0,bias_*}
      {prefix}.downsample.1.{weight,bias}        # CConv1d
      {prefix}.downsample.2.ln.{weight,bias}     # channel LayerNorm
    """
    convs = []
    for i in range(len(CPC_CONV_SPECS)):
        convs.append(
            {
                "conv": {
                    "w": _conv_w(sd[f"{prefix}.encoder.gEncoder.conv{i}.weight"]),
                    "b": _j(sd[f"{prefix}.encoder.gEncoder.conv{i}.bias"]),
                },
                "norm": {
                    "w": _j(np.asarray(sd[f"{prefix}.encoder.gEncoder.batchNorm{i}.weight"]).reshape(-1)),
                    "b": _j(np.asarray(sd[f"{prefix}.encoder.gEncoder.batchNorm{i}.bias"]).reshape(-1)),
                },
            }
        )
    gar = f"{prefix}.encoder.gAR.baseNet"
    return {
        "gEncoder": convs,
        "gAR": {
            "w_ih": _j(np.asarray(sd[f"{gar}.weight_ih_l0"]).T),
            "w_hh": _j(np.asarray(sd[f"{gar}.weight_hh_l0"]).T),
            "b_ih": _j(sd[f"{gar}.bias_ih_l0"]),
            "b_hh": _j(sd[f"{gar}.bias_hh_l0"]),
        },
        "downsample": {
            "conv": {
                "w": _conv_w(sd[f"{prefix}.downsample.1.weight"]),
                "b": _j(sd[f"{prefix}.downsample.1.bias"]),
            },
            "ln": {
                "w": _j(sd[f"{prefix}.downsample.2.ln.weight"]),
                "b": _j(sd[f"{prefix}.downsample.2.ln.bias"]),
            },
        },
    }


def import_cpc_checkpoint(sd: Mapping[str, np.ndarray]) -> Params:
    """Raw CPC checkpoint ('weights' subtree of the libri-light .pt,
    encoder_components.py:371-400) -> partial encoder pytree (no downsample)."""
    convs = []
    for i in range(len(CPC_CONV_SPECS)):
        convs.append(
            {
                "conv": {
                    "w": _conv_w(sd[f"gEncoder.conv{i}.weight"]),
                    "b": _j(sd[f"gEncoder.conv{i}.bias"]),
                },
                "norm": {
                    "w": _j(np.asarray(sd[f"gEncoder.batchNorm{i}.weight"]).reshape(-1)),
                    "b": _j(np.asarray(sd[f"gEncoder.batchNorm{i}.bias"]).reshape(-1)),
                },
            }
        )
    return {
        "gEncoder": convs,
        "gAR": {
            "w_ih": _j(np.asarray(sd["gAR.baseNet.weight_ih_l0"]).T),
            "w_hh": _j(np.asarray(sd["gAR.baseNet.weight_hh_l0"]).T),
            "b_ih": _j(sd["gAR.baseNet.bias_ih_l0"]),
            "b_hh": _j(sd["gAR.baseNet.bias_hh_l0"]),
        },
    }


# architecture-relevant fields of the CPC argparse-namespace config and
# their defaults (encoder_components.py:196-360 get_default_cpc_config).
# The on-disk libri-light blob is {"config": vars(namespace), "weights":
# state_dict}; load_CPC overrides these defaults from checkpoint["config"]
# (encoder_components.py:371-402). Non-architecture fields (lr, betas,
# sizeWindow, ...) are ignored here.
CPC_ARCH_DEFAULTS: Dict[str, Any] = {
    "hiddenEncoder": 256,
    "hiddenGar": 256,
    "arMode": "LSTM",      # the real 60k blob's config selects "GRU"
    "nLevelsGRU": 1,
    "normMode": "layerNorm",
    "encoder_type": "cpc",
    "cpc_mode": None,      # "reverse" flips the sequence (CPCAR.forward)
    "samplingType": "samespeaker",  # "sequential" => keepHidden=True
}


def load_cpc_blob(path: str) -> Params:
    """`load_CPC`-equivalent import of a libri-light-format CPC blob.

    Reads the exact on-disk format of the published checkpoint
    (encoder_components.py:371-402): a torch-pickled
    ``{"config": <dict of the training argparse namespace>, "weights":
    <CPCModel state dict>}``. The config namespace is applied over the
    defaults exactly like ``loadArgs`` does; weights load tolerantly
    (``strict=False`` analog — extra keys such as the CPC prediction
    network are ignored). Returns the partial encoder pytree
    ``{"gEncoder": ..., "gAR": ...}`` ready to graft into VAP params
    (the learned downsample is VAP-side and stays freshly initialized,
    vap/encoder.py:26-38).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(blob, dict) or "weights" not in blob:
        raise ValueError(f"{path}: not a CPC checkpoint blob "
                         "(expected {'config': ..., 'weights': ...})")
    cfg = dict(CPC_ARCH_DEFAULTS)
    cfg.update(blob.get("config", {}))

    # guard-rails: the VAP encoder contract is the GRU/layerNorm/cpc
    # architecture of the published 60k blob; refuse silently-wrong imports
    if cfg["arMode"] not in ("GRU",):
        raise ValueError(
            f"CPC blob arMode={cfg['arMode']!r}: only the GRU autoregressive "
            "network is supported (the libri-light 60k blob selects GRU)"
        )
    if cfg["encoder_type"] != "cpc" or cfg["normMode"] != "layerNorm":
        raise ValueError(
            f"unsupported CPC encoder_type={cfg['encoder_type']!r} / "
            f"normMode={cfg['normMode']!r} (expected cpc / layerNorm)"
        )
    if int(cfg["nLevelsGRU"]) != 1:
        raise ValueError(f"nLevelsGRU={cfg['nLevelsGRU']}: only 1 supported")
    if cfg["cpc_mode"] == "reverse":
        raise ValueError("cpc_mode='reverse' (flipped sequences) not supported")
    if cfg["samplingType"] == "sequential":
        # CPCAR(keepHidden=True) carries GRU state across forwards — the
        # functional VAP forward resets state per call, so refuse
        raise ValueError("samplingType='sequential' (keepHidden) not supported")
    if int(cfg["hiddenEncoder"]) != 256 or int(cfg["hiddenGar"]) != 256:
        raise ValueError(
            f"hiddenEncoder={cfg['hiddenEncoder']} hiddenGar={cfg['hiddenGar']}"
            " do not match the VAP encoder contract (256/256)"
        )

    weights = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in blob["weights"].items()
    }
    return import_cpc_checkpoint(weights)


def export_cpc_blob(encoder_params: Params, path: str) -> None:
    """Inverse of `load_cpc_blob`: write an encoder pytree (gEncoder + gAR
    subtrees, e.g. from pretrain_cpc.py) as a checkpoint in the EXACT
    libri-light on-disk format ({"config": namespace dict, "weights":
    CPCModel state dict}, encoder_components.py:371-402) — so an encoder
    pretrained IN THIS FRAMEWORK can be consumed by the reference's own
    `load_CPC` (round-trip tested in tests/test_cpc_blob.py)."""
    import torch

    weights: Dict[str, Any] = {}
    for i, layer in enumerate(encoder_params["gEncoder"]):
        weights[f"gEncoder.conv{i}.weight"] = torch.from_numpy(
            np.asarray(layer["conv"]["w"]).transpose(2, 1, 0).copy()
        )
        weights[f"gEncoder.conv{i}.bias"] = torch.from_numpy(
            np.asarray(layer["conv"]["b"]).copy()
        )
        weights[f"gEncoder.batchNorm{i}.weight"] = torch.from_numpy(
            np.asarray(layer["norm"]["w"]).reshape(1, -1, 1).copy()
        )
        weights[f"gEncoder.batchNorm{i}.bias"] = torch.from_numpy(
            np.asarray(layer["norm"]["b"]).reshape(1, -1, 1).copy()
        )
    gar = encoder_params["gAR"]
    weights["gAR.baseNet.weight_ih_l0"] = torch.from_numpy(
        np.asarray(gar["w_ih"]).T.copy()
    )
    weights["gAR.baseNet.weight_hh_l0"] = torch.from_numpy(
        np.asarray(gar["w_hh"]).T.copy()
    )
    weights["gAR.baseNet.bias_ih_l0"] = torch.from_numpy(
        np.asarray(gar["b_ih"]).copy()
    )
    weights["gAR.baseNet.bias_hh_l0"] = torch.from_numpy(
        np.asarray(gar["b_hh"]).copy()
    )
    dim = int(np.asarray(gar["w_hh"]).shape[0])
    config = dict(
        CPC_ARCH_DEFAULTS,
        arMode="GRU",
        hiddenEncoder=dim,
        hiddenGar=dim,
    )
    torch.save({"config": config, "weights": weights}, path)


def import_vap_state_dict(sd: Mapping[str, np.ndarray], conf: VapConfig) -> Params:
    """Full reference VapGPT state dict -> VapModel param pytree."""
    params: Params = {"encoder": import_encoder_state_dict(sd, "encoder")}
    for stack in ("ar_channel", "ar"):
        n = _num_layers(sd, stack)
        params[stack] = {
            "layers": [_import_layer(sd, f"{stack}.layers.{i}") for i in range(n)]
        }
    if "ar.combinator.h0_a.weight" in sd:
        params["ar"]["combinator"] = {
            "h0_a": {"w": _j(sd["ar.combinator.h0_a.weight"])},
            "h0_b": {"w": _j(sd["ar.combinator.h0_b.weight"])},
            "ln": {
                "w": _j(sd["ar.combinator.ln.weight"]),
                "b": _j(sd["ar.combinator.ln.bias"]),
            },
        }
    if "va_classifier.weight" in sd:
        params["va_classifier"] = {
            "w": _j(sd["va_classifier.weight"]),
            "b": _j(sd["va_classifier.bias"]),
        }
    params["vap_head"] = {
        "w": _j(sd["vap_head.weight"]),
        "b": _j(sd["vap_head.bias"]),
    }
    head_w = params["vap_head"]["w"]
    if head_w.shape != (conf.head_dim, conf.dim):
        raise ValueError(
            f"vap_head shape {tuple(head_w.shape)} does not match config "
            f"(head_dim={conf.head_dim} for representation="
            f"{conf.representation!r}, dim={conf.dim}) — importing a "
            "mismatched head would silently produce garbage probabilities"
        )
    return params


# --------------------------------------------------------------------------
# export (param pytree -> torch-layout state dict)
# --------------------------------------------------------------------------
def _export_mha(p: Params, prefix: str, out: Dict[str, np.ndarray]) -> None:
    for name in ("query", "key", "value", "proj"):
        out[f"{prefix}.{name}.weight"] = np.asarray(p[name]["w"])
    out[f"{prefix}.m"] = np.asarray(p["m"])


def _export_layer(p: Params, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.ln_self_attn.weight"] = np.asarray(p["ln_self_attn"]["w"])
    out[f"{prefix}.ln_self_attn.bias"] = np.asarray(p["ln_self_attn"]["b"])
    out[f"{prefix}.ln_ffnetwork.weight"] = np.asarray(p["ln_ffnetwork"]["w"])
    out[f"{prefix}.ln_ffnetwork.bias"] = np.asarray(p["ln_ffnetwork"]["b"])
    _export_mha(p["mha"], f"{prefix}.mha", out)
    out[f"{prefix}.ffnetwork.0.weight"] = np.asarray(p["ffn"]["w_in"]["w"])
    out[f"{prefix}.ffnetwork.3.weight"] = np.asarray(p["ffn"]["w_out"]["w"])
    if "mha_cross" in p:
        out[f"{prefix}.ln_src_attn.weight"] = np.asarray(p["ln_src_attn"]["w"])
        out[f"{prefix}.ln_src_attn.bias"] = np.asarray(p["ln_src_attn"]["b"])
        _export_mha(p["mha_cross"], f"{prefix}.mha_cross", out)


def export_vap_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Param pytree -> reference-layout {name: numpy} state dict (inverse of
    `import_vap_state_dict`; usable for cross-validating against torch)."""
    out: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    for i, layer in enumerate(enc["gEncoder"]):
        out[f"encoder.encoder.gEncoder.conv{i}.weight"] = np.asarray(
            layer["conv"]["w"]
        ).transpose(2, 1, 0)
        out[f"encoder.encoder.gEncoder.conv{i}.bias"] = np.asarray(layer["conv"]["b"])
        out[f"encoder.encoder.gEncoder.batchNorm{i}.weight"] = np.asarray(
            layer["norm"]["w"]
        ).reshape(1, -1, 1)
        out[f"encoder.encoder.gEncoder.batchNorm{i}.bias"] = np.asarray(
            layer["norm"]["b"]
        ).reshape(1, -1, 1)
    gar = enc["gAR"]
    out["encoder.encoder.gAR.baseNet.weight_ih_l0"] = np.asarray(gar["w_ih"]).T
    out["encoder.encoder.gAR.baseNet.weight_hh_l0"] = np.asarray(gar["w_hh"]).T
    out["encoder.encoder.gAR.baseNet.bias_ih_l0"] = np.asarray(gar["b_ih"])
    out["encoder.encoder.gAR.baseNet.bias_hh_l0"] = np.asarray(gar["b_hh"])
    out["encoder.downsample.1.weight"] = np.asarray(
        enc["downsample"]["conv"]["w"]
    ).transpose(2, 1, 0)
    out["encoder.downsample.1.bias"] = np.asarray(enc["downsample"]["conv"]["b"])
    out["encoder.downsample.2.ln.weight"] = np.asarray(enc["downsample"]["ln"]["w"])
    out["encoder.downsample.2.ln.bias"] = np.asarray(enc["downsample"]["ln"]["b"])

    for stack in ("ar_channel", "ar"):
        for i, layer in enumerate(params[stack]["layers"]):
            _export_layer(layer, f"{stack}.layers.{i}", out)
    if "combinator" in params["ar"]:
        comb = params["ar"]["combinator"]
        out["ar.combinator.h0_a.weight"] = np.asarray(comb["h0_a"]["w"])
        out["ar.combinator.h0_b.weight"] = np.asarray(comb["h0_b"]["w"])
        out["ar.combinator.ln.weight"] = np.asarray(comb["ln"]["w"])
        out["ar.combinator.ln.bias"] = np.asarray(comb["ln"]["b"])
    if "va_classifier" in params:
        out["va_classifier.weight"] = np.asarray(params["va_classifier"]["w"])
        out["va_classifier.bias"] = np.asarray(params["va_classifier"]["b"])
    # mono-model VAD conditioning (vap/model.py:308-314)
    if "va_condition" in params:
        out["va_condition.weight"] = np.asarray(params["va_condition"]["w"])
        out["va_condition.bias"] = np.asarray(params["va_condition"]["b"])
        out["va_cond_ln.weight"] = np.asarray(params["va_cond_ln"]["w"])
        out["va_cond_ln.bias"] = np.asarray(params["va_cond_ln"]["b"])
    if "va_cond_history" in params:
        out["va_cond_history.weight"] = np.asarray(params["va_cond_history"]["w"])
        out["va_cond_history.bias"] = np.asarray(params["va_cond_history"]["b"])
    out["vap_head.weight"] = np.asarray(params["vap_head"]["w"])
    out["vap_head.bias"] = np.asarray(params["vap_head"]["b"])
    return out


# --------------------------------------------------------------------------
# native checkpoints (orbax)
# --------------------------------------------------------------------------
def save_checkpoint(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        try:
            return ckptr.restore(path, template)
        except ValueError:
            # the template selects a SUBSET of the on-disk items — e.g.
            # every params-only consumer (evaluate/run/extraction CLIs,
            # VapModel.from_args) reading a FULL training-state checkpoint
            # ({"params", "opt_state", "step"}, Trainer.save): restore
            # unstructured and select the requested top-level keys. The
            # fallback is gated on the selection matching the template's
            # STRUCTURE AND LEAF SHAPES — a genuinely mismatched
            # checkpoint (e.g. different model dims) must re-raise the
            # descriptive orbax error, not return silently-wrong arrays.
            import jax

            full = ckptr.restore(path)
            if (
                isinstance(template, Mapping)
                and isinstance(full, Mapping)
                and set(template) < set(full)
            ):
                sel = {k: full[k] for k in template}
                if jax.tree.structure(sel) == jax.tree.structure(
                    template
                ) and all(
                    getattr(a, "shape", None) == getattr(b, "shape", None)
                    for a, b in zip(
                        jax.tree.leaves(sel), jax.tree.leaves(template)
                    )
                ):
                    return sel
            raise
