"""PyTorch HuBERT state_dict -> JAX param pytree converter.

The reference ships inference checkpoints as bare ``state_dict``s of the HF
``HubertModel`` (`/root/reference/sylber/model/sylber.py:46-52`, loaded with
``strict=False``). This module converts such a dict (torch tensors or numpy
arrays) into the flax param tree of :class:`sylber_tpu.models.hubert.HubertModel`.

Conversion rules:
- Linear: torch (out, in) -> flax kernel (in, out)   [transpose]
- Conv1d: torch (out, in/groups, k) -> flax kernel (k, in/groups, out)
- weight-normed positional conv: g/v pairs are folded into a plain kernel
  (w = g * v / ||v||, norm over all dims except dim=2), handling both the
  old ``weight_g``/``weight_v`` names and the new
  ``parametrizations.weight.original{0,1}`` names.
- GroupNorm / LayerNorm: weight -> scale, bias -> bias.
Keys not consumed by the 9-layer encoder are ignored (strict=False parity).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _fold_weight_norm(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Return the effective (out, in/groups, k) conv weight."""
    new_g = f"{prefix}.parametrizations.weight.original0"
    new_v = f"{prefix}.parametrizations.weight.original1"
    old_g = f"{prefix}.weight_g"
    old_v = f"{prefix}.weight_v"
    plain = f"{prefix}.weight"
    if new_g in sd:
        g, v = _np(sd[new_g]), _np(sd[new_v])
    elif old_g in sd:
        g, v = _np(sd[old_g]), _np(sd[old_v])
    elif plain in sd:
        return _np(sd[plain])
    else:
        raise KeyError(f"positional conv weight not found under {prefix}")
    # weight_norm with dim=2: norm over dims (0, 1), broadcast over dim 2.
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(v.dtype)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # (out, in/groups, k) -> (k, in/groups, out)
    return np.transpose(w, (2, 1, 0))


def _dense(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def _norm(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def hubert_params_from_torch(
    state_dict: Mapping[str, Any], num_hidden_layers: int = 9
) -> Dict[str, Any]:
    """Build the flax param tree for `HubertModel` from an HF state_dict."""
    sd = state_dict

    fe: Dict[str, Any] = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        fe[f"conv_{i}"] = {
            "kernel": _conv_kernel(
                _np(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
            )
        }
        i += 1
    assert i >= 1, "no conv frontend weights found"
    fe["group_norm"] = _norm(sd, "feature_extractor.conv_layers.0.layer_norm")

    params: Dict[str, Any] = {
        "feature_extractor": fe,
        "feature_projection": {
            "layer_norm": _norm(sd, "feature_projection.layer_norm"),
            "projection": _dense(sd, "feature_projection.projection"),
        },
        "masked_spec_embed": _np(sd["masked_spec_embed"]),
        "pos_conv_embed": {
            "conv": {
                "kernel": _conv_kernel(
                    _fold_weight_norm(sd, "encoder.pos_conv_embed.conv")
                ),
                "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
            }
        },
        "encoder_layer_norm": _norm(sd, "encoder.layer_norm"),
    }

    for li in range(num_hidden_layers):
        p = f"encoder.layers.{li}"
        params[f"layer_{li}"] = {
            "attention": {
                "q_proj": _dense(sd, f"{p}.attention.q_proj"),
                "k_proj": _dense(sd, f"{p}.attention.k_proj"),
                "v_proj": _dense(sd, f"{p}.attention.v_proj"),
                "out_proj": _dense(sd, f"{p}.attention.out_proj"),
            },
            "layer_norm": _norm(sd, f"{p}.layer_norm"),
            "intermediate_dense": _dense(sd, f"{p}.feed_forward.intermediate_dense"),
            "output_dense": _dense(sd, f"{p}.feed_forward.output_dense"),
            "final_layer_norm": _norm(sd, f"{p}.final_layer_norm"),
        }

    return params


def load_torch_checkpoint(path: str, num_hidden_layers: int = 9):
    """Load a torch ``.ckpt``/``.pt`` state_dict file and convert it.

    Accepts either a bare state_dict (inference checkpoints) or a Lightning
    checkpoint with a ``state_dict`` field whose keys carry a
    ``net.speech_model.`` prefix (training checkpoints, see
    `/root/reference/train.py:49-60`).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # strip common prefixes
    for prefix in ("net.speech_model.", "speech_model.", "model."):
        if any(k.startswith(prefix) for k in obj):
            obj = {
                k[len(prefix):]: v for k, v in obj.items() if k.startswith(prefix)
            }
            break
    return hubert_params_from_torch(obj, num_hidden_layers=num_hidden_layers)
