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

import os
from typing import Any, Dict, Mapping

import numpy as np


def torch_load(path: str):
    """`torch.load` that refuses arbitrary-pickle execution by default.

    Tries ``weights_only=True`` first (tensors/containers only — covers bare
    state_dicts and plain tensor checkpoints, including everything the HF-hub
    fallback fetches). Checkpoints that genuinely need full unpickling
    (e.g. Lightning ckpts embedding config objects) require the explicit
    opt-in ``SYLBER_TPU_UNSAFE_TORCH_LOAD=1``.
    """
    import torch

    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if os.environ.get("SYLBER_TPU_UNSAFE_TORCH_LOAD") == "1":
            return torch.load(path, map_location="cpu", weights_only=False)
        raise RuntimeError(
            f"{path} is not loadable with weights_only=True ({e}). If you "
            "trust this checkpoint (e.g. a local Lightning ckpt with pickled "
            "config objects), set SYLBER_TPU_UNSAFE_TORCH_LOAD=1 to allow "
            "full unpickling."
        ) from e


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
    obj = torch_load(path)
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


# ---------------- SegmentSynthesis (flow-matching) checkpoints ----------------

def _maybe(sd, key):
    return _np(sd[key]) if key in sd else None


def regressor_params_from_torch(sd: Mapping[str, Any], depth: int = 8,
                                prefix: str = "regressor.") -> Dict[str, Any]:
    """Map the reference Regressor state_dict
    (`/root/reference/sylber/model/flowmatching.py:474-560`) onto
    `sylber_tpu.models.voicebox.Regressor` params. Weight-norm-free; the
    unused text-embedding (`to_cond_emb`) and `null_cond` entries are
    skipped (they do not participate in the SegmentSynthesis path)."""
    g = lambda k: _np(sd[prefix + k])

    params: Dict[str, Any] = {
        "proj_in": {"kernel": g("proj_in.weight").T,
                    "bias": g("proj_in.bias")},
        "time_freqs": g("sinu_pos_emb.0.weights"),
        "time_mlp": {"kernel": g("sinu_pos_emb.1.weight").T,
                     "bias": g("sinu_pos_emb.1.bias")},
        "to_embed": {"kernel": g("to_embed.weight").T,
                     "bias": g("to_embed.bias")},
        "conv_pos_embed": {
            # torch depthwise conv (dim, 1, k) -> flax (k, 1, dim)
            "kernel": np.transpose(g("conv_embed.dw_conv1d.0.weight"),
                                   (2, 1, 0)),
            "bias": g("conv_embed.dw_conv1d.0.bias"),
        },
        "to_pred": {"kernel": g("to_pred.weight").T},
    }

    tr: Dict[str, Any] = {}
    if prefix + "transformer.register_tokens" in sd:
        tr["register_tokens"] = g("transformer.register_tokens")
    for i in range(depth):
        lp = f"transformer.layers.{i}."
        # ModuleList slots: 0 skip_combiner|None, 1 gateloop|None,
        # 2 attn prenorm, 3 attention, 4 ff prenorm, 5 feedforward
        if prefix + lp + "0.weight" in sd:
            tr[f"skip_combiner_{i}"] = {"kernel": g(lp + "0.weight").T,
                                        "bias": g(lp + "0.bias")}
        tr[f"attn_norm_{i}"] = {
            "to_gamma": {"kernel": g(lp + "2.to_gamma.weight").T,
                         "bias": g(lp + "2.to_gamma.bias")},
            "to_beta": {"kernel": g(lp + "2.to_beta.weight").T,
                        "bias": g(lp + "2.to_beta.bias")},
        }
        attn = {
            "to_qkv": {"kernel": g(lp + "3.to_qkv.weight").T},
            "to_out": {"kernel": g(lp + "3.to_out.weight").T},
        }
        if prefix + lp + "3.q_norm.gamma" in sd:
            attn["q_norm_gamma"] = g(lp + "3.q_norm.gamma")
            attn["k_norm_gamma"] = g(lp + "3.k_norm.gamma")
        tr[f"attn_{i}"] = attn
        tr[f"ff_norm_{i}"] = {
            "to_gamma": {"kernel": g(lp + "4.to_gamma.weight").T,
                         "bias": g(lp + "4.to_gamma.bias")},
            "to_beta": {"kernel": g(lp + "4.to_beta.weight").T,
                        "bias": g(lp + "4.to_beta.bias")},
        }
        tr[f"ff_{i}"] = {
            "proj_in": {"kernel": g(lp + "5.0.weight").T,
                        "bias": g(lp + "5.0.bias")},
            "proj_out": {"kernel": g(lp + "5.3.weight").T,
                         "bias": g(lp + "5.3.bias")},
        }
    tr["final_norm"] = {"gamma": g("transformer.final_norm.gamma")}
    params["transformer"] = tr
    return params


def input_mlp_params_from_torch(sd: Mapping[str, Any],
                                n_hidden: int = 2,
                                prefix: str = "input_model.") -> Dict[str, Any]:
    """Map the reference input MLP (`segment_synthesis.py:35-53`; Sequential
    [Linear, RFF] * n_hidden + Linear) onto `sylber_tpu.synthesis.InputMLP`."""
    g = lambda k: _np(sd[prefix + "mlp." + k])
    params: Dict[str, Any] = {}
    for i in range(n_hidden):
        lin, rff = 2 * i, 2 * i + 1
        params[f"in_{i}"] = {"kernel": g(f"{lin}.weight").T,
                             "bias": g(f"{lin}.bias")}
        params[f"rff_{i}"] = {
            "linear1": {"kernel": g(f"{rff}.linear1.weight").T,
                        "bias": g(f"{rff}.linear1.bias")},
            "linear2": {"kernel": g(f"{rff}.linear2.weight").T,
                        "bias": g(f"{rff}.linear2.bias")},
            "norm": {"scale": g(f"{rff}.norm.weight"),
                     "bias": g(f"{rff}.norm.bias")},
        }
    params["out"] = {"kernel": g(f"{2 * n_hidden}.weight").T,
                     "bias": g(f"{2 * n_hidden}.bias")}
    return params


def load_synthesis_checkpoint(path: str, config) -> Any:
    """Load a torch SegmentSynthesis checkpoint (e.g. the reference's
    `synthesis_sylber.ckpt`) into `SynthesisParams`."""
    from ..synthesis import SynthesisParams

    obj = torch_load(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if any(k.startswith("net.") for k in obj):
        obj = {k[len("net."):]: v for k, v in obj.items()
               if k.startswith("net.")}
    hubert_sd = {k[len("speech_model."):]: v for k, v in obj.items()
                 if k.startswith("speech_model.")}
    return SynthesisParams(
        hubert=hubert_params_from_torch(
            hubert_sd, num_hidden_layers=config.encoding_layer),
        input_mlp=input_mlp_params_from_torch(
            obj, n_hidden=len(config.input_hidden_dims)),
        regressor=regressor_params_from_torch(
            obj, depth=config.regressor.depth),
    )


def quantizer_state_from_torch(sd: Mapping[str, Any], cfg) -> Any:
    """Convert a reference trainable-Quantizer checkpoint
    (`/root/reference/sylber/model/quantizer.py:182-257`, built on
    vector-quantize-pytorch GroupedResidualVQ) into a
    `sylber_tpu.flow.quantizer.QuantizerState`.

    vector-quantize-pytorch layout: codebooks live at
    ``{art,pitch}_vq.rvqs.{group}.layers.{quantizer}._codebook.embed`` with a
    leading num_codebooks dim of 1; the FF encoder is
    ``encoder.mlp.{2i}`` Linears interleaved with FeedForward Sequentials
    (Linear at .0, Linear at .3)."""
    from ..flow.quantizer import QuantizerState, VQState

    def encoder_params():
        params = []
        n_hidden = len(cfg.hidden_dims)
        for i in range(n_hidden):
            params.append(_dense(sd, f"encoder.mlp.{2 * i}"))
            params.append(_dense(sd, f"encoder.mlp.{2 * i + 1}.0"))
            params.append(_dense(sd, f"encoder.mlp.{2 * i + 1}.3"))
        params.append(_dense(sd, f"encoder.mlp.{2 * n_hidden}"))
        return params

    def vq_state(prefix, vq_cfg):
        import numpy as _numpy

        cbs = _numpy.zeros((vq_cfg.groups, vq_cfg.num_quantizers,
                            vq_cfg.codebook_size, vq_cfg.dim_group),
                           _numpy.float32)
        for g in range(vq_cfg.groups):
            for q in range(vq_cfg.num_quantizers):
                e = _np(sd[f"{prefix}.rvqs.{g}.layers.{q}._codebook.embed"])
                cbs[g, q] = e[0] if e.ndim == 3 else e
        import jax.numpy as _jnp

        cbs = _jnp.asarray(cbs)
        return VQState(cbs, _jnp.ones(cbs.shape[:-1]), cbs * 1.0)

    return QuantizerState(
        encoder=encoder_params(),
        art_vq=vq_state("art_vq", cfg.art_vq),
        pitch_vq=vq_state("pitch_vq", cfg.pitch_vq),
    )


# ---------------- HiFi-GAN vocoder checkpoints ----------------

def _fold_weight_norm_any(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Fold torch weight_norm g/v; the kept dim is inferred from g's shape
    (its single non-singleton axis), so any ``weight_norm(dim=...)`` works."""
    for gk, vk in ((f"{prefix}.parametrizations.weight.original0",
                    f"{prefix}.parametrizations.weight.original1"),
                   (f"{prefix}.weight_g", f"{prefix}.weight_v")):
        if gk in sd:
            g, v = _np(sd[gk]), _np(sd[vk])
            non_single = [i for i, s in enumerate(np.shape(g)) if s > 1]
            dim = non_single[0] if non_single else 0
            axes = tuple(i for i in range(v.ndim) if i != dim)
            norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes,
                                                           keepdims=True))
            return (g * v / norm).astype(v.dtype)
    return _np(sd[f"{prefix}.weight"])


def hifigan_params_from_torch(sd: Mapping[str, Any],
                              config=None) -> Dict[str, Any]:
    """Convert a jik876-style HiFi-GAN ``generator`` state_dict (weight-norm
    g/v folded) to :class:`sylber_tpu.vocoder.hifigan.Generator` params.

    Layout handled: ``conv_pre``, ``ups.{i}`` (ConvTranspose1d), flat
    ``resblocks.{i*K+j}.convs{1,2}.{m}``, ``conv_post``. Torch Conv1d
    (out, in, k) -> flax (k, in, out); torch ConvTranspose1d (in, out, k) ->
    flax default layout (k, in, out) with the spatial axis flipped
    (validated against torch.nn.ConvTranspose1d in tests)."""
    from ..vocoder.hifigan import HiFiGANConfig

    cfg = config or HiFiGANConfig()
    n_up = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernel_sizes)
    strip = ""
    for cand in ("generator.", "model.generator.", "module."):
        if any(k.startswith(cand) for k in sd):
            strip = cand
            break
    if strip:
        sd = {k[len(strip):]: v for k, v in sd.items() if k.startswith(strip)}

    def conv(prefix):
        w = _fold_weight_norm_any(sd, prefix)
        out = {"kernel": np.transpose(w, (2, 1, 0))}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def tconv(prefix):
        w = _fold_weight_norm_any(sd, prefix)
        # torch ConvTranspose1d weight (in, out, k) -> flax (k, in, out),
        # spatial flip (flax ConvTranspose default transpose_kernel=False)
        out = {"kernel": np.ascontiguousarray(
            np.transpose(w, (2, 0, 1))[::-1])}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    params: Dict[str, Any] = {"conv_pre": conv("conv_pre"),
                              "conv_post": conv("conv_post")}
    for i in range(n_up):
        params[f"ups_{i}"] = tconv(f"ups.{i}")
        for j in range(n_k):
            rb = f"resblocks.{i * n_k + j}"
            block: Dict[str, Any] = {}
            m = 0
            while f"{rb}.convs1.{m}.weight" in sd or \
                    f"{rb}.convs1.{m}.weight_v" in sd or \
                    f"{rb}.convs1.{m}.parametrizations.weight.original0" in sd:
                block[f"convs1_{m}"] = conv(f"{rb}.convs1.{m}")
                block[f"convs2_{m}"] = conv(f"{rb}.convs2.{m}")
                m += 1
            assert m > 0, f"no convs found under {rb}"
            params[f"resblock_{i}_{j}"] = block
    return params
