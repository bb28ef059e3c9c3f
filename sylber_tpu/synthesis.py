"""SegmentSynthesis: syllable features -> articulatory trajectories (SPARC).

Public surface mirrors the reference
(`/root/reference/sylber/model/segment_synthesis.py:56-201`):

    synth = SegmentSynthesis(model_ckpt=..., **sylber_resynthesis.yaml)
    art, segments = synth.resynthesize(features=..., steps=50)

Output: (B, L, 14) trajectories — 12 EMA articulation dims + log-pitch
(channel 12, divided by ``pitch_amp`` on output, `segment_synthesis.py:145`)
+ loudness. The whole path (optional HuBERT forward + on-device segmentation
+ averaged fill + input MLP + ODE sampling) runs jitted; the fixed-grid
midpoint sampler is a `lax.scan` (no per-step host dispatch, unlike
torchdiffeq).

The reference's *training* forward is broken dead code (never computes
``cfm_loss`` and references undefined attributes — SURVEY.md §2.4.3);
`loss`/`make_synthesis_train_step` implement the intended CFM objective:
target ``art`` with the pitch channel pre-scaled by ``pitch_amp``
(`segment_synthesis.py:198`), cond_emb = MLP of the averaged/blanked hidden
states, voicebox infilling conditioning.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .flow.cfm import cfm_loss, sample_adaptive, sample_midpoint
from .models.hubert import HubertConfig, HubertModel, feature_vector_attention_mask
from .models.voicebox import Regressor, RegressorConfig
from .ops.segment import averaged_target_fill, segment_batch
from .train.thresholder import get_threshold, thresholder_init


class RFF(nn.Module):
    """Residual FF block with post-LayerNorm (`segment_synthesis.py:17-32`)."""

    dim: int
    dropout: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.dim, name="linear1")(x)
        h = nn.Dropout(self.dropout)(jax.nn.relu(h),
                                     deterministic=deterministic)
        h = nn.Dense(self.dim, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(x + h)


class InputMLP(nn.Module):
    """Hidden-state -> cond-embedding projection (`segment_synthesis.py:35-53`).
    Resynthesis config: 768 -> 512 -> 512 -> 256."""

    output_dim: int = 256
    hidden_dims: Tuple[int, ...] = (512, 512)
    dropout: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i, dim in enumerate(self.hidden_dims):
            x = nn.Dense(dim, name=f"in_{i}")(x)
            x = RFF(dim, self.dropout, name=f"rff_{i}")(
                x, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="out")(x)


@dataclasses.dataclass(frozen=True)
class SynthesisConfig:
    encoding_layer: int = 9
    hubert: HubertConfig = HubertConfig()
    regressor: RegressorConfig = RegressorConfig()
    input_output_dim: int = 256
    input_hidden_dims: Tuple[int, ...] = (512, 512)
    input_dropout: float = 0.05
    merge_threshold_range: Tuple[float, float] = (0.8, 0.8)
    pitch_amp: float = 5.0
    # explicit-pitch conditioning (extension past the reference, ops/pitch.py
    # rationale): append per-segment mean log(F0/pitch_cond_mean) measured
    # from the input audio as one extra conditioning channel. Off by default
    # — the reference conditions on segment features only.
    explicit_pitch_cond: bool = False
    pitch_cond_mean: float = 120.0

    @staticmethod
    def from_yaml_dict(cfg: Dict[str, Any]) -> "SynthesisConfig":
        """Accept reference-style sylber_resynthesis.yaml keys."""
        r = dict(cfg.get("regressor_configs", {}))
        r.pop("sigma_keep", None)
        sigma = r.pop("sigma", 0.0)
        reg = RegressorConfig(
            dim=r.get("dim", 512), depth=r.get("depth", 8),
            dim_head=r.get("dim_head", 64), heads=r.get("heads", 8),
            dim_in_proj=r.get("dim_in_proj", 64),
            dim_cond_emb=r.get("dim_cond_emb", 256), sigma=sigma,
            use_gateloop_layers=r.get("use_gateloop_layers", False),
            use_unet_skip_connection=r.get("use_unet_skip_connection",
                                           False))
        i = dict(cfg.get("input_configs", {}))
        enc = cfg.get("encoding_layer", 9)
        return SynthesisConfig(
            encoding_layer=enc,
            hubert=HubertConfig(num_hidden_layers=enc),
            regressor=reg,
            input_output_dim=i.get("output_dim", 256),
            input_hidden_dims=tuple(i.get("hidden_dims", (512, 512))),
            input_dropout=i.get("dropout", 0.05),
            merge_threshold_range=tuple(
                cfg.get("merge_threshold_range", (0.8, 0.8))),
            pitch_amp=cfg.get("pitch_amp", 5.0),
            explicit_pitch_cond=cfg.get("explicit_pitch_cond", False),
            pitch_cond_mean=cfg.get("pitch_cond_mean", 120.0),
        )


class SynthesisParams(NamedTuple):
    hubert: Any
    input_mlp: Any
    regressor: Any


class SegmentSynthesis:
    """Inference API for token -> articulation resynthesis."""

    def __init__(
        self,
        model_ckpt: Optional[str] = None,
        config: Optional[SynthesisConfig] = None,
        params: Optional[SynthesisParams] = None,
        thresholder_configs: Optional[dict] = None,
        quantizer=None,
        pitch_quantizer=None,
        seed: int = 0,
        **yaml_kwargs: Any,
    ) -> None:
        self.config = config or SynthesisConfig.from_yaml_dict(yaml_kwargs)
        c = self.config
        self.hubert = HubertModel(c.hubert)
        self.input_mlp = InputMLP(c.input_output_dim, c.input_hidden_dims,
                                  c.input_dropout)
        self.regressor = Regressor(c.regressor)
        self.quantizer = quantizer
        # discrete token stream for the explicit pitch channel (the analogue
        # of the reference's pitch codebook, flow/quantizer.py)
        self.pitch_quantizer = pitch_quantizer
        self.thresholder = thresholder_init(**(thresholder_configs or {}))

        if params is not None:
            self.params = params
        elif model_ckpt is not None:
            self.params = self._load(model_ckpt)
        else:
            self.params = self.init_params(jax.random.PRNGKey(seed))
        self._sample_fns = {}

    def init_params(self, rng: jax.Array) -> SynthesisParams:
        c = self.config
        k1, k2, k3 = jax.random.split(rng, 3)
        hubert = self.hubert.init_params(k1, example_len=4000)
        dummy_h = jnp.zeros((1, 8, c.hubert.hidden_size
                             + int(c.explicit_pitch_cond)))
        input_mlp = self.input_mlp.init(k2, dummy_h)["params"]
        dummy_x = jnp.zeros((1, 8, c.regressor.dim_out))
        dummy_emb = jnp.zeros((1, 8, c.input_output_dim))
        regressor = self.regressor.init(
            k3, dummy_x, jnp.zeros((1,)), cond_emb=dummy_emb)["params"]
        return SynthesisParams(hubert, input_mlp, regressor)

    def save(self, path: str) -> None:
        """Save params as an Orbax checkpoint (dict layout, so restore does
        not depend on the NamedTuple registration)."""
        from .io.checkpoint import save_params

        save_params(path, {"hubert": self.params.hubert,
                           "input_mlp": self.params.input_mlp,
                           "regressor": self.params.regressor})

    def _load(self, path: str) -> SynthesisParams:
        from pathlib import Path

        p = Path(path)
        if p.is_dir():
            from .io.checkpoint import load_params

            tree = load_params(str(p))
            if isinstance(tree, dict):
                return SynthesisParams(**tree)
            return SynthesisParams(*tree)
        if not p.exists():
            # reference: hub-hosted synthesis checkpoint (demo.ipynb cell 8)
            try:
                from huggingface_hub import hf_hub_download

                p = Path(hf_hub_download(repo_id="cheoljun95/sylber",
                                         filename=str(path)))
            except Exception as e:
                raise FileNotFoundError(
                    f"checkpoint {path!r} not found locally and HF hub "
                    f"download failed ({e})") from e
        from .io.torch_convert import load_synthesis_checkpoint

        return load_synthesis_checkpoint(str(p), self.config)

    # ------------------------------------------------------------------

    def _cond_from_features(self, features: jnp.ndarray,
                            quantize: bool = True,
                            pitch_cond: Optional[jnp.ndarray] = None):
        """Feature path: norms (no eps! `segment_synthesis.py:138`),
        blank threshold 1e-4, optional quantization, MLP, blank zeroing.
        ``quantize=False`` for callers that already quantized per-segment
        (the wav path, `segment_synthesis.py:126-131`). Explicit-pitch
        models additionally append the frame-filled per-segment mean
        log-pitch channel (``pitch_cond`` (B, L)) before the MLP; blank
        frames stay zero through both the fill and the final zeroing."""
        norms = jnp.sqrt((features ** 2).sum(-1))
        if quantize and self.quantizer is not None:
            idx = self.quantizer.get_indices(features)
            features = self.quantizer.decode(idx)
            features = jnp.where((norms < 1e-4)[..., None], 0.0, features)
        if self.config.explicit_pitch_cond:
            assert pitch_cond is not None, \
                "explicit_pitch_cond model: pass pitch_cond (B, L) — see " \
                "ops/pitch.segment_pitch_cond"
            features = jnp.concatenate(
                [features, pitch_cond[..., None].astype(features.dtype)], -1)
        cond = self.input_mlp.apply({"params": self.params.input_mlp}, features)
        return jnp.where((norms < 1e-4)[..., None], 0.0, cond)

    def resynthesize(
        self,
        input_values: Optional[np.ndarray] = None,
        attention_mask: Optional[np.ndarray] = None,
        features: Optional[np.ndarray] = None,
        steps: int = 5,
        rand_scale: float = 0.0,
        merge_threshold: float = 0.8,
        normthreshold: Optional[float] = None,
        seed: int = 0,
        method: str = "midpoint",
        cond_scale: float = 1.0,
        pitch_cond: Optional[np.ndarray] = None,
    ):
        """Returns (art (B, L, 14), segments or None), reference signature
        `segment_synthesis.py:103-146`.

        Explicit-pitch models (``config.explicit_pitch_cond``): on the wav
        path the per-segment pitch channel is measured in-graph from
        ``input_values`` (optionally quantized by ``self.pitch_quantizer``);
        on the feature path pass ``pitch_cond`` (B, L) frame-filled
        log(F0/pitch_cond_mean) (`ops/pitch.py` helpers)."""
        segments_out = None
        if features is None:
            assert input_values is not None
            wav = jnp.asarray(np.atleast_2d(np.asarray(input_values,
                                                       np.float32)))
            mask = (jnp.asarray(attention_mask) if attention_mask is not None
                    else jnp.ones_like(wav, jnp.int32))
            if normthreshold is None:
                normthreshold = float(get_threshold(self.thresholder))
            hidden = self.hubert.apply(
                {"params": self.params.hubert}, wav, mask).astype(jnp.float32)
            frame_valid = feature_vector_attention_mask(
                self.config.hubert, mask, hidden.shape[1]).astype(bool)
            res = segment_batch(hidden, normthreshold, merge_threshold,
                                frame_valid=frame_valid)
            if self.quantizer is not None:
                feats = self.quantizer.decode(
                    self.quantizer.get_indices(res.features))
                valid = (jnp.arange(res.segments.shape[1])[None]
                         < res.num_segments[:, None])
                feats = jnp.where(valid[..., None], feats, 0.0)
                filled = _fill_from_segment_features(
                    feats, res.segments, res.num_segments, hidden.shape[1])
            else:
                filled = averaged_target_fill(hidden, res.segments,
                                              res.num_segments)
            pitch_fill = None
            if self.config.explicit_pitch_cond:
                from .ops.pitch import segment_pitch_cond

                pitch_fill = segment_pitch_cond(
                    wav, res.segments, res.num_segments, hidden.shape[1],
                    pitch_mean=self.config.pitch_cond_mean,
                    pitch_quantizer=self.pitch_quantizer)
            cond = self._cond_from_features(filled, quantize=False,
                                            pitch_cond=pitch_fill)
            segments_out = [
                np.asarray(res.segments[b][: int(res.num_segments[b])])
                for b in range(len(wav))]
        else:
            feats = jnp.asarray(np.asarray(features, np.float32))
            if feats.ndim == 2:
                feats = feats[None]
            if pitch_cond is not None:
                pitch_cond = jnp.asarray(np.asarray(pitch_cond, np.float32))
                if pitch_cond.ndim == 1:
                    pitch_cond = pitch_cond[None]
            cond = self._cond_from_features(feats, pitch_cond=pitch_cond)

        art = self._sample(cond, steps, rand_scale, seed, method, cond_scale)
        art = np.array(art)  # writable host copy
        art[..., 12] = art[..., 12] / self.config.pitch_amp
        return art, segments_out

    def decode_audio(self, art: np.ndarray, spk_emb: np.ndarray,
                     pitch_mean: float = 120.0, vocoder=None) -> np.ndarray:
        """Articulatory trajectory -> 16 kHz waveform via the in-framework
        :class:`sylber_tpu.vocoder.SparcDecoder` (the reference delegates
        this step to the external SPARC package — `README.md:92-94`,
        `demo.ipynb` cell 11). ``vocoder`` defaults to a decoder attached at
        construction (``self.vocoder``); pass a trained/converted one for
        intelligible audio."""
        vocoder = vocoder or getattr(self, "vocoder", None)
        if vocoder is None:
            from .vocoder import SparcDecoder

            vocoder = self.vocoder = SparcDecoder()
        if getattr(vocoder, "random_init", False):
            import warnings

            warnings.warn(
                "decode_audio: the vocoder has random-init weights and will "
                "emit noise, not speech — pass a trained SparcDecoder "
                "(train with vocoder.hifigan.make_vocoder_train_step or "
                "convert a torch HiFi-GAN checkpoint)", stacklevel=2)
        return vocoder(art, spk_emb, pitch_mean)

    def _sample(self, cond_emb, steps, rand_scale, seed, method="midpoint",
                cond_scale: float = 1.0):
        """``method``: fixed-grid "euler"/"midpoint"/"rk4" over ``steps``
        points, or adaptive "tsit5"/"dopri5" (torchode/torchdiffeq-adaptive
        equivalents; ``steps`` is ignored, error control at atol=rtol=1e-5
        as in the reference, `flowmatching.py:806-824`).

        ``cond_scale`` != 1 enables classifier-free guidance: a second
        vector-field evaluation with the conditioning embedding dropped
        (zeroed — the blank/null convention of this stack), combined as
        ``null + (cond - null) * cond_scale`` per
        `flowmatching.py:566-579,754`. Note the reference's released
        ``forward`` never reads ``cond_drop_prob``, so its null pass
        degenerates to the conditioned one; here the null pass actually
        drops the conditioning (the intended voicebox CFG semantics)."""
        key = (steps, float(rand_scale), method, float(cond_scale))
        if key not in self._sample_fns:
            reg, params, c = self.regressor, self.params, self.config
            adaptive = method in ("tsit5", "dopri5")

            def fn(regressor_params, cond_emb, rng):
                def field(x, t):
                    out = reg.apply({"params": regressor_params}, x,
                                    jnp.asarray(t), cond_emb=cond_emb)
                    if cond_scale == 1.0:
                        return out
                    null = reg.apply({"params": regressor_params}, x,
                                     jnp.asarray(t),
                                     cond_emb=jnp.zeros_like(cond_emb))
                    return null + (out - null) * cond_scale
                if adaptive:
                    return sample_adaptive(field, rng, cond_emb,
                                           c.regressor.dim_out,
                                           rand_scale=rand_scale,
                                           method=method)
                return sample_midpoint(field, rng, cond_emb,
                                       c.regressor.dim_out, steps, rand_scale,
                                       method=method)

            self._sample_fns[key] = jax.jit(fn)
        return self._sample_fns[key](self.params.regressor, cond_emb,
                                     jax.random.PRNGKey(seed))

    # ---------------- training (fixed reference path) -----------------

    def loss(self, params: SynthesisParams, batch: dict, rng: jax.Array,
             train: bool = True):
        """CFM loss on (features|wav -> cond_emb, art target)."""
        c = self.config
        feats = batch["features"]
        cond = self._cond_from_features_params(
            params, feats, rng, train, pitch_cond=batch.get("pitch_cond"))
        art = batch["art"].astype(jnp.float32)
        art = art.at[..., 12].multiply(c.pitch_amp)

        def apply_fn(w, times, x1, cond_emb, mask, cond_mask, kd, is_train):
            return self.regressor.apply(
                {"params": params.regressor}, w, times, cond=x1,
                cond_emb=cond_emb, self_attn_mask=mask, cond_mask=cond_mask,
                deterministic=not is_train,
                rngs={"dropout": kd} if is_train else {})

        return cfm_loss(apply_fn, rng, art, cond_emb=cond,
                        mask=batch.get("mask"), sigma=c.regressor.sigma,
                        frac_lengths_mask=c.regressor.frac_lengths_mask,
                        train=train)

    def _cond_from_features_params(self, params, features, rng, train,
                                   pitch_cond=None):
        norms = jnp.sqrt((features ** 2).sum(-1))
        if self.config.explicit_pitch_cond:
            assert pitch_cond is not None, \
                "explicit_pitch_cond model: batch needs a pitch_cond (B, L)"
            features = jnp.concatenate(
                [features, pitch_cond[..., None].astype(features.dtype)], -1)
        cond = self.input_mlp.apply(
            {"params": params.input_mlp}, features,
            deterministic=not train,
            rngs={"dropout": rng} if train else {})
        return jnp.where((norms < 1e-4)[..., None], 0.0, cond)


def _fill_from_segment_features(seg_feats, segments, num_segments, L):
    """Expand per-segment vectors back to frame level (zeros outside)."""
    B, MS, _ = segments.shape
    t = jnp.arange(L, dtype=jnp.int32)
    s, e = segments[..., 0], segments[..., 1]
    valid = jnp.arange(MS)[None, :] < num_segments[:, None]
    covered = ((t[None, None, :] >= s[:, :, None])
               & (t[None, None, :] < e[:, :, None]) & valid[:, :, None])
    seg_id = jnp.argmax(covered, axis=1)
    any_cov = covered.any(axis=1)
    filled = jnp.take_along_axis(seg_feats, seg_id[..., None], axis=1)
    return jnp.where(any_cov[..., None], filled, 0.0)


def expand_feature(avg_fts: jnp.ndarray, durations: jnp.ndarray) -> jnp.ndarray:
    """Duration-controlled expansion: interleave each segment feature with a
    zero 'gap' token and repeat by durations (`flowmatching.py:873-881`).
    durations: (B, n_segs, 2) int (voiced len, gap len); total length
    = durations.sum per row must be equal across the batch (it defines the
    static output shape).

    Device-side: the variable-length repeat is a batched searchsorted over
    the duration prefix sums (one O(L log N) gather, no per-item host loop).
    """
    B, N, d = avg_fts.shape
    inter = jnp.stack([avg_fts, jnp.zeros_like(avg_fts)], axis=2)
    inter = inter.reshape(B, 2 * N, d)
    dur = jnp.asarray(durations).reshape(B, -1)
    # static output length from host-visible metadata (durations are data-
    # pipeline products, not traced values)
    L = int(np.asarray(jax.device_get(dur[0])).sum())
    ends = jnp.cumsum(dur, axis=1)                       # (B, 2N)
    t = jnp.arange(L)
    idx = jax.vmap(lambda e: jnp.searchsorted(e, t, side="right"))(ends)
    return jnp.take_along_axis(inter, idx[..., None], axis=1)


class SynthesisTrainState(NamedTuple):
    step: jnp.ndarray
    params: SynthesisParams
    opt_state: Any


def make_synthesis_optimizer(lr: float = 1e-4, warmup_steps: int = 5000,
                             total_steps: int = 500_000,
                             min_factor: float = 0.05):
    """AdamW(eps 1e-4, betas (0.9, 0.95), wd 0.1) + warmup-cosine — the
    reference SegmentSynthesisTrainer recipe
    (`segment_synthesis.py:244-250`)."""
    import optax

    from .train.lr import cosine_warmup_schedule

    schedule = cosine_warmup_schedule(lr, warmup_steps, total_steps,
                                      min_factor)
    return optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adamw(schedule, b1=0.9, b2=0.95, eps=1e-4, weight_decay=0.1),
    )


def make_synthesis_train_step(synth: "SegmentSynthesis", optimizer,
                              loss_scale: float = 1.0):
    """Jittable ``(state, batch, rng) -> (state, metrics)``; batch needs
    ``features`` (B, L, 768 averaged/blanked hidden states), ``art``
    (B, L, 14 SPARC targets), optional ``mask`` (B, L). The frozen HuBERT
    params are not updated (reference: ``speech_model.requires_grad_(False)``,
    `segment_synthesis.py:74`)."""
    import optax

    def train_step(state: SynthesisTrainState, batch: dict, rng: jax.Array):
        def loss_fn(trainable):
            params = SynthesisParams(state.params.hubert,
                                     trainable["input_mlp"],
                                     trainable["regressor"])
            return loss_scale * synth.loss(params, batch, rng, train=True)

        trainable = {"input_mlp": state.params.input_mlp,
                     "regressor": state.params.regressor}
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              trainable)
        new_t = optax.apply_updates(trainable, updates)
        new_params = SynthesisParams(state.params.hubert,
                                     new_t["input_mlp"], new_t["regressor"])
        metrics = {"cfm_loss": loss, "grad_norm": optax.global_norm(grads)}
        return SynthesisTrainState(state.step + 1, new_params, opt_state), \
            metrics

    return train_step


def init_synthesis_train_state(synth: "SegmentSynthesis",
                               optimizer) -> SynthesisTrainState:
    trainable = {"input_mlp": synth.params.input_mlp,
                 "regressor": synth.params.regressor}
    return SynthesisTrainState(jnp.zeros((), jnp.int32), synth.params,
                               optimizer.init(trainable))
