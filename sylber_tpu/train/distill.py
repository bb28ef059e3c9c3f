"""Sylber self-distillation training steps (stage 1 + stage 2), fully jitted.

Re-designs the reference training path (`/root/reference/sylber/model/sylber.py:250-352`,
`sylber_trainer.py:13-67`) as pure functions over a train-state pytree:

- teacher = EMA param pytree, forwarded without dropout (no-grad);
- stage 1: segments come precomputed from the batch (SDHuBERT ``.npy``);
- stage 2 (``segment_online``): the norm threshold comes from the in-graph
  Thresholder stats, segmentation runs on-device via the XLA scan
  (:mod:`sylber_tpu.ops.segment`), and threshold stats update inside the same
  program — eliminating the reference's per-step GPU->CPU sync
  (`sylber.py:262-276`);
- optional segment-span masking of the student input
  (`sylber.py:277-296`; both reference configs set ``mask_prob: 0``);
- optional WavLM-style noise mixing (`noise_utils.py`);
- loss: per-frame MSE between student frames and the segment-averaged
  teacher fill, summed over dim, mean over frames (`sylber.py:313-338` — only
  the live code path; the undefined-attribute LM remnants documented in
  SURVEY.md §2.4 are not replicated);
- AdamW(lr, eps=1e-4, betas=(0.9, 0.95), wd=0.1) + global-norm clip 0.5 +
  warmup-cosine schedule (`sylber_trainer.py:61-67`, `train.py:99`).

The reference's known-broken branches (use_target_ft_ratio/emb_detach_ratio,
`sylber.py:321-326`) are intentionally absent.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.noise import NoiseMixerConfig, mix_noise
from ..models.hubert import HubertConfig, HubertModel, feature_vector_attention_mask
from ..ops.segment import averaged_target_fill, segment_batch
from .ema import ema_update
from .lr import cosine_warmup_schedule
from .thresholder import ThresholderState, get_threshold, thresholder_init, update_stats


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    model: HubertConfig = HubertConfig()
    ema_decay: float = 1.0                     # sylber_base.yaml:4 (frozen)
    ema_fp32_shadow: bool = True               # fp32 EMA master for bf16 params
                                               # (ema_module.py:79-109)
    segment_online: bool = False
    merge_threshold_range: Tuple[float, float] = (0.5, 0.7)
    use_train_thrupdate: bool = False
    thresholder_decay: float = 0.9999
    mask_prob: float = 0.0
    min_mask_n: int = 0
    max_mask_set: int = 1
    do_noise_augment: bool = False
    noise_mixer: NoiseMixerConfig = NoiseMixerConfig()
    # optimizer (sylber_trainer.py:64, train.py:99)
    lr: float = 1e-4
    warmup_steps: int = 500
    total_steps: int = 200_000
    min_factor: float = 1.0
    hold_steps: int = 0
    weight_decay: float = 0.1
    grad_clip: float = 0.5
    loss_scale: float = 1.0                    # loss_coefs.distillation_loss
    accumulate_grad_batches: int = 1           # train.py:101 (optax.MultiSteps)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    thresholder: ThresholderState


def make_optimizer(cfg: DistillConfig) -> optax.GradientTransformation:
    schedule = cosine_warmup_schedule(
        cfg.lr, cfg.warmup_steps, cfg.total_steps, cfg.min_factor, cfg.hold_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.95, eps=1e-4,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx


def init_train_state(
    cfg: DistillConfig,
    rng: jax.Array,
    params: Optional[Any] = None,
    thresholder_kwargs: Optional[dict] = None,
) -> TrainState:
    model = HubertModel(cfg.model)
    if params is None:
        params = model.init_params(rng)
    opt_state = make_optimizer(cfg).init(params)
    thr = thresholder_init(**(thresholder_kwargs or {}))
    from .ema import ema_init

    # fp32 shadow only matters (and only costs memory) for non-f32 params
    shadow = cfg.ema_fp32_shadow and cfg.ema_decay < 1.0
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=ema_init(params, fp32_shadow=shadow),
        opt_state=opt_state,
        thresholder=thr,
    )


def _span_mask(rng, segments, num_segments, num_frames, cfg: DistillConfig):
    """Segment-span student masking — exact reference sampling semantics
    (`sylber.py:277-296`):

    - per item with ``n_b`` segments, the number of masked spans is
      ``max(min_mask_n, Binomial(n_b, mask_prob))`` — uncapped (up to the
      static segment-buffer size ``MS >= n_b``, so no truncation ever
      occurs);
    - span anchors are drawn uniformly over ``[0, n_b)`` WITH replacement;
    - each span covers ``1..max_mask_set`` consecutive segments (clipped at
      ``n_b``) and masks the contiguous frame range
      ``[seg[anchor].start, seg[last].end)`` — including any silence gap
      frames between those segments, as the reference does.
    """
    B, MS, _ = segments.shape
    if cfg.mask_prob <= 0.0 and cfg.min_mask_n <= 0:
        return jnp.zeros((B, num_frames), bool)

    k1, k2, k3 = jax.random.split(rng, 3)
    seg_valid = jnp.arange(MS)[None, :] < num_segments[:, None]
    bern = (jax.random.uniform(k1, (B, MS)) < cfg.mask_prob) & seg_valid
    # Binomial(n_b, p) <= n_b <= MS, so MS draw slots are always enough
    mask_n = jnp.minimum(jnp.maximum(bern.sum(-1), cfg.min_mask_n), MS)

    # anchors uniform over [0, n_b) per draw, with replacement
    u = jax.random.uniform(k2, (B, MS))
    anchors = jnp.floor(u * jnp.maximum(num_segments, 1)[:, None]).astype(jnp.int32)
    span = jax.random.randint(k3, (B, MS), 1, cfg.max_mask_set + 1)
    lastseg = jnp.minimum(num_segments[:, None], anchors + span) - 1
    bidx = jnp.arange(B)[:, None]
    start = segments[bidx, anchors, 0]
    end = segments[bidx, jnp.maximum(lastseg, 0), 1]
    active = (jnp.arange(MS)[None, :] < mask_n[:, None]) & (num_segments[:, None] > 0)

    # frame-range union of all active spans, O(B*MS) via difference counts
    # instead of the O(B*MS*T) broadcast: +1 at each span start, -1 at each
    # span end, prefix-sum over frames > 0 -> masked.
    starts = jnp.where(active, start, num_frames)
    ends = jnp.where(active, end, num_frames)
    delta = jnp.zeros((B, num_frames + 1), jnp.int32)
    delta = delta.at[bidx, starts].add(1, mode="drop")
    delta = delta.at[bidx, ends].add(-1, mode="drop")
    cover = jnp.cumsum(delta[:, :num_frames], axis=1)
    return cover > 0


def _pcm_normalize(x: jnp.ndarray, attention_mask) -> jnp.ndarray:
    """Per-item zero-mean/unit-var over the attended samples, zeros in the
    padding — the on-device equivalent of the host collate's Wav2Vec2
    normalization (`collective_audio_segment.py:125-127`). Used when batches
    arrive as int16 PCM (2.6x fewer host->device bytes; any per-item linear
    scale the quantizer applied is erased here)."""
    x = x.astype(jnp.float32)
    if attention_mask is None:
        m = jnp.ones_like(x)
    else:
        m = attention_mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(-1, keepdims=True), 1.0)
    mean = (x * m).sum(-1, keepdims=True) / n
    var = (((x - mean) * m) ** 2).sum(-1, keepdims=True) / n
    return (x - mean) / jnp.sqrt(var + 1e-7) * m


def distill_loss(
    params,
    ema_params,
    thresholder: ThresholderState,
    batch: dict,
    rng: jax.Array,
    cfg: DistillConfig,
    train: bool = True,
):
    """Compute the distillation loss; returns (loss, aux).

    ``batch``: input_values (B, L) float32 normalized or int16 raw PCM
    (normalized on device); attention_mask (B, L) optional; noise (B, L)
    optional (float32 or int16); segments (B, MS, 2) + num_segments (B,)
    for stage 1 (None triggers online segmentation).
    """
    model = HubertModel(cfg.model)
    wav = batch["input_values"]
    attention_mask = batch.get("attention_mask")
    if attention_mask is not None and attention_mask.dtype != jnp.int32:
        # int8 transfer dtype would overflow length sums downstream
        attention_mask = attention_mask.astype(jnp.int32)
    if wav.dtype == jnp.int16:
        wav = _pcm_normalize(wav, attention_mask)
    k_seg, k_mask, k_noise, k_drop = jax.random.split(rng, 4)

    # --- teacher forward (no grad, eval mode) ---
    target_hidden = model.apply(
        {"params": jax.lax.stop_gradient(ema_params)}, wav, attention_mask
    ).astype(jnp.float32)
    target_hidden = jax.lax.stop_gradient(target_hidden)
    B, T, _ = target_hidden.shape

    new_thr_state = thresholder
    if batch.get("segments") is not None:
        segments = batch["segments"]
        num_segments = batch["num_segments"]
        norm_mask = None
    else:
        assert cfg.segment_online, "no segments provided and segment_online off"
        normthreshold = get_threshold(thresholder)
        norms = jnp.sqrt((target_hidden ** 2).sum(-1) + 1e-8)
        norm_mask = norms >= normthreshold
        if cfg.use_train_thrupdate:
            new_thr_state = update_stats(
                thresholder, signal=norms.reshape(-1),
                signal_mask=norm_mask.reshape(-1),
                decay=cfg.thresholder_decay)
        else:
            new_thr_state = update_stats(
                thresholder, signal=norms.reshape(-1),
                signal_mask=norm_mask.reshape(-1),
                noise=norms.reshape(-1),
                noise_mask=(~norm_mask).reshape(-1),
                decay=cfg.thresholder_decay)
        lo, hi = cfg.merge_threshold_range
        merge_threshold = jnp.where(
            lo < hi,
            jax.random.uniform(k_seg, ()) * (hi - lo) + lo,
            jnp.float32(lo),
        )
        frame_valid = None
        if attention_mask is not None:
            frame_valid = feature_vector_attention_mask(
                cfg.model, attention_mask, T).astype(bool)
        res = segment_batch(target_hidden, normthreshold, merge_threshold,
                            frame_valid=frame_valid, norms=norms)
        segments, num_segments = res.segments, res.num_segments

    mask_time_indices = _span_mask(k_mask, segments, num_segments, T, cfg)

    student_in = wav
    if cfg.do_noise_augment and batch.get("noise") is not None:
        noise = batch["noise"]
        if noise.dtype == jnp.int16:
            noise = _pcm_normalize(noise, attention_mask)
        student_in = mix_noise(k_noise, wav, noise, cfg.noise_mixer)

    hidden = model.apply(
        {"params": params}, student_in, attention_mask,
        mask_time_indices,
        deterministic=not train,
        rngs={"dropout": k_drop} if train else {},
    ).astype(jnp.float32)

    if cfg.segment_online and cfg.use_train_thrupdate and norm_mask is not None:
        train_norms = jnp.sqrt(
            (jax.lax.stop_gradient(hidden) ** 2).sum(-1) + 1e-8)
        new_thr_state = update_stats(
            new_thr_state, noise=train_norms.reshape(-1),
            noise_mask=(~norm_mask).reshape(-1),
            decay=cfg.thresholder_decay)

    target_fill = averaged_target_fill(target_hidden, segments, num_segments)
    loss = ((hidden - target_fill) ** 2).sum(-1).mean()

    aux = {
        "distillation_loss": loss,
        "thresholder": new_thr_state,
        "num_segments": num_segments.sum(),
        "masked_frames": mask_time_indices.sum(),
    }
    if cfg.segment_online:
        aux["normthreshold"] = get_threshold(new_thr_state)
    return cfg.loss_scale * loss, aux


def make_train_step(cfg: DistillConfig):
    """Returns a jittable ``(state, batch, rng) -> (state, metrics)``."""
    # int8_dense rounds through jnp.round (zero gradient) with no
    # straight-through estimator — training over it silently produces
    # near-zero updates for every projection. Serving-only knob.
    assert not cfg.model.int8_encoder, \
        "int8_encoder is an inference/serving mode (no STE); train in bf16"
    optimizer = make_optimizer(cfg)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        # EMA update precedes the forward and fires only at accumulation
        # boundaries (`sylber_trainer.py:34-35`: ema_step() when
        # global_step % accumulate_grad_batches == 0); off-boundary
        # micro-batches use decay 1.0 (no-op) so the teacher decays by
        # `decay` per optimizer step, not decay**k.
        if cfg.ema_decay >= 1.0:
            # Frozen teacher (both reference configs, sylber_base.yaml:4):
            # skip the update entirely — the decay-1.0 tree_map is not free
            # under XLA (`p * 0.0` is kept for NaN semantics, ~0.5 GB of
            # HBM traffic per step on the 94 M-param model).
            ema_params = state.ema_params
        else:
            boundary = state.step % cfg.accumulate_grad_batches == 0
            decay = jnp.where(boundary, cfg.ema_decay, 1.0)
            ema_params = ema_update(state.ema_params, state.params, decay)

        (loss, aux), grads = jax.value_and_grad(distill_loss, has_aux=True)(
            state.params, ema_params, state.thresholder, batch, rng, cfg
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            thresholder=aux.pop("thresholder"),
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return new_state, metrics

    return train_step


def make_eval_step(cfg: DistillConfig):
    def eval_step(state: TrainState, batch: dict, rng: jax.Array):
        loss, aux = distill_loss(
            state.params, state.ema_params, state.thresholder, batch, rng,
            cfg, train=False,
        )
        aux.pop("thresholder")
        return {"loss": loss, **aux}

    return eval_step
