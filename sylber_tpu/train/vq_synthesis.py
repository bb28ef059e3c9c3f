"""Joint training of the trainable grouped-residual-VQ quantizer with the
CFM resynthesis model.

The reference's trainable ``Quantizer`` (`/root/reference/sylber/model/
quantizer.py:182-257`) — FF encoder + separate art/pitch GroupedResidualVQ
sub-spaces — is meant to sit in the SegmentSynthesis conditioning path (its
loading hook at `segment_synthesis.py:94-97` references undefined attrs,
SURVEY §2.4.4; no training recipe shipped). The intended objective is clear
from the architecture: quantize the (averaged/blanked) conditioning
features into discrete art/pitch codes and train the flow-matching decoder
from the QUANTIZED embeddings, VQ-VAE style. This module implements that:

- forward: features -> FFEncoder -> unit-norm -> blank-zero -> art/pitch
  grouped-residual VQ (straight-through) -> input MLP -> CFM loss;
- gradients flow to the quantizer encoder, input MLP and regressor through
  the straight-through estimator; a commitment loss pulls encoder outputs
  toward their codewords;
- codebooks update by EMA k-means (`flow/quantizer.py::vq_ema_update`,
  vector-quantize-pytorch semantics) outside the gradient path.

`TrainedVQTokenizer` adapts the trained state to the ``get_indices`` /
``decode`` protocol, so ``SegmentSynthesis(quantizer=...)`` runs the full
wav -> tokens -> CFM chain with it (`synthesis.py::resynthesize`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..flow.quantizer import (GroupedResidualVQConfig, QuantizerConfig,
                              QuantizerState, quantizer_decode,
                              quantizer_forward, quantizer_init,
                              vq_ema_update)


class VQSynthState(NamedTuple):
    step: jnp.ndarray
    quantizer: QuantizerState
    input_mlp: Any
    regressor: Any
    pitch_head: Any
    opt_state: Any


def quantizer_config_from_dict(d: Dict[str, Any],
                               input_dim: int) -> QuantizerConfig:
    """Yaml ``quantizer_configs:`` block -> QuantizerConfig. Art/pitch VQ
    sub-blocks take the GroupedResidualVQConfig fields; art dim defaults to
    output_dim - pitch_emb_dim (the reference's split)."""
    d = dict(d or {})
    out_dim = int(d.get("output_dim", 64))
    pitch_dim = int(d.get("pitch_emb_dim", 8))
    art = dict(d.get("art_vq", {}))
    pitch = dict(d.get("pitch_vq", {}))
    art.setdefault("dim", out_dim - pitch_dim)
    pitch.setdefault("dim", pitch_dim)
    return QuantizerConfig(
        input_dim=input_dim,
        output_dim=out_dim,
        hidden_dims=tuple(d.get("hidden_dims", (256, 256))),
        pitch_emb_dim=pitch_dim,
        art_vq=GroupedResidualVQConfig(**art),
        pitch_vq=GroupedResidualVQConfig(**pitch),
    )


def make_vq_synthesis_train_step(synth, qcfg: QuantizerConfig, optimizer,
                                 commit_weight: float = 1.0,
                                 pitch_weight: float = 0.0):
    """(state, batch{features, art}, rng) -> (state, metrics); jittable.

    ``pitch_weight`` scales an auxiliary pitch-supervision loss (opt-in,
    default 0.0 — matching the fixture gates' supervised-detection
    default): a linear head on the QUANTIZED pitch sub-embedding predicts
    the frame-rate log-pitch truth — scaled by ``pitch_amp`` so the aux
    loss sits on the same scale as the CFM's pitch channel — over voiced
    in-segment frames. The reference's ``Quantizer`` names an art/pitch
    sub-space split (`quantizer.py:182-257`) but ships no training recipe;
    without any supervision nothing ties the named pitch VQ to pitch. The
    straight-through path makes the pitch CODES carry the signal, not just
    the encoder. (The r4 pitch collapse itself was dead-code starvation in
    the VQ, fixed by reseeding in ``vq_ema_update`` — supervision is the
    belt on top of those braces.)"""
    import optax

    from ..flow.cfm import cfm_loss

    c = synth.config
    n_hidden = len(qcfg.hidden_dims)

    def train_step(state: VQSynthState, batch: dict, rng: jax.Array):
        feats = batch["features"]
        non_blank = (feats ** 2).sum(-1) > 0

        def loss_fn(trainable):
            qstate = QuantizerState(trainable["qenc"],
                                    state.quantizer.art_vq,
                                    state.quantizer.pitch_vq)
            out = quantizer_forward(qstate, qcfg, feats)
            quantized = jnp.where(non_blank[..., None], out["quantize"], 0.0)
            kd, km = jax.random.split(rng)
            cond = synth.input_mlp.apply(
                {"params": trainable["input_mlp"]}, quantized,
                deterministic=False, rngs={"dropout": kd})
            cond = jnp.where(non_blank[..., None], cond, 0.0)
            art = batch["art"].astype(jnp.float32)
            art = art.at[..., 12].multiply(c.pitch_amp)

            def apply_fn(w, times, x1, cond_emb, mask, cond_mask, kdrop,
                         is_train):
                return synth.regressor.apply(
                    {"params": trainable["regressor"]}, w, times, cond=x1,
                    cond_emb=cond_emb, self_attn_mask=mask,
                    cond_mask=cond_mask, deterministic=not is_train,
                    rngs={"dropout": kdrop} if is_train else {})

            cfm = cfm_loss(apply_fn, km, art, cond_emb=cond,
                           mask=batch.get("mask"), sigma=c.regressor.sigma,
                           frac_lengths_mask=c.regressor.frac_lengths_mask,
                           train=True)
            # auxiliary pitch supervision on the quantized pitch sub-space
            # (straight-through: gradients reach the encoder THROUGH the
            # codes, so the pitch VQ must encode pitch to lower this)
            pitch_emb = out["quantize"][..., -qcfg.pitch_emb_dim:]
            head = trainable["pitch_head"]
            pred = pitch_emb @ head["kernel"] + head["bias"]
            voiced = batch["art"][..., 13] > 0.02
            pmask = (non_blank & voiced).astype(jnp.float32)
            # supervise the pitch_amp-scaled target — the scale the CFM's
            # pitch channel trains on — so pitch_weight=w means w× the
            # decoder's per-channel squared-error scale, not w/amp²
            perr = (pred - batch["art"][..., 12] * c.pitch_amp) ** 2
            pitch_loss = (perr * pmask).sum() / jnp.maximum(pmask.sum(), 1.0)
            total = (cfm + commit_weight * out["commitment_loss"]
                     + pitch_weight * pitch_loss)
            return total, {"cfm_loss": cfm,
                           "commit_loss": out["commitment_loss"],
                           "pitch_loss": pitch_loss,
                           "pre_vq": out["non_quantized"],
                           "indices": out["indices"]}

        trainable = {"qenc": state.quantizer.encoder,
                     "input_mlp": state.input_mlp,
                     "regressor": state.regressor,
                     "pitch_head": state.pitch_head}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              trainable)
        new_t = optax.apply_updates(trainable, updates)

        # EMA k-means codebook update from the pre-VQ encoder outputs
        # (straight-through path above never updates codebooks). Blanks are
        # masked out of the stats — their exact-zero vectors are a fake
        # cluster — and dead codes reseed from in-batch vectors (see
        # flow/quantizer.vq_ema_update: without reseeding the unit-normed
        # pitch VQ collapses onto one code).
        pre = aux["pre_vq"]
        idx = aux["indices"]
        n_art = qcfg.art_vq.groups * qcfg.art_vq.num_quantizers
        k_art, k_pitch = jax.random.split(jax.random.fold_in(rng, 1))
        art_vq = vq_ema_update(state.quantizer.art_vq, qcfg.art_vq,
                               pre[..., : -qcfg.pitch_emb_dim],
                               idx[..., :n_art], rng=k_art, mask=non_blank)
        pitch_vq = vq_ema_update(state.quantizer.pitch_vq, qcfg.pitch_vq,
                                 pre[..., -qcfg.pitch_emb_dim:],
                                 idx[..., n_art:], rng=k_pitch,
                                 mask=non_blank)

        new_state = VQSynthState(
            state.step + 1,
            QuantizerState(new_t["qenc"], art_vq, pitch_vq),
            new_t["input_mlp"], new_t["regressor"], new_t["pitch_head"],
            opt_state)
        metrics = {"loss": loss, "cfm_loss": aux["cfm_loss"],
                   "commit_loss": aux["commit_loss"],
                   "pitch_loss": aux["pitch_loss"],
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def init_vq_synthesis_train_state(synth, qcfg: QuantizerConfig, optimizer,
                                  rng: jax.Array) -> VQSynthState:
    """Fresh quantizer + input MLP sized for the quantizer output; the
    regressor params come from the (fresh) SegmentSynthesis."""
    k1, k2 = jax.random.split(rng)
    qstate = quantizer_init(k1, qcfg)
    # re-init the input MLP on quantizer-output-sized inputs (flax Dense
    # kernels are input-shaped; the synth default saw encoder-width inputs)
    mlp_params = synth.input_mlp.init(
        k2, jnp.zeros((1, 4, qcfg.output_dim)), deterministic=True)["params"]
    pitch_head = {"kernel": jnp.zeros((qcfg.pitch_emb_dim,), jnp.float32),
                  "bias": jnp.zeros((), jnp.float32)}
    trainable = {"qenc": qstate.encoder, "input_mlp": mlp_params,
                 "regressor": synth.params.regressor,
                 "pitch_head": pitch_head}
    return VQSynthState(jnp.zeros((), jnp.int32), qstate, mlp_params,
                        synth.params.regressor, pitch_head,
                        optimizer.init(trainable))


class TrainedVQTokenizer:
    """get_indices/decode protocol over a trained QuantizerState, so
    ``SegmentSynthesis(quantizer=TrainedVQTokenizer(...))`` runs the wav ->
    tokens -> CFM chain (`synthesis.py:243-254`). Token ids are the
    concatenated art+pitch grouped-residual code tuple per segment."""

    def __init__(self, state: QuantizerState, cfg: QuantizerConfig):
        self.state = state
        self.cfg = cfg

    def get_indices(self, feats: jnp.ndarray) -> jnp.ndarray:
        out = quantizer_forward(self.state, self.cfg, jnp.asarray(feats))
        return out["indices"]

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        return quantizer_decode(self.state, self.cfg, jnp.asarray(indices))

    # ---- (de)serialization: a flat npz fixture ----
    def save_npz(self, path: str) -> None:
        flat = {f"enc_{i}_{k}": np.asarray(v)
                for i, layer in enumerate(self.state.encoder)
                for k, v in layer.items()}
        for name, vq in (("art", self.state.art_vq),
                         ("pitch", self.state.pitch_vq)):
            flat[f"{name}_codebooks"] = np.asarray(vq.codebooks)
            flat[f"{name}_sizes"] = np.asarray(vq.cluster_sizes)
            flat[f"{name}_avgs"] = np.asarray(vq.embed_avgs)
        np.savez_compressed(path, **flat)

    @classmethod
    def load_npz(cls, path: str, cfg: QuantizerConfig
                 ) -> "TrainedVQTokenizer":
        from ..flow.quantizer import VQState

        z = np.load(path)
        n_layers = 3 * len(cfg.hidden_dims) + 1
        enc = [{"kernel": jnp.asarray(z[f"enc_{i}_kernel"]),
                "bias": jnp.asarray(z[f"enc_{i}_bias"])}
               for i in range(n_layers)]
        vqs = {name: VQState(jnp.asarray(z[f"{name}_codebooks"]),
                             jnp.asarray(z[f"{name}_sizes"]),
                             jnp.asarray(z[f"{name}_avgs"]))
               for name in ("art", "pitch")}
        return cls(QuantizerState(enc, vqs["art"], vqs["pitch"]), cfg)


def train_vq_synthesis(cfg: Dict[str, Any], out_dir: str = "runs/vq_synth",
                       max_steps=None, log_every: int = 50, seed: int = 0,
                       eval_steps: int = 50):
    """Train quantizer (+input MLP +regressor) jointly; returns
    (VQSynthState, qcfg, eval metrics of the full wav->tokens->CFM chain).

    ``cfg`` is a resynthesis yaml with an additional
    ``model.quantizer_configs:`` block. Same DP `mesh:` knob as
    train_synthesis (batches shard over dp, state replicates)."""
    import json
    import os
    import time

    from ..synthesis import SegmentSynthesis, make_synthesis_optimizer
    from ..train.thresholder import get_threshold
    from .loop import MetricLogger
    from .synthesis_loop import (_load_encoder_params, build_synthesis_corpus,
                                 precompute_features,
                                 synthesis_config_from_dict)

    model_cfg = dict(cfg.get("model", cfg))
    data_cfg = dict(cfg.get("data", {}))
    train_cfg = dict(cfg.get("train", {}))
    sc = synthesis_config_from_dict(model_cfg)
    synth = SegmentSynthesis(
        config=sc,
        thresholder_configs=model_cfg.get("thresholder_configs"), seed=seed)
    enc_ckpt = cfg.get("speech_model_ckpt")
    assert enc_ckpt, "train_vq_synthesis needs a trained encoder checkpoint"
    from ..synthesis import SynthesisParams

    enc = _load_encoder_params(enc_ckpt, sc.hubert.num_hidden_layers)
    synth.params = SynthesisParams(enc, synth.params.input_mlp,
                                   synth.params.regressor)

    qcfg = quantizer_config_from_dict(model_cfg.get("quantizer_configs"),
                                      input_dim=sc.hubert.hidden_size)

    norm_thr = model_cfg.get("norm_threshold")
    if norm_thr is None:
        norm_thr = float(get_threshold(synth.thresholder))
    lo, hi = sc.merge_threshold_range
    merge_thr = (lo + hi) / 2.0

    n_utts = data_cfg.get("n_utts", 256)
    seconds = data_cfg.get("seconds", 5.0)
    style = data_cfg.get("style", "v1")
    corpus = build_synthesis_corpus(n_utts, seconds, seed=seed, style=style)
    t0 = time.time()
    features = precompute_features(synth.hubert, synth.params.hubert,
                                   corpus["wav"], norm_thr, merge_thr)
    art = jnp.asarray(corpus["art"])
    print(f"precomputed features {tuple(features.shape)} in "
          f"{time.time() - t0:.1f}s")

    total_steps = max_steps or train_cfg.get("max_steps", 20_000)
    optimizer = make_synthesis_optimizer(
        lr=train_cfg.get("lr", 1e-4),
        warmup_steps=train_cfg.get("warmup_steps", 500),
        total_steps=total_steps,
        min_factor=train_cfg.get("min_factor", 0.05))
    commit_w = float(train_cfg.get("commit_weight", 1.0))
    pitch_w = float(train_cfg.get("pitch_loss_weight", 0.0))
    step_fn = jax.jit(make_vq_synthesis_train_step(synth, qcfg, optimizer,
                                                   commit_weight=commit_w,
                                                   pitch_weight=pitch_w))
    state = init_vq_synthesis_train_state(synth, qcfg, optimizer,
                                          jax.random.PRNGKey(seed + 7))

    batch_size = train_cfg.get("batch_size", 32)
    mesh_cfg = dict(cfg.get("mesh", {}) or {})
    mesh = None
    if mesh_cfg:
        from ..parallel.mesh import make_mesh, replicated

        dp_req = mesh_cfg.get("dp", -1)
        mesh = make_mesh(dp=None if dp_req in (-1, None) else int(dp_req),
                         mp=1)
        assert batch_size % mesh.shape["dp"] == 0
        state = jax.tree.map(lambda x: replicated(x, mesh), state)
        features = replicated(features, mesh)
        art = replicated(art, mesh)

    os.makedirs(out_dir, exist_ok=True)
    logger = MetricLogger(out_dir)
    rng = jax.random.PRNGKey(seed)
    order_rng = np.random.RandomState(seed + 1)
    order = np.array([], np.int64)
    import contextlib
    import gc

    from ..parallel.mesh import fetch_replicated

    t_last, s_last = time.perf_counter(), 0
    with (jax.set_mesh(mesh) if mesh is not None
          else contextlib.nullcontext()):
        for step_i in range(total_steps):
            if len(order) < batch_size:
                order = np.arange(n_utts)
                order_rng.shuffle(order)
            idx, order = jnp.asarray(order[:batch_size]), order[batch_size:]
            batch = {"features": features[idx], "art": art[idx]}
            krng = jax.random.fold_in(rng, step_i)
            if mesh is not None:
                from ..parallel.mesh import replicated, shard_batch

                batch = shard_batch(batch, mesh)
                krng = replicated(krng, mesh)
            state, metrics = step_fn(state, batch, krng)
            if (step_i + 1) % log_every == 0:
                m = fetch_replicated(metrics)
                now = time.perf_counter()
                m["steps_per_sec"] = (step_i + 1 - s_last) / (now - t_last)
                t_last, s_last = now, step_i + 1
                row = logger.log(step_i + 1,
                                 {k: float(v) for k, v in m.items()})
                print(f"step {step_i + 1}: " + " ".join(
                    f"{k}={v:.4g}" for k, v in row.items()
                    if k not in ("time", "prefix")), flush=True)
            if (step_i + 1) % 50 == 0:
                gc.collect()

    state = fetch_replicated(state) if mesh is not None else state

    # ---- held-out gate: the FULL wav -> tokens -> CFM chain ----
    tok = TrainedVQTokenizer(state.quantizer, qcfg)
    synth_eval = SegmentSynthesis(
        config=sc, quantizer=tok,
        thresholder_configs=model_cfg.get("thresholder_configs"), seed=seed)
    synth_eval.params = SynthesisParams(enc, state.input_mlp,
                                        state.regressor)
    ev_cfg = dict(cfg.get("eval", {}))
    n_eval = ev_cfg.get("n_utts", 24)
    heldout = build_synthesis_corpus(n_eval, seconds, seed=seed + 90001,
                                     style=style)
    metrics = _eval_token_chain(synth_eval, norm_thr, merge_thr, heldout,
                                steps=eval_steps, seed=seed)
    logger.log(total_steps, metrics, prefix="eval")
    print("eval:", json.dumps(metrics))
    return state, qcfg, metrics


def _eval_token_chain(synth, norm_thr, merge_thr, heldout, steps=50,
                      seed=0, batch=8):
    """pitch/loudness corr + masked L1 of the wav->tokens->CFM chain vs the
    analytic truth (scoring identical to synthesis_loop.evaluate_synthesis)."""
    from .synthesis_loop import _pearson

    wavs, truth = heldout["wav"], np.asarray(heldout["art"], np.float32)
    arts = []
    for i in range(0, len(wavs), batch):
        chunk = wavs[i: i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        a, _ = synth.resynthesize(input_values=chunk, steps=steps, seed=seed,
                                  normthreshold=norm_thr,
                                  merge_threshold=merge_thr)
        arts.append(a[: batch - pad])
    a = np.concatenate(arts, axis=0)
    L = min(a.shape[1], truth.shape[1])
    a, tr = a[:, :L], truth[:, :L]
    voiced = tr[..., 13] > 0.02
    return {"pitch_corr": _pearson(a[..., 12][voiced], tr[..., 12][voiced]),
            "loud_corr": _pearson(a[..., 13].ravel(), tr[..., 13].ravel()),
            "art_l1_voiced": float(np.abs(a[..., :12][voiced]
                                          - tr[..., :12][voiced]).mean()),
            "pitch_l1_voiced": float(np.abs(a[..., 12][voiced]
                                            - tr[..., 12][voiced]).mean()),
            "loud_l1": float(np.abs(a[..., 13] - tr[..., 13]).mean()),
            "ode_steps": steps, "n_eval_utts": int(tr.shape[0])}
