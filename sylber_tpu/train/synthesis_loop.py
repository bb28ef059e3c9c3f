"""Resynthesis (SegmentSynthesis) training orchestration.

The reference ships a `sylber_resynthesis.yaml` recipe but its released
training forward is broken dead code (`segment_synthesis.py:152-199` never
computes ``cfm_loss`` — SURVEY.md §2.4.3); the intended step is clear from
`ConditionalFlowMatcherWrapperRegressor.forward`
(`/root/reference/sylber/model/flowmatching.py:826-871`) and the trainer
recipe (`segment_synthesis.py:244-250`). This module drives that step
end-to-end:

1. build a (wav, art) corpus — on this image the synthetic syllabic corpus
   with *analytic* articulatory ground truth (`data/synthetic.py::ART_BANK`,
   log-pitch, frame-RMS loudness) stands in for LibriSpeech+SPARC;
2. precompute conditioning features once with the frozen encoder (one jitted
   program: HuBERT forward -> on-device segmentation -> averaged/blanked
   fill), exactly the reference's frozen ``speech_model`` wav path
   (`segment_synthesis.py:107-135`) — the corpus is fixed and the encoder
   frozen, so features are training invariants and live device-resident;
3. run `make_synthesis_train_step` (AdamW eps 1e-4, betas (0.9, 0.95),
   wd 0.1, clip 0.5, warmup-cosine) over device-resident batches;
4. gate sampled trajectories against the ground-truth pitch/loudness tracks
   (Pearson correlation + masked L1).

Entry: ``python train_synthesis.py --config configs/sylber_resynthesis_mini.yaml``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
FRAME = 320
BUFFER = 160  # reference zero-buffer at both ends (dataset collate semantics)


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

def build_synthesis_corpus(n_utts: int, seconds: float = 5.0,
                           seed: int = 0,
                           style: str = "v1") -> Dict[str, np.ndarray]:
    """(wav, art) pairs with analytic articulatory ground truth.

    wav: (N, S + 2*BUFFER) zero-mean/unit-var (collate semantics);
    art: (N, L, 14) at 50 Hz, L = S//FRAME (equal to the padded HuBERT
    frame count: buffered length S+320 -> (S+320-400)//320 + 1 = S//320).
    ``style="rich"`` uses the enriched multi-speaker/intonation corpus
    (data/synthetic.py) — the default "v1" keeps fixtures bit-identical.
    """
    from ..data.dataset import _zero_mean_unit_var
    from ..data.synthetic import synth_utterance

    n_samples = int(seconds * SR) // FRAME * FRAME
    rng = np.random.RandomState(seed)
    wavs, arts = [], []
    for _ in range(n_utts):
        wav, _segs, art = synth_utterance(rng, n_samples, return_art=True,
                                          style=style)
        wav = _zero_mean_unit_var(wav)
        wav = np.concatenate([np.zeros(BUFFER, np.float32), wav,
                              np.zeros(BUFFER, np.float32)])
        wavs.append(wav)
        arts.append(art)
    return {"wav": np.stack(wavs), "art": np.stack(arts)}


# ---------------------------------------------------------------------------
# frozen-encoder feature precompute
# ---------------------------------------------------------------------------

def precompute_features(hubert, hubert_params, wav: np.ndarray,
                        norm_threshold: float, merge_threshold: float,
                        batch: int = 32, explicit_pitch: bool = False,
                        pitch_mean: float = 120.0):
    """Averaged/blanked hidden states for the whole corpus, one jitted
    program per batch (frozen encoder -> segmentation -> averaged fill,
    the reference wav path `segment_synthesis.py:107-135`).

    ``explicit_pitch=True`` additionally tracks F0 on the wav in the same
    program and returns ``(features, pitch_cond)`` where pitch_cond (N, L)
    is the frame-filled per-segment mean log(F0/pitch_mean) — the training
    counterpart of the inference wav path, so the conditioning channel is
    measured identically at train and test time (`ops/pitch.py`)."""
    from ..ops.pitch import segment_pitch_cond
    from ..ops.segment import averaged_target_fill, segment_batch

    @jax.jit
    def fwd(params, w):
        hidden = hubert.apply({"params": params}, w, None)
        hidden = hidden.astype(jnp.float32)
        res = segment_batch(hidden, norm_threshold, merge_threshold)
        filled = averaged_target_fill(hidden, res.segments, res.num_segments)
        if not explicit_pitch:
            return filled, None
        pc = segment_pitch_cond(w, res.segments, res.num_segments,
                                hidden.shape[1], pitch_mean=pitch_mean)
        return filled, pc

    n = wav.shape[0]
    outs, pcs = [], []
    for i in range(0, n, batch):
        chunk = wav[i: i + batch]
        pad = 0
        if chunk.shape[0] < batch:  # keep one compiled shape
            pad = batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    chunk.dtype)])
        out, pc = fwd(hubert_params, jnp.asarray(chunk))
        outs.append(np.asarray(out[: batch - pad]))
        if explicit_pitch:
            pcs.append(np.asarray(pc[: batch - pad]))
    feats = jnp.asarray(np.concatenate(outs, axis=0))
    if explicit_pitch:
        return feats, jnp.asarray(np.concatenate(pcs, axis=0))
    return feats


# ---------------------------------------------------------------------------
# evaluation gate
# ---------------------------------------------------------------------------

def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12
    return float((a * b).sum() / den)


def evaluate_synthesis(synth, features: jnp.ndarray, art_truth: np.ndarray,
                       steps: int = 50, seed: int = 0,
                       method: str = "midpoint",
                       pitch_cond: Optional[jnp.ndarray] = None,
                       ) -> Dict[str, float]:
    """Sample trajectories from conditioning features and score them against
    the analytic ground truth: Pearson correlation of the log-pitch channel
    over voiced frames and of loudness over all frames, per-utterance
    mean-removed pitch-modulation corr, plus masked L1 of the 12
    articulator dims."""
    from ..utils.metrics import per_utterance_pitch_modulation

    art, _ = synth.resynthesize(features=np.asarray(features), steps=steps,
                                seed=seed, method=method,
                                pitch_cond=pitch_cond)
    truth = np.asarray(art_truth, np.float32)
    voiced = truth[..., 13] > 0.02
    pitch_r = _pearson(art[..., 12][voiced], truth[..., 12][voiced])
    loud_r = _pearson(art[..., 13].ravel(), truth[..., 13].ravel())
    art_l1 = float(np.abs(art[..., :12][voiced]
                          - truth[..., :12][voiced]).mean())
    pitch_l1 = float(np.abs(art[..., 12][voiced]
                            - truth[..., 12][voiced]).mean())
    loud_l1 = float(np.abs(art[..., 13] - truth[..., 13]).mean())
    return {"pitch_corr": pitch_r, "loud_corr": loud_r,
            "pitch_mod_r": per_utterance_pitch_modulation(art, truth),
            "art_l1_voiced": art_l1, "pitch_l1_voiced": pitch_l1,
            "loud_l1": loud_l1, "n_eval_utts": int(truth.shape[0]),
            "ode_steps": steps}


# ---------------------------------------------------------------------------
# training loop
# ---------------------------------------------------------------------------

def synthesis_config_from_dict(cfg: Dict[str, Any]):
    """Yaml -> SynthesisConfig, honoring an optional ``hubert:`` override
    block (mini-encoder recipes) on top of the reference keys."""
    from ..models.hubert import HubertConfig
    from ..synthesis import SynthesisConfig

    sc = SynthesisConfig.from_yaml_dict(cfg)
    hub = cfg.get("hubert")
    if hub:
        extra = {k: tuple(v) if isinstance(v, list) else v
                 for k, v in hub.items()}
        sc = dataclasses.replace(
            sc, hubert=HubertConfig(
                num_hidden_layers=cfg.get("encoding_layer", 9), **extra))
    return sc


def _load_encoder_params(path: str, num_hidden_layers: int):
    from pathlib import Path

    p = Path(path)
    if p.suffix == ".npz":
        from ..io.checkpoint import load_params_npz

        return load_params_npz(str(p))
    if p.is_dir():
        from ..io.checkpoint import load_params

        return load_params(str(p))
    from ..io.torch_convert import load_torch_checkpoint

    return load_torch_checkpoint(str(p), num_hidden_layers=num_hidden_layers)


def train_synthesis(
    cfg: Dict[str, Any],
    out_dir: str = "runs/synthesis",
    max_steps: Optional[int] = None,
    log_every: int = 50,
    seed: int = 0,
    eval_steps: int = 50,
) -> Tuple[Any, Dict[str, float]]:
    """Returns ``(final SynthesisTrainState, eval metrics)``. ``cfg`` is the
    parsed resynthesis yaml with ``data:``/``train:`` sections."""
    from ..synthesis import (SegmentSynthesis, SynthesisParams,
                             init_synthesis_train_state,
                             make_synthesis_optimizer,
                             make_synthesis_train_step)
    from ..train.thresholder import get_threshold
    from .loop import MetricLogger

    model_cfg = dict(cfg.get("model", cfg))  # keys may be top-level
    data_cfg = dict(cfg.get("data", {}))
    train_cfg = dict(cfg.get("train", {}))
    sc = synthesis_config_from_dict(model_cfg)
    synth = SegmentSynthesis(
        config=sc,
        thresholder_configs=model_cfg.get("thresholder_configs"), seed=seed)

    enc_ckpt = cfg.get("speech_model_ckpt")
    if enc_ckpt:
        enc = _load_encoder_params(enc_ckpt, sc.hubert.num_hidden_layers)
        synth.params = SynthesisParams(enc, synth.params.input_mlp,
                                       synth.params.regressor)
    else:
        import warnings

        warnings.warn("train_synthesis: no speech_model_ckpt — conditioning "
                      "features come from a RANDOM-INIT encoder; pass a "
                      "trained sylber checkpoint for meaningful training")

    norm_thr = model_cfg.get("norm_threshold")
    if norm_thr is None:
        norm_thr = float(get_threshold(synth.thresholder))
    lo, hi = sc.merge_threshold_range
    merge_thr = (lo + hi) / 2.0

    # ---- corpus + conditioning features (device-resident invariants) ----
    assert data_cfg.get("synthetic", True), \
        "only the synthetic (wav, art) corpus is available offline"
    n_utts = data_cfg.get("n_utts", 256)
    seconds = data_cfg.get("seconds", 5.0)
    style = data_cfg.get("style", "v1")
    corpus = build_synthesis_corpus(n_utts, seconds, seed=seed, style=style)
    t0 = time.time()
    pitch_cond = None
    if sc.explicit_pitch_cond:
        features, pitch_cond = precompute_features(
            synth.hubert, synth.params.hubert, corpus["wav"], norm_thr,
            merge_thr, explicit_pitch=True, pitch_mean=sc.pitch_cond_mean)
    else:
        features = precompute_features(synth.hubert, synth.params.hubert,
                                       corpus["wav"], norm_thr, merge_thr)
    art = jnp.asarray(corpus["art"])
    print(f"precomputed features {tuple(features.shape)} "
          f"(norm_thr {norm_thr:.3f}"
          f"{', explicit pitch cond' if pitch_cond is not None else ''}) "
          f"in {time.time() - t0:.1f}s")

    # ---- optimizer + jitted step ----
    lr = train_cfg.get("lr", 1e-4)
    total_steps = max_steps or train_cfg.get("max_steps", 20_000)
    optimizer = make_synthesis_optimizer(
        lr=lr, warmup_steps=train_cfg.get("warmup_steps", 500),
        total_steps=total_steps,
        min_factor=train_cfg.get("min_factor", 0.05))
    step_fn = jax.jit(make_synthesis_train_step(synth, optimizer))
    state = init_synthesis_train_state(synth, optimizer)

    batch_size = train_cfg.get("batch_size", 32)
    assert n_utts >= batch_size, (n_utts, batch_size)

    # ---- optional DP mesh (same `mesh: {dp}` knob as the distillation
    # loop; the reference's intended resynthesis training would have ridden
    # the same Lightning DDP, /root/reference/train.py:91-102). The CFM
    # trainer is DP-only: batches shard over dp, state replicates, GSPMD
    # inserts the gradient psum. mp>1 is rejected — the regressor has no
    # TP rules and silently replicating would misreport the mesh. ----
    mesh_cfg = dict(cfg.get("mesh", {}) or {})
    mesh = None
    if mesh_cfg:
        from ..parallel.mesh import make_mesh, replicated, shard_batch

        assert int(mesh_cfg.get("mp", 1)) == 1, \
            "synthesis trainer supports dp sharding only"
        dp_req = mesh_cfg.get("dp", -1)
        mesh = make_mesh(dp=None if dp_req in (-1, None) else int(dp_req),
                         mp=1)
        dp = mesh.shape["dp"]
        assert batch_size % dp == 0, (batch_size, dp)
        state = jax.tree.map(lambda x: replicated(x, mesh), state)
        features = replicated(features, mesh)
        art = replicated(art, mesh)
        if pitch_cond is not None:
            pitch_cond = replicated(pitch_cond, mesh)
        print(f"mesh: dp={dp} over {dp} devices")
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricLogger(out_dir)
    rng = jax.random.PRNGKey(seed)
    order_rng = np.random.RandomState(seed + 1)
    order = np.array([], np.int64)

    t_last, s_last = time.perf_counter(), 0
    import contextlib
    import gc

    from ..parallel.mesh import fetch_replicated

    mesh_ctx = jax.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
    with mesh_ctx:
        for step_i in range(total_steps):
            if len(order) < batch_size:
                order = np.arange(n_utts)
                order_rng.shuffle(order)
            idx, order = jnp.asarray(order[:batch_size]), order[batch_size:]
            batch = {"features": features[idx], "art": art[idx]}
            if pitch_cond is not None:
                batch["pitch_cond"] = pitch_cond[idx]
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
                    if k not in ("time", "prefix")))
            if (step_i + 1) % 50 == 0:
                gc.collect()  # few-but-huge-objects GC gap (train/loop.py)

    # eval + artifacts run outside the mesh context on host-assembled
    # params (fetch_replicated: first addressable shard IS the value)
    final_params = (state.params if mesh is None
                    else fetch_replicated(state.params))
    synth.params = final_params
    state = state._replace(params=final_params)

    # ---- held-out gate ----
    ev_cfg = dict(cfg.get("eval", {}))
    n_eval = ev_cfg.get("n_utts", 24)
    heldout = build_synthesis_corpus(n_eval, seconds, seed=seed + 90001,
                                     style=style)
    pitch_ev = None
    if sc.explicit_pitch_cond:
        feats_ev, pitch_ev = precompute_features(
            synth.hubert, synth.params.hubert, heldout["wav"], norm_thr,
            merge_thr, explicit_pitch=True, pitch_mean=sc.pitch_cond_mean)
    else:
        feats_ev = precompute_features(synth.hubert, synth.params.hubert,
                                       heldout["wav"], norm_thr, merge_thr)
    metrics = evaluate_synthesis(synth, feats_ev, heldout["art"],
                                 steps=eval_steps, seed=seed,
                                 pitch_cond=pitch_ev)
    logger.log(total_steps, metrics, prefix="eval")
    print("eval:", json.dumps(metrics))

    # ---- artifacts ----
    from ..io.checkpoint import save_params

    save_params(os.path.join(out_dir, "synthesis_final"),
                {"hubert": state.params.hubert,
                 "input_mlp": state.params.input_mlp,
                 "regressor": state.params.regressor})
    with open(os.path.join(out_dir, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return state, metrics
