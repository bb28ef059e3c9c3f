"""Quantizers for syllable tokens (5K/10K/20K-unit variants).

Replaces the reference's vector-quantize-pytorch dependency
(`/root/reference/sylber/model/quantizer.py`):

- `KMQuantizer`: frozen k-means centroids; encode = nearest centroid
  (one argmin over an MXU distance matmul), decode = table lookup
  (`quantizer.py:86-135`). Optional x6 unit-norm of inputs (`:109`).
- `ResidualKMQuantizer`: 2-stage residual k-means (`:137-175`).
- `GroupedResidualVQ` + `Quantizer`: trainable FF encoder with grouped
  residual VQ over separate articulation/pitch sub-spaces, unit-norm
  handling and blank-zero preservation (`:182-257`). Codebooks train with
  EMA k-means updates and a commitment loss; the straight-through estimator
  passes gradients to the encoder.

All pure functions over explicit param pytrees (jit/vmap/pjit friendly).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def unit_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x / sqrt(sum(x^2) + eps), zeros kept finite (`quantizer.py:33-37`)."""
    n = jnp.sqrt((x ** 2).sum(-1, keepdims=True) + eps)
    n = jnp.where(n == 0, 1.0, n)
    return x / n


def unit_norm_sep(x: jnp.ndarray, separate: bool, offset: int) -> jnp.ndarray:
    if separate:
        return jnp.concatenate(
            [unit_norm(x[..., :-offset]), unit_norm(x[..., -offset:])], -1)
    return unit_norm(x)


def _nearest(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||x - c_k||^2 via the expanded matmul form (MXU-friendly)."""
    dots = jnp.einsum("...d,kd->...k", x, centroids,
                      preferred_element_type=jnp.float32)
    c2 = (centroids.astype(jnp.float32) ** 2).sum(-1)
    return jnp.argmin(c2[None, :] - 2.0 * dots.reshape(-1, len(centroids)),
                      axis=-1).reshape(x.shape[:-1]).astype(jnp.int32)


class KMQuantizer:
    """Frozen k-means codebook. ``centroids``: (K, d) array or .npy path."""

    def __init__(self, centroids, normalize: bool = False):
        if isinstance(centroids, (str,)):
            centroids = np.load(centroids)
        centroids = np.asarray(centroids, np.float32)
        assert centroids.ndim == 2, centroids.shape  # (K, d) layout required
        self.centroids = jnp.asarray(centroids)
        self.normalize = normalize

    def get_indices(self, token: jnp.ndarray) -> jnp.ndarray:
        if self.normalize:
            token = token / jnp.sqrt((token ** 2).sum(-1, keepdims=True)
                                     + 1e-8) * 6.0
        return _nearest(token, self.centroids)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        indices = jnp.clip(indices, 0, len(self.centroids) - 1)
        if indices.ndim and indices.shape[-1] == 1:
            indices = indices[..., 0]
        return self.centroids[indices]

    def __call__(self, token):
        idx = self.get_indices(token)
        q = self.decode(idx)
        return {"indices": idx, "quantize": q, "non_quantized": token,
                "commitment_loss": ((token - q) ** 2).mean()}


class ResidualKMQuantizer:
    """Two-stage residual k-means (`quantizer.py:137-175`)."""

    def __init__(self, centroids, centroids2, normalize: bool = False):
        self.km = KMQuantizer(centroids, normalize=normalize)
        self.km2 = KMQuantizer(centroids2)

    def get_indices(self, token: jnp.ndarray) -> jnp.ndarray:
        i1 = self.km.get_indices(token)
        z1 = self.km.decode(i1)
        i2 = self.km2.get_indices(token - z1)
        return jnp.stack([i1, i2], axis=-1)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.km.decode(indices[..., 0]) + self.km2.decode(indices[..., 1])


def load_km_quantizer(centroids, residual_centroids=None, normalize=False):
    """Reference loader surface (`quantizer.py:79-83`)."""
    if residual_centroids is not None:
        return ResidualKMQuantizer(centroids, residual_centroids,
                                   normalize=normalize)
    return KMQuantizer(centroids, normalize=normalize)


def load_quantizer(config=None, ckpt=None):
    """Load a trainable Quantizer from a yaml/dict config and/or a torch
    checkpoint (reference surface `quantizer.py:47-77`). Returns
    (QuantizerState, QuantizerConfig)."""
    import jax

    state_dict = None
    if config is not None and not isinstance(config, dict):
        if str(config).endswith(".ckpt"):
            return load_quantizer(config=None, ckpt=config)
        import yaml

        with open(config) as f:
            config = yaml.safe_load(f)
    if config is None:
        assert ckpt is not None
        from ..io.torch_convert import torch_load

        obj = torch_load(ckpt)
        config = obj["config"]
        state_dict = obj.get("state_dict")
    if "model" in config:
        config = config["model"]

    enc = config["encoder_configs"]
    qcfg = QuantizerConfig(
        input_dim=enc["input_dim"],
        output_dim=enc["output_dim"],
        hidden_dims=tuple(enc["hidden_dims"]),
        pitch_emb_dim=config.get("pitch_emb_dim", 8),
        art_vq=GroupedResidualVQConfig(**config["art_vq_configs"]),
        pitch_vq=GroupedResidualVQConfig(**config["pitch_vq_configs"]),
        unit_norm_encoder_input=config.get("unit_norm_encoder_input", True),
        unit_norm_encoder_output=config.get("unit_norm_encoder_output", True),
        keep_blank_zero=config.get("keep_blank_zero", True),
        separate_norm=config.get("separate_norm", True),
    )
    if state_dict is None and ckpt is not None:
        from ..io.torch_convert import torch_load

        obj = torch_load(ckpt)
        state_dict = obj.get("state_dict", obj)
    if state_dict is not None:
        from ..io.torch_convert import quantizer_state_from_torch

        state = quantizer_state_from_torch(state_dict, qcfg)
    else:
        state = quantizer_init(jax.random.PRNGKey(0), qcfg)
    return state, qcfg


# ---------------- trainable grouped residual VQ ----------------

class VQState(NamedTuple):
    codebooks: jnp.ndarray      # (groups, num_quantizers, K, d_group)
    cluster_sizes: jnp.ndarray  # (groups, num_quantizers, K) EMA counts
    embed_avgs: jnp.ndarray     # EMA sums for k-means updates


@dataclasses.dataclass(frozen=True)
class GroupedResidualVQConfig:
    dim: int
    groups: int = 1
    num_quantizers: int = 1
    codebook_size: int = 1024
    decay: float = 0.99
    eps: float = 1e-5
    commitment_weight: float = 1.0
    # EMA cluster-size floor below which a code is "dead" and gets reseeded
    # from a random batch vector on the next `vq_ema_update(..., rng=...)`
    # (vector-quantize-pytorch's threshold_ema_dead_code). Without this the
    # N(0, 0.02^2)-init codebooks collapse onto ONE code for unit-normed
    # inputs: a single code wins every assignment, EMA drags it to the data
    # mean, and the rest stay at norm ~0.06 forever — measured on the r4
    # pitch VQ as ridge r = 0.000 from the quantized embedding while the
    # pre-VQ embedding decoded pitch at r = 0.884.
    dead_threshold: float = 1.0

    @property
    def dim_group(self) -> int:
        assert self.dim % self.groups == 0
        return self.dim // self.groups


def vq_init(rng: jax.Array, cfg: GroupedResidualVQConfig) -> VQState:
    cb = jax.random.normal(
        rng, (cfg.groups, cfg.num_quantizers, cfg.codebook_size,
              cfg.dim_group)) * 0.02
    return VQState(cb, jnp.ones(cb.shape[:-1]),
                   cb * 1.0)


def vq_encode(state: VQState, cfg: GroupedResidualVQConfig,
              x: jnp.ndarray) -> jnp.ndarray:
    """x (..., dim) -> indices (..., groups * num_quantizers)."""
    parts = jnp.split(x, cfg.groups, axis=-1)
    all_idx = []
    for g, part in enumerate(parts):
        residual = part
        for q in range(cfg.num_quantizers):
            idx = _nearest(residual, state.codebooks[g, q])
            all_idx.append(idx)
            residual = residual - state.codebooks[g, q][idx]
    return jnp.stack(all_idx, axis=-1)


def vq_decode(state: VQState, cfg: GroupedResidualVQConfig,
              indices: jnp.ndarray) -> jnp.ndarray:
    outs = []
    i = 0
    for g in range(cfg.groups):
        acc = 0.0
        for q in range(cfg.num_quantizers):
            idx = jnp.clip(indices[..., i], 0, cfg.codebook_size - 1)
            acc = acc + state.codebooks[g, q][idx]
            i += 1
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def vq_forward(state: VQState, cfg: GroupedResidualVQConfig, x: jnp.ndarray):
    """Returns (quantized with straight-through grads, indices, commit loss)."""
    idx = vq_encode(state, cfg, jax.lax.stop_gradient(x))
    q = vq_decode(state, cfg, idx)
    commit = ((jax.lax.stop_gradient(q) - x) ** 2).mean() * cfg.commitment_weight
    q_st = x + jax.lax.stop_gradient(q - x)
    return q_st, idx, commit


def vq_ema_update(state: VQState, cfg: GroupedResidualVQConfig,
                  x: jnp.ndarray, indices: jnp.ndarray,
                  rng: jax.Array = None,
                  mask: jnp.ndarray = None) -> VQState:
    """EMA k-means codebook update (vector-quantize-pytorch semantics).

    ``mask`` (broadcastable to x's leading dims) excludes frames — e.g.
    blanks, whose exact-zero vectors otherwise pollute the stats — from
    both the EMA counts and the reseed pool. With ``rng`` set, codes whose
    EMA cluster size fell below ``cfg.dead_threshold`` are reseeded from
    random (masked-valid) batch vectors — vector-quantize-pytorch's
    expired-code replacement, the piece whose absence collapsed the unit-
    normed pitch VQ onto a single code (see GroupedResidualVQConfig).
    Reseeded codes get cluster size ``2 * dead_threshold`` (a ~70-step
    grace window at decay 0.99 before they can die again)."""
    parts = jnp.split(x.reshape(-1, cfg.dim), cfg.groups, axis=-1)
    flat_idx = indices.reshape(-1, cfg.groups * cfg.num_quantizers)
    n_pts = flat_idx.shape[0]
    if mask is not None:
        m = jnp.broadcast_to(mask, x.shape[:-1]).reshape(n_pts)
        m = m.astype(x.dtype)
    else:
        m = jnp.ones((n_pts,), x.dtype)
    any_valid = m.sum() > 0
    # one categorical draw of a valid point per (group, quantizer, code)
    if rng is not None:
        logits = jnp.where(m > 0, 0.0, -1e9)
        sample_idx = jax.random.categorical(
            rng, logits,
            shape=(cfg.groups, cfg.num_quantizers, cfg.codebook_size))
    new_cb, new_sz, new_avg = [], [], []
    i = 0
    for g, part in enumerate(parts):
        residual = part
        g_cb, g_sz, g_avg = [], [], []
        for q in range(cfg.num_quantizers):
            idx = flat_idx[:, i]
            onehot = jax.nn.one_hot(idx, cfg.codebook_size, dtype=part.dtype)
            onehot = onehot * m[:, None]
            counts = onehot.sum(0)
            sums = onehot.T @ residual
            sz = state.cluster_sizes[g, q] * cfg.decay + counts * (1 - cfg.decay)
            avg = state.embed_avgs[g, q] * cfg.decay + sums * (1 - cfg.decay)
            denom = jnp.maximum(sz, cfg.eps)[:, None]
            cb = jnp.where(counts[:, None] > 0, avg / denom,
                           state.codebooks[g, q])
            if rng is not None:
                dead = (sz < cfg.dead_threshold) & any_valid
                seeds = residual[sample_idx[g, q]]  # (K, d_group)
                grace = jnp.asarray(2.0 * cfg.dead_threshold, sz.dtype)
                cb = jnp.where(dead[:, None], seeds, cb)
                sz = jnp.where(dead, grace, sz)
                avg = jnp.where(dead[:, None], seeds * grace, avg)
            residual = residual - state.codebooks[g, q][idx]
            g_cb.append(cb)
            g_sz.append(sz)
            g_avg.append(avg)
            i += 1
        new_cb.append(jnp.stack(g_cb))
        new_sz.append(jnp.stack(g_sz))
        new_avg.append(jnp.stack(g_avg))
    return VQState(jnp.stack(new_cb), jnp.stack(new_sz), jnp.stack(new_avg))


# ---------------- trainable encoder + art/pitch quantizer ----------------

class FFEncoder(object):
    """Flax-free MLP encoder matching `quantizer.py:15-31`: per hidden dim a
    Linear followed by a (non-residual) FeedForward = Linear -> ReLU ->
    Linear, then a final Linear."""

    @staticmethod
    def init(rng, input_dim, output_dim, hidden_dims):
        params = []
        dims = [input_dim]
        keys = jax.random.split(rng, 3 * len(hidden_dims) + 1)
        ki = 0

        def dense(key, din, dout):
            lim = (6.0 / (din + dout)) ** 0.5
            return {"kernel": jax.random.uniform(key, (din, dout),
                                                 minval=-lim, maxval=lim),
                    "bias": jnp.zeros(dout)}

        for h in hidden_dims:
            params.append(dense(keys[ki], dims[-1], h)); ki += 1
            params.append(dense(keys[ki], h, h)); ki += 1
            params.append(dense(keys[ki], h, h)); ki += 1
            dims.append(h)
        params.append(dense(keys[ki], dims[-1], output_dim))
        return params

    @staticmethod
    def apply(params, x, n_hidden):
        i = 0
        for _ in range(n_hidden):
            x = x @ params[i]["kernel"] + params[i]["bias"]; i += 1
            h = jax.nn.relu(x @ params[i]["kernel"] + params[i]["bias"]); i += 1
            x = h @ params[i]["kernel"] + params[i]["bias"]; i += 1
        return x @ params[i]["kernel"] + params[i]["bias"]


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """Trainable art/pitch quantizer (`quantizer.py:182-257`)."""
    input_dim: int = 768
    output_dim: int = 64
    hidden_dims: Tuple[int, ...] = (256, 256)
    pitch_emb_dim: int = 8
    art_vq: GroupedResidualVQConfig = GroupedResidualVQConfig(dim=56)
    pitch_vq: GroupedResidualVQConfig = GroupedResidualVQConfig(dim=8)
    unit_norm_encoder_input: bool = True
    unit_norm_encoder_output: bool = True
    keep_blank_zero: bool = True
    separate_norm: bool = True


class QuantizerState(NamedTuple):
    encoder: list
    art_vq: VQState
    pitch_vq: VQState


def quantizer_init(rng: jax.Array, cfg: QuantizerConfig) -> QuantizerState:
    k1, k2, k3 = jax.random.split(rng, 3)
    return QuantizerState(
        FFEncoder.init(k1, cfg.input_dim, cfg.output_dim, cfg.hidden_dims),
        vq_init(k2, cfg.art_vq),
        vq_init(k3, cfg.pitch_vq),
    )


def quantizer_forward(state: QuantizerState, cfg: QuantizerConfig,
                      token: jnp.ndarray):
    """token (B, L, d) -> dict(indices, quantize, non_quantized,
    commitment_loss) — semantics of `quantizer.py:213-241`."""
    non_blank = (token ** 2).sum(-1) > 0
    if cfg.unit_norm_encoder_input:
        token = unit_norm(token)
    token = FFEncoder.apply(state.encoder, token, len(cfg.hidden_dims))
    if cfg.unit_norm_encoder_output:
        token = unit_norm_sep(token, cfg.separate_norm, cfg.pitch_emb_dim)
    if cfg.keep_blank_zero:
        token = jnp.where(non_blank[..., None], token, 0.0)

    art, pitch = token[..., :-cfg.pitch_emb_dim], token[..., -cfg.pitch_emb_dim:]
    art_q, art_idx, art_loss = vq_forward(state.art_vq, cfg.art_vq, art)
    pitch_q, pitch_idx, pitch_loss = vq_forward(state.pitch_vq, cfg.pitch_vq,
                                                pitch)
    quantized = jnp.concatenate([art_q, pitch_q], -1)
    if cfg.unit_norm_encoder_output:
        quantized = unit_norm_sep(quantized, cfg.separate_norm,
                                  cfg.pitch_emb_dim)
    indices = jnp.concatenate([art_idx, pitch_idx], -1)
    return {"indices": indices, "quantize": quantized, "non_quantized": token,
            "commitment_loss": art_loss + pitch_loss}


def quantizer_decode(state: QuantizerState, cfg: QuantizerConfig,
                     indices: jnp.ndarray) -> jnp.ndarray:
    indices = jnp.clip(indices, 0, None)
    n_art = cfg.art_vq.groups * cfg.art_vq.num_quantizers
    art = vq_decode(state.art_vq, cfg.art_vq, indices[..., :n_art])
    pitch = vq_decode(state.pitch_vq, cfg.pitch_vq, indices[..., n_art:])
    q = jnp.concatenate([art, pitch], -1)
    if cfg.unit_norm_encoder_output:
        q = unit_norm_sep(q, cfg.separate_norm, cfg.pitch_emb_dim)
    return q


# ---------------------------------------------------------------------------
# explicit pitch token (scalar quantizer)
# ---------------------------------------------------------------------------


class ScalarPitchQuantizer:
    """Uniform scalar quantizer for per-segment mean log-pitch.

    The discrete counterpart of the reference Quantizer's pitch sub-space
    (`/root/reference/sylber/model/quantizer.py:182-257`) for the
    explicit-pitch conditioning mode (`ops/pitch.py` rationale): where
    the reference VQ-codes a pitch embedding *derived from segment
    features*, this codes the per-segment mean log(F0 / pitch_mean)
    *measured from the input audio*, so the token stream carries pitch
    the features never held.

    Index 0 is reserved for "unvoiced segment"; indices 1..n_bins map the
    [lo, hi] log-pitch range uniformly (defaults cover 70-400 Hz around a
    120 Hz corpus mean). All methods are jittable.
    """

    def __init__(self, n_bins: int = 64, lo: float = -0.54, hi: float = 1.21):
        assert n_bins >= 2 and hi > lo, (n_bins, lo, hi)
        self.n_bins = int(n_bins)
        self.lo, self.hi = float(lo), float(hi)
        self.step = (self.hi - self.lo) / self.n_bins

    @property
    def vocab_size(self) -> int:
        return self.n_bins + 1  # + the unvoiced token

    def get_indices(self, values: jnp.ndarray, has: jnp.ndarray
                    ) -> jnp.ndarray:
        """(values, has) (B, MS) -> int32 tokens (B, MS); 0 = unvoiced."""
        b = jnp.floor((values - self.lo) / self.step).astype(jnp.int32)
        b = jnp.clip(b, 0, self.n_bins - 1)
        return jnp.where(has, b + 1, 0)

    def decode(self, indices: jnp.ndarray):
        """Tokens -> (bin-center values, has) (B, MS)."""
        has = indices > 0
        centers = self.lo + (indices.astype(jnp.float32) - 0.5) * self.step
        return jnp.where(has, centers, 0.0), has
