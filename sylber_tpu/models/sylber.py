"""`Sylber`: stateful convenience façade over the functional training stack.

The reference exports a torch ``Sylber`` nn.Module
(`/root/reference/sylber/model/sylber.py:140-352`) alongside ``Segmenter``.
The TPU-native training path is the *functional* API in
:mod:`sylber_tpu.train.distill` (pure train steps over a state pytree —
that is what the training loop and the multi-chip path use). This class
wraps that API behind the reference's object surface for interactive use:

    model = Sylber(segment_online=True, thresholder_configs={...})
    model.ema_step()                      # teacher update
    out = model(input_values, noise=...)  # {'distillation_loss': ...}
    feats, segments, avg_fts = model.segment(input_values)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment import segment_batch
from ..train.distill import DistillConfig, distill_loss
from ..train.ema import ema_update
from ..train.thresholder import get_threshold
from .hubert import HubertConfig, HubertModel


class Sylber:
    def __init__(
        self,
        encoding_layer: int = 9,
        ema_decay: float = 0.999,
        do_noise_augment: bool = False,
        noise_mixer_configs: Optional[dict] = None,
        mask_prob: float = 0.0,
        segment_online: bool = False,
        thresholder_configs: Optional[dict] = None,
        min_mask_n: int = 0,
        merge_threshold_range=(0.5, 0.7),
        max_mask_set: int = 1,
        use_train_thrupdate: bool = False,
        hubert_config: Optional[HubertConfig] = None,
        params: Any = None,
        seed: int = 0,
        **kwargs: Any,
    ) -> None:
        from ..data.noise import NoiseMixerConfig
        from ..train.distill import init_train_state

        model_cfg = hubert_config or HubertConfig(
            num_hidden_layers=encoding_layer)
        self.config = DistillConfig(
            model=model_cfg,
            ema_decay=ema_decay,
            segment_online=segment_online,
            merge_threshold_range=tuple(merge_threshold_range),
            use_train_thrupdate=use_train_thrupdate,
            mask_prob=mask_prob,
            min_mask_n=min_mask_n,
            max_mask_set=max_mask_set,
            do_noise_augment=do_noise_augment,
            noise_mixer=NoiseMixerConfig(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in (noise_mixer_configs or {}).items()}),
        )
        state = init_train_state(
            self.config, jax.random.PRNGKey(seed), params=params,
            thresholder_kwargs=thresholder_configs or {})
        self.model = HubertModel(model_cfg)
        self.params = state.params
        self.ema_params = None
        self.thresholder = state.thresholder
        self._rng = jax.random.PRNGKey(seed + 1)

    def _next_rng(self) -> jax.Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    def ema_step(self) -> None:
        """First call snapshots the student as the teacher; later calls apply
        the EMA decay (reference `sylber.py:194-206`)."""
        if self.ema_params is None:
            self.ema_params = jax.tree.map(lambda p: p, self.params)
        else:
            self.ema_params = ema_update(self.ema_params, self.params,
                                         self.config.ema_decay)

    def segment(self, input_values, attention_mask=None, mergethreshold=None,
                normthreshold=None, features=None, **kwargs):
        """Returns (features, segments, avg_fts) like `sylber.py:208-247`."""
        if features is None:
            wav = jnp.asarray(np.atleast_2d(np.asarray(input_values)))
            features = self.model.apply(
                {"params": self.params}, wav,
                jnp.asarray(attention_mask) if attention_mask is not None
                else None).astype(jnp.float32)
        if normthreshold is None:
            assert self.config.segment_online
            normthreshold = float(get_threshold(self.thresholder))
        if mergethreshold is None:
            lo, hi = self.config.merge_threshold_range
            # drawn from the façade's explicit PRNG stream (seeded at
            # construction) so replayed runs are reproducible — the global
            # numpy RNG is never touched by this class
            mergethreshold = (
                float(jax.random.uniform(self._next_rng(), minval=lo,
                                         maxval=hi)) if lo < hi else float(lo))
        res = segment_batch(features, normthreshold, mergethreshold)
        segments = [np.asarray(res.segments[b][: int(res.num_segments[b])])
                    for b in range(features.shape[0])]
        return features, segments, res.features

    def forward(self, input_values, segments=None, attention_mask=None,
                noise=None, **kwargs) -> Dict[str, Any]:
        if self.ema_params is None:
            self.ema_step()
        batch = {
            "input_values": jnp.asarray(np.atleast_2d(input_values)),
            "attention_mask": (jnp.asarray(attention_mask)
                               if attention_mask is not None else None),
            "noise": jnp.asarray(noise) if noise is not None else None,
            "segments": None,
        }
        if segments is not None:
            MS = max(len(s) for s in segments) + 1
            B = len(segments)
            seg = np.zeros((B, MS, 2), np.int32)
            cnt = np.zeros((B,), np.int32)
            for b, s in enumerate(segments):
                seg[b, : len(s)] = s
                cnt[b] = len(s)
            batch["segments"] = jnp.asarray(seg)
            batch["num_segments"] = jnp.asarray(cnt)
        loss, aux = distill_loss(self.params, self.ema_params,
                                 self.thresholder, batch, self._next_rng(),
                                 self.config)
        self.thresholder = aux.pop("thresholder")
        return {"distillation_loss": aux["distillation_loss"], **{
            k: v for k, v in aux.items() if k != "distillation_loss"}}

    __call__ = forward
