"""Public inference API: `Segmenter` (and `SegmentSynthesis` in .synthesis).

Preserves the reference surface (`/root/reference/sylber/model/sylber.py:28-138`,
`README.md:34-50`): ``Segmenter(model_ckpt=...)`` then
``segmenter(wav_file=..., in_second=True)`` returning a dict (or list of
dicts) with ``segments``, ``segment_features`` and ``hidden_states``.

TPU-native differences (all output-compatible):
- the HuBERT forward, segmentation, boundary refinement and segment pooling
  run in ONE jitted XLA program per (batch, length) bucket — no device->host
  copy of frame features, no serial numpy loop.
- inputs are bucketed (lengths rounded up, batch padded to fixed sizes) so a
  stream of utterances reuses a small set of compiled programs.
- padded frames are masked out of segmentation, so batched results equal
  single-utterance results (the reference can emit spurious segments in the
  padded tail).
- ``hidden_states`` are returned trimmed to each utterance's true frame count.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .models.hubert import HubertConfig, HubertModel, feature_vector_attention_mask
from .ops.segment import segment_batch
from .utils.audio import load_for_inference

FRAME_RATE = 50.0  # 320x conv stride at 16 kHz


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Segmenter:
    """Syllable segmenter: wav -> {segments, segment_features, hidden_states}.

    Args mirror the reference (`sylber.py:30-38`); ``model_ckpt`` accepts a
    local PyTorch ``sylber.ckpt``-style state_dict path, an Orbax checkpoint
    directory, or ``None`` (random init — tests/benchmarks only).
    """

    def __init__(
        self,
        model_ckpt: Optional[str] = None,
        encoding_layer: int = 9,
        merge_threshold: float = 0.8,
        norm_threshold: float = 2.6,
        dtype: Any = jnp.float32,
        precision: str = "highest",
        length_bucket_s: float = 1.0,
        batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32),
        params: Optional[Dict[str, Any]] = None,
        hubert_config: Optional[HubertConfig] = None,
        mesh: Optional[Any] = None,
        speculative_tokens_per_s: Optional[float] = None,
        **kwargs: Any,
    ) -> None:
        self.config = hubert_config or HubertConfig(
            num_hidden_layers=encoding_layer, dtype=dtype, precision=precision
        )
        self.model = HubertModel(self.config)
        self.norm_threshold = float(norm_threshold)
        self.merge_threshold = float(merge_threshold)
        self.length_bucket = int(length_bucket_s * 16000)
        self.batch_buckets = tuple(sorted(batch_buckets))
        # speculative feature-prefix fetch (serving): start an async D2H
        # copy of features[:, :K] at dispatch time, K sized from this
        # assumed max token rate (tokens/s; real mean is ~4.27). When the
        # batch's max segment count fits in K, finalize skips the
        # data-dependent sliced fetch (~2 serial tunnel RTTs); when it
        # doesn't, the sliced fetch still runs and the prefix bytes were
        # wasted. On a ~25 MB/s tunnel the break-even margin is only a few
        # segments, so this is opt-in — measure with
        # scripts/serving_probe.py --speculate before enabling.
        self.speculative_tokens_per_s = (
            float(speculative_tokens_per_s) if speculative_tokens_per_s
            else None)

        if params is not None:
            self.params = params
        elif model_ckpt is not None:
            self.params = self._load_params(model_ckpt, encoding_layer)
        else:
            self.params = self.model.init_params(jax.random.PRNGKey(0))
        # optional multi-chip data parallelism: params replicated, batches
        # sharded over the mesh's dp axis (XLA handles the rest under jit)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._rep = NamedSharding(mesh, P())
            self._dp = lambda nd: NamedSharding(
                mesh, P("dp", *([None] * (nd - 1))))
            self.params = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), self._rep),
                self.params)
            self.batch_buckets = tuple(
                b for b in self.batch_buckets if b % mesh.shape["dp"] == 0
            ) or (mesh.shape["dp"],)
        else:
            self.params = jax.device_put(
                jax.tree.map(jnp.asarray, self.params)
            )

        model, config = self.model, self.config

        def _fwd(params, wavs, attention_mask, norm_threshold, merge_threshold):
            """One fused program: encoder forward + segmentation + pooling.

            ``wavs`` may be int16 PCM: it is then normalized on device to
            zero-mean/unit-var over the attended samples (the reference's
            Wav2Vec2Processor collate semantics,
            `collective_audio_segment.py:125-127`) — halving host->device
            transfer for production serving."""
            if wavs.dtype == jnp.int16:
                x = wavs.astype(jnp.float32)
                m = attention_mask.astype(jnp.float32)
                n = jnp.maximum(m.sum(-1, keepdims=True), 1.0)
                mean = (x * m).sum(-1, keepdims=True) / n
                var = (((x - mean) * m) ** 2).sum(-1, keepdims=True) / n
                wavs = (x - mean) / jnp.sqrt(var + 1e-7) * m
            hidden = model.apply(
                {"params": params}, wavs, attention_mask
            ).astype(jnp.float32)
            frame_valid = feature_vector_attention_mask(
                config, attention_mask, hidden.shape[1]
            ).astype(bool)
            res = segment_batch(
                hidden, norm_threshold, merge_threshold, frame_valid=frame_valid
            )
            return hidden, res

        self._forward_segment = jax.jit(_fwd)

    @staticmethod
    def _load_params(model_ckpt: str, encoding_layer: int):
        path = Path(model_ckpt)
        if path.is_dir():
            from .io.checkpoint import load_params

            return load_params(str(path))
        if not path.exists():
            # reference behavior: fetch named checkpoints from the HF hub
            # (`sylber.py:47-52`); requires network access.
            name = "sylber.ckpt" if model_ckpt == "sylber" else model_ckpt
            try:
                from huggingface_hub import hf_hub_download

                path = Path(hf_hub_download(repo_id="cheoljun95/sylber",
                                            filename=name))
            except Exception as e:
                raise FileNotFoundError(
                    f"checkpoint {model_ckpt!r} not found locally and HF hub "
                    f"download failed ({e}); pass a local torch state_dict "
                    "file or an Orbax checkpoint directory"
                ) from e
        from .io.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(str(path), num_hidden_layers=encoding_layer)

    # ---- public API ----------------------------------------------------

    def __call__(
        self,
        wav_file: Union[None, str, Path, List] = None,
        wav: Union[None, np.ndarray, List[np.ndarray]] = None,
        in_second: bool = True,
        norm_threshold: Optional[float] = None,
        merge_threshold: Optional[float] = None,
    ):
        if wav_file is not None:
            is_batch = isinstance(wav_file, (list, tuple))
            files = list(wav_file) if is_batch else [wav_file]
            wavs = [load_for_inference(f) for f in files]
        else:
            assert wav is not None
            is_batch = isinstance(wav, (list, tuple))
            wavs = [np.asarray(w, np.float32).reshape(-1) for w in
                    (wav if is_batch else [wav])]

        outputs = self.process(wavs, in_second=in_second,
                               norm_threshold=norm_threshold,
                               merge_threshold=merge_threshold)
        return outputs if is_batch else outputs[0]

    def process(
        self,
        wavs: List[np.ndarray],
        in_second: bool = True,
        norm_threshold: Optional[float] = None,
        merge_threshold: Optional[float] = None,
        return_hidden=True,
    ) -> List[Dict[str, np.ndarray]]:
        """``return_hidden``: True fetches frame features to host (~39 MB per
        32x8s batch); False skips them; "device" leaves them on device as
        ``hidden_states_device`` (callers fetch slices lazily — used by the
        long-form path, where pulling full hidden tracks dominated runtime).
        Segment/feature buffers are fetched as a sliced prefix
        ``[:, :max(num_segments)]`` — for long windows this is ~10x fewer
        bytes than the full (B, MAX_SEGS, d) buffer. Outputs always include
        ``frame_norms`` (cheap, (T,) per item)."""
        return self.process_async(wavs, in_second=in_second,
                                  norm_threshold=norm_threshold,
                                  merge_threshold=merge_threshold,
                                  return_hidden=return_hidden)()

    def process_async(
        self,
        wavs: List[np.ndarray],
        in_second: bool = True,
        norm_threshold: Optional[float] = None,
        merge_threshold: Optional[float] = None,
        return_hidden=True,
    ):
        """Upload + dispatch the fused program and return a zero-arg
        ``finalize()`` producing exactly what :meth:`process` returns.

        Splitting dispatch from fetch lets a serving layer overlap batch
        N's host-side result fetch with batch N+1's upload + dispatch
        (serve.py runs finalize on a separate thread): over the axon
        tunnel the fetch chain is several serial ~27 ms round-trips and
        dominates per-batch latency. Oversize inputs split into
        biggest-bucket sub-batches and STREAM at finalize time with at
        most 2 sub-batches in flight — each sub-batch pins its (B, L, 768)
        output buffers until finalized, so dispatching a corpus-scale list
        all at once would exhaust HBM."""
        nt = self.norm_threshold if norm_threshold is None else float(norm_threshold)
        mt = self.merge_threshold if merge_threshold is None else float(merge_threshold)

        n = len(wavs)
        lengths = [len(w) for w in wavs]
        max_len = _round_up(max(max(lengths), 400), self.length_bucket)
        bsz = next((b for b in self.batch_buckets if b >= n), None)
        if bsz is None:
            big = self.batch_buckets[-1]

            def finalize_all() -> List[Dict[str, np.ndarray]]:
                outs: List[Dict[str, np.ndarray]] = []
                prev = None
                for i in range(0, n, big):
                    cur = self.process_async(wavs[i:i + big], in_second,
                                             nt, mt, return_hidden)
                    if prev is not None:
                        outs.extend(prev())
                    prev = cur
                outs.extend(prev())
                return outs

            return finalize_all

        batch = np.zeros((bsz, max_len), np.float32)
        mask = np.zeros((bsz, max_len), np.int32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
            mask[i, : len(w)] = 1

        batch_dev, mask_dev = jnp.asarray(batch), jnp.asarray(mask)
        if self.mesh is not None:
            batch_dev = jax.device_put(batch_dev, self._dp(2))
            mask_dev = jax.device_put(mask_dev, self._dp(2))
        hidden, res = self._forward_segment(
            self.params, batch_dev, mask_dev,
            jnp.float32(nt), jnp.float32(mt),
        )
        # overlap the small D2H copies: each blocking np.asarray over the
        # axon tunnel costs a serial ~27 ms round-trip, and the serving path
        # pays this per batch. num_segments/segments/norms are tiny
        # ((B, L+1, 2) int32 is ~50 KB) — start them all async, then block.
        # Only `features` (B, L+1, 768) f32 is big enough to need the
        # data-dependent sliced-prefix fetch (measured ~10x fewer bytes).
        small = [res.num_segments, res.segments, res.norms]
        if return_hidden is True:
            small.append(hidden)
        for a in small:
            a.copy_to_host_async()

        spec_feats = spec_k = None
        if self.speculative_tokens_per_s:
            # prefix copy overlaps the forward; margin of +8 over the
            # assumed-max rate bounds wasted bytes at ~B*8*768*4
            spec_k = min(
                int(np.ceil(max_len / 16000.0
                            * self.speculative_tokens_per_s)) + 8,
                res.features.shape[1])
            spec_feats = res.features[:, :spec_k]
            spec_feats.copy_to_host_async()

        def finalize() -> List[Dict[str, np.ndarray]]:
            nseg = np.asarray(res.num_segments)
            max_k = max(int(nseg.max()), 1)
            if spec_feats is not None and max_k <= spec_k:
                feats = np.asarray(spec_feats)[:, :max_k]
            else:
                feats = np.asarray(res.features[:, :max_k])
            segs = np.asarray(res.segments)[:, :max_k]
            norms = np.asarray(res.norms)
            hidden_host = np.asarray(hidden) if return_hidden is True else None

            outputs = []
            for i in range(n):
                k = int(nseg[i])
                seg_i = segs[i, :k].astype(np.int64)
                t_valid = self.config.feat_extract_output_length(lengths[i])
                out = {
                    "segments": seg_i / FRAME_RATE if in_second else seg_i,
                    "segment_features": feats[i, :k].copy() if k
                    else np.array([]),
                    "frame_norms": norms[i, :t_valid],
                }
                if return_hidden is True:
                    out["hidden_states"] = hidden_host[i, :t_valid]
                elif return_hidden == "device":
                    out["hidden_states_device"] = hidden[i]
                    out["num_frames"] = t_valid
                outputs.append(out)
            return outputs

        return finalize
