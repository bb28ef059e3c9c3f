"""Profiling utilities: step timing, MFU estimation, trace capture.

The reference has no profiling hooks at all (SURVEY.md §5). Here:
- `hubert_train_flops` estimates FLOPs per training step analytically
  (teacher fwd + student fwd/bwd) so the loop can report MFU;
- `trace` wraps `jax.profiler` trace capture as a context manager.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

# per-chip peak bf16 FLOP/s (dense) by device kind substring
PEAK_FLOPS = {
    "v5 lite": 197e12,   # TPU v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6": 918e12,
}


def device_peak_flops(device_kind: str) -> float:
    kind = device_kind.lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12


def hubert_train_flops(config, batch_size: int, num_samples: int) -> float:
    """Approximate FLOPs of one distillation step (teacher fwd = 1x model
    fwd, student fwd+bwd = 3x). Conv frontend + transformer matmuls."""
    frames = config.feat_extract_output_length(num_samples)

    conv = 0.0
    length = num_samples
    in_ch = 1
    for ch, k, s in zip(config.conv_dim, config.conv_kernel, config.conv_stride):
        length = (length - k) // s + 1
        conv += 2.0 * length * ch * in_ch * k
        in_ch = ch

    d = config.hidden_size
    f = config.intermediate_size
    per_layer = (
        2.0 * frames * d * d * 4          # qkv + out projections
        + 2.0 * frames * frames * d * 2   # scores + weighted sum
        + 2.0 * frames * d * f * 2        # FFN
    )
    proj = 2.0 * frames * config.conv_dim[-1] * d
    pos = 2.0 * frames * d * (d // config.num_conv_pos_embedding_groups) \
        * config.num_conv_pos_embeddings
    fwd = conv + proj + pos + per_layer * config.num_hidden_layers
    return batch_size * fwd * 4.0  # teacher fwd (1) + student fwd/bwd (3)


def mfu(step_flops: float, step_time_s: float, device_kind: str,
        n_devices: int = 1) -> float:
    return step_flops / max(step_time_s, 1e-9) / (
        device_peak_flops(device_kind) * n_devices)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
