"""Orbax checkpointing: async save/restore of the full train state.

TPU-idiomatic replacement for the reference's Lightning checkpoint stack
(`/root/reference/train.py:11-32,68-71`): a single Orbax checkpoint holds
params + EMA teacher + optimizer state + thresholder stats + step, instead of
a Lightning ckpt plus the `ema_dict.ckpt` sidecar (whose save path is broken
in the reference — SURVEY.md §2.4.2). Also supports bare-params checkpoints
for inference (the reference's HF-hub state_dicts, `sylber.py:46-52`).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_params(path: str, params: Any) -> None:
    """Save a bare param pytree (inference checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), _np_tree(params), force=True)


def save_params_npz(path: str, params: Any, dtype=None) -> None:
    """Save a param pytree as a single compressed ``.npz`` (keys are
    '/'-joined tree paths). Portable/single-file alternative to the Orbax
    directory format — used for small checked-in fixtures and hand-offs;
    ``dtype`` (e.g. float16) optionally downcasts floating leaves."""
    flat = {}

    def _walk(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                _walk(v, key)
            else:
                a = np.asarray(v)
                if dtype is not None and np.issubdtype(a.dtype, np.floating):
                    a = a.astype(dtype)
                flat[key] = a

    _walk(params)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, dtype=np.float32) -> Any:
    """Inverse of :func:`save_params_npz`; floating leaves cast to ``dtype``."""
    z = np.load(path)
    out: dict = {}
    for key in z.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        a = z[key]
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(dtype)
        node[parts[-1]] = a
    return out


def load_params(path: str) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    sub = os.path.join(path, "params")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(sub if os.path.isdir(sub) else path)


class TrainCheckpointManager:
    """Rolling async train-state checkpoints with auto-resume.

    Covers the reference's resume path (`train.py:105` ``ckpt_path=resume``)
    plus preemption recovery the reference lacks (SURVEY.md §5): latest-step
    discovery is automatic, saves are async (off the critical path), and a
    keep-policy bounds disk use.
    """

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def should_save(self, step: int) -> bool:
        """True iff a save(step) would actually persist (interval hit).

        Callers must check this before fetching device state: a
        ``jax.device_get`` of the full train state every step forces a
        pipeline sync + ~1 GB D2H per iteration even when Orbax would
        drop the save."""
        return bool(self._mgr.should_save(step))

    def save(self, step: int, state: Any, force: bool = False) -> None:
        """``force=True`` bypasses the save-interval policy — needed by the
        train loop's interval-CROSSING semantics (steps_per_dispatch > 1 and
        non-aligned resumes produce step numbers that are never exact
        multiples of the interval; Orbax's FixedIntervalPolicy would skip
        them all)."""
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
