"""Production serving: asynchronous micro-batching around :class:`Segmenter`.

The reference has no serving layer at all (SURVEY.md §1: "no serving
layer"); its `Segmenter.__call__` (`/root/reference/sylber/model/sylber.py:63`)
is a blocking, caller-batched API. For production TPU serving the economics
are different: a v5e chip segments a *batch* of utterances in roughly the
time it segments one (the forward is MXU-bound and the per-dispatch tunnel
round-trip is fixed), so throughput comes from transparently coalescing
concurrent requests into full batches.

:class:`SegmenterServer` is an in-process micro-batching engine:

- callers ``submit(wav)`` from any thread and get a
  ``concurrent.futures.Future``;
- a single dispatcher thread drains the queue, groups compatible requests
  (same thresholds/options), packs them by length to minimise padding waste,
  and runs one fused ``Segmenter.process`` call per batch — XLA program
  reuse is guaranteed by the Segmenter's (batch, length) bucketing;
- results are fanned back out to the per-request futures; a failed batch
  fails only its own requests, the server keeps serving.

Batching policy: the dispatcher waits at most ``max_wait_ms`` after the
first queued request to let a batch fill (classic deadline-based micro
batching), so p99 latency is bounded by ``max_wait_ms`` + one model step
even at low load, while at high load batches are full and the wait never
triggers. One model step at B=32 on v5e is ~60 ms for 7 s utterances, so
the default 10 ms window costs <20% latency at worst and up to 32x
throughput.

A tiny stdlib-HTTP frontend lives in ``scripts/serve_http.py``.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclass
class _Request:
    wav: np.ndarray
    future: Future
    key: tuple  # (norm_threshold, merge_threshold, in_second, return_hidden)
    t_enqueue: float


@dataclass
class ServerStats:
    """Snapshot of serving counters (cumulative since start)."""

    requests: int = 0
    completed: int = 0
    failed: int = 0
    batches: int = 0
    batched_items: int = 0
    queue_depth: int = 0
    latency_p50_ms: float = 0.0
    latency_p95_ms: float = 0.0
    latency_mean_ms: float = 0.0

    @property
    def mean_batch_size(self) -> float:
        return self.batched_items / self.batches if self.batches else 0.0


class SegmenterServer:
    """Micro-batching request server around a :class:`Segmenter`.

    Args:
      segmenter: the (already constructed) Segmenter; the server never
        mutates it and issues all device work from one dispatcher thread.
      max_batch: largest batch handed to ``Segmenter.process`` (clamped to
        the segmenter's largest batch bucket so one submit = one program).
      max_wait_ms: deadline after the first request of a batch before
        dispatching a partial batch.
      max_queue: backpressure bound; ``submit`` raises ``queue.Full`` beyond
        it rather than buffering unboundedly.
      pipeline_depth: >0 overlaps batch N's result fetch (finalizer thread)
        with batch N+1's upload+dispatch via ``Segmenter.process_async``.
        Default 0 (synchronous): over the serialized axon tunnel the
        overlap measured SLOWER (head-of-line blocking of the fetch chain
        behind the next forward); enable on real TPU hosts and measure.
    """

    def __init__(
        self,
        segmenter,
        max_batch: int = 32,
        max_wait_ms: float = 10.0,
        max_queue: int = 4096,
        pipeline_depth: int = 0,
    ) -> None:
        self.segmenter = segmenter
        cap = max(getattr(segmenter, "batch_buckets", (max_batch,)))
        self.max_batch = min(int(max_batch), int(cap))
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue(maxsize=max_queue)
        # _pending is mutated only by the dispatcher thread, but stats()
        # iterates it from caller threads — every mutation and the stats
        # read hold _lock (mutations are tiny: list append / dict del).
        self._pending: Dict[tuple, List[_Request]] = {}
        self._lock = threading.Lock()
        # serializes the submit-time stopped-check+enqueue against stop()
        # setting _stopped: any request enqueued under this lock is in _q
        # before _stopped is set, so the dispatcher's exit drain sees it
        # (otherwise a late submit's Future would never resolve).
        self._submit_lock = threading.Lock()
        self._stats = ServerStats()
        self._lat_ms: List[float] = []  # ring buffer of recent latencies
        self._stopped = threading.Event()
        # pipeline_depth > 0: dispatch batch N+1 while a finalizer thread
        # runs batch N's result fetch. MEASURED SLOWER over the serialized
        # axon tunnel (39 -> 23 req/s at depth 2: the finalize's
        # data-dependent feature-slice op queues BEHIND the next batch's
        # forward — head-of-line blocking), so the default is 0
        # (synchronous). On real TPU hosts with independent DMA streams the
        # overlap is genuine; enable there and measure.
        self.pipeline_depth = int(pipeline_depth)
        self._fq: "queue.Queue" = queue.Queue(
            maxsize=max(1, self.pipeline_depth))
        self._finalizer = None
        if self.pipeline_depth > 0:
            self._finalizer = threading.Thread(
                target=self._finalize_loop, name="sylber-serve-finalize",
                daemon=True)
            self._finalizer.start()
        self._thread = threading.Thread(
            target=self._run, name="sylber-serve", daemon=True
        )
        self._thread.start()

    # ---- client surface -------------------------------------------------

    def submit(
        self,
        wav: np.ndarray,
        in_second: bool = True,
        norm_threshold: Optional[float] = None,
        merge_threshold: Optional[float] = None,
        return_hidden: bool = False,
    ) -> Future:
        """Enqueue one utterance; returns a Future resolving to the
        Segmenter output dict. ``return_hidden`` defaults to False for
        serving (hidden states are ~0.4 MB/s of audio of D2H traffic)."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        if wav.size < 400:  # below one receptive field -> zero frames
            raise ValueError(
                f"utterance too short: {wav.size} samples < 400 (25 ms)")
        fut: Future = Future()
        key = (norm_threshold, merge_threshold, bool(in_second),
               bool(return_hidden))
        with self._submit_lock:
            if self._stopped.is_set():
                raise RuntimeError("SegmenterServer is stopped")
            self._q.put(_Request(wav, fut, key, time.monotonic()))
        with self._lock:
            self._stats.requests += 1
        return fut

    def segment(self, wav: np.ndarray, **kw) -> Dict[str, Any]:
        """Blocking convenience wrapper: submit + wait."""
        return self.submit(wav, **kw).result()

    def submit_many(self, wavs: Sequence[np.ndarray], **kw) -> List[Future]:
        return [self.submit(w, **kw) for w in wavs]

    def warmup(
        self,
        lengths_s: Sequence[float] = (2.0, 4.0, 8.0),
        batch_sizes: Optional[Sequence[int]] = None,
    ) -> None:
        """Pre-compile the (batch, length) bucket programs used in serving.

        TPU compiles are expensive (30-250 s each over the axon tunnel);
        production servers should warm the cache before accepting traffic.
        """
        bbs = batch_sizes or [b for b in self.segmenter.batch_buckets
                              if b <= self.max_batch]
        for sec in lengths_s:
            n = int(sec * 16000)
            wav = np.zeros(n, np.float32)
            wav[:: 160] = 1.0  # non-degenerate input
            for b in bbs:
                self.segmenter.process([wav] * b, return_hidden=False)

    def stats(self) -> ServerStats:
        with self._lock:
            s = ServerStats(**{k: getattr(self._stats, k)
                               for k in self._stats.__dataclass_fields__})
            s.queue_depth = self._q.qsize() + sum(
                len(v) for v in self._pending.values())
            lat = sorted(self._lat_ms)
            if lat:
                s.latency_p50_ms = lat[len(lat) // 2]
                s.latency_p95_ms = lat[min(len(lat) - 1,
                                           int(len(lat) * 0.95))]
                s.latency_mean_ms = sum(lat) / len(lat)
            return s

    def stop(self, drain: bool = True, timeout: float = 60.0) -> None:
        """Stop the dispatcher. ``drain=True`` serves queued requests first;
        ``drain=False`` cancels anything not yet dispatched."""
        with self._submit_lock:
            if self._stopped.is_set():
                return
            self._stopped.set()
        self._drain_on_stop = drain
        self._q.put(None)  # wake the dispatcher
        self._thread.join(timeout=timeout)
        if self._finalizer is not None:
            # the dispatcher enqueues the finalizer sentinel itself as its
            # last act (_run), so a timed-out join above cannot let the
            # sentinel overtake still-to-be-enqueued batches (which would
            # kill the finalizer early and deadlock the dispatcher on the
            # bounded queue)
            self._finalizer.join(timeout=timeout)

    def __enter__(self) -> "SegmenterServer":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # ---- dispatcher -----------------------------------------------------

    def _take(self, block: bool, deadline: Optional[float]) -> bool:
        """Move one queue item into the pending map. Returns False on
        sentinel/timeout."""
        try:
            if block:
                timeout = None if deadline is None else max(
                    0.0, deadline - time.monotonic())
                req = self._q.get(timeout=timeout) if deadline is not None \
                    else self._q.get()
            else:
                req = self._q.get_nowait()
        except queue.Empty:
            return False
        if req is None:
            return False
        with self._lock:
            self._pending.setdefault(req.key, []).append(req)
        return True

    def _next_batch(self) -> Optional[List[_Request]]:
        """Pick the fullest compatible group; take up to max_batch requests,
        longest first (so one program covers them with minimal padding)."""
        with self._lock:
            if not self._pending:
                return None
            key = max(self._pending, key=lambda k: len(self._pending[k]))
            group = self._pending[key]
            group.sort(key=lambda r: len(r.wav), reverse=True)
            batch, rest = group[: self.max_batch], group[self.max_batch:]
            if rest:
                self._pending[key] = rest
            else:
                del self._pending[key]
            return batch

    def _run(self) -> None:
        while True:
            if not self._pending:
                # idle: block for the first request of the next batch
                got = self._take(block=True, deadline=None)
                if not got and self._stopped.is_set():
                    break
                if not got:
                    continue
            # batch-fill window: gather until max_batch or deadline
            deadline = time.monotonic() + self.max_wait_s
            while sum(len(v) for v in self._pending.values()) < self.max_batch:
                if not self._take(block=True, deadline=deadline):
                    break
            batch = self._next_batch()
            if batch:
                self._dispatch(batch)
            if self._stopped.is_set() and self._q.qsize() == 0 \
                    and not self._pending:
                break
        # stopped: resolve anything left
        with self._lock:
            leftover = [r for g in self._pending.values() for r in g]
            self._pending.clear()
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                leftover.append(req)
        if leftover and getattr(self, "_drain_on_stop", True):
            for i in range(0, len(leftover), self.max_batch):
                self._dispatch(leftover[i: i + self.max_batch])
        else:
            for r in leftover:
                r.future.cancel()
        if self._finalizer is not None:
            # last act of the dispatcher: every batch is now enqueued, so
            # the sentinel cannot overtake work (see stop())
            self._fq.put(None)

    def _dispatch(self, batch: List[_Request]) -> None:
        """Upload + launch the program, then hand the (batch, finalize)
        pair to the finalizer thread (pipeline mode) or finalize inline
        (default). In pipeline mode up to pipeline_depth batches queue
        behind the one being finalized — each pins its device output
        buffers, so depth bounds HBM held by in-flight results."""
        nt, mt, in_second, return_hidden = batch[0].key
        kw = dict(in_second=in_second, norm_threshold=nt,
                  merge_threshold=mt, return_hidden=return_hidden)
        wavs = [r.wav for r in batch]
        try:
            if hasattr(self.segmenter, "process_async"):
                finalize = self.segmenter.process_async(wavs, **kw)
            else:  # plain .process segmenters (e.g. test fakes) run
                # entirely on the finalizer thread; dispatch order and
                # batch composition are decided here either way
                finalize = (lambda s=self.segmenter, w=wavs, k=kw:
                            s.process(w, **k))
        except Exception as e:  # fail this batch only; keep serving
            self._fail(batch, e)
            return
        if self._finalizer is None:
            self._complete(batch, finalize)
        else:
            self._fq.put((batch, finalize))

    def _fail(self, batch: List[_Request], e: Exception) -> None:
        with self._lock:
            self._stats.failed += len(batch)
        for r in batch:
            if not r.future.cancelled():
                r.future.set_exception(e)

    def _finalize_loop(self) -> None:
        while True:
            item = self._fq.get()
            if item is None:
                break
            self._complete(*item)

    def _complete(self, batch: List[_Request], finalize) -> None:
        try:
            outs = finalize()
        except Exception as e:
            self._fail(batch, e)
            return
        now = time.monotonic()
        with self._lock:
            self._stats.batches += 1
            self._stats.batched_items += len(batch)
            self._stats.completed += len(batch)
            for r in batch:
                self._lat_ms.append((now - r.t_enqueue) * 1e3)
            if len(self._lat_ms) > 2048:
                self._lat_ms = self._lat_ms[-1024:]
        for r, out in zip(batch, outs):
            if not r.future.cancelled():
                r.future.set_result(out)
