"""Real-TPU serving probe: SegmenterServer latency/throughput under load.

Spins the production micro-batcher on the real chip (trained fixture when
present), drives it from N concurrent client threads with a realistic
length mix, and reports p50/p95/p99 end-to-end latency (incl. queueing +
tunnel RTT), sustained throughput (x real-time), and the batcher's
coalescing stats. This is the serving-side complement to bench.py's
offline-batch RTFx.

Usage: python scripts/serving_probe.py     (REAL TPU; one client at a time)
Env: SYLBER_SERVE_CLIENTS (default 16), SYLBER_SERVE_REQS (default 256),
     SYLBER_SERVE_MAX_WAIT_MS (default 10).
"""

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sylber_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.serve import SegmenterServer

    n_clients = int(os.environ.get("SYLBER_SERVE_CLIENTS", 16))
    n_reqs = int(os.environ.get("SYLBER_SERVE_REQS", 256))
    max_wait = float(os.environ.get("SYLBER_SERVE_MAX_WAIT_MS", 10))
    depth = int(os.environ.get("SYLBER_SERVE_PIPELINE", 0))

    gate_ckpt = os.environ.get("SYLBER_BENCH_GATE_CKPT",
                               "runs/full_proof/full_ckpt.npz")
    params, nt, mt = None, 2.6, 0.8
    if os.path.exists(gate_ckpt):
        from sylber_tpu.io.checkpoint import load_params_npz

        params = load_params_npz(gate_ckpt)
        meta = Path(gate_ckpt).with_suffix(".json")
        if meta.exists():
            m = json.loads(meta.read_text())
            nt, mt = m.get("norm_threshold", nt), m.get("merge_threshold", mt)
        print(f"using trained fixture {gate_ckpt}", file=sys.stderr)

    cfg = HubertConfig(dtype=jnp.bfloat16, precision="default",
                       frontend_dtype=jnp.bfloat16)
    seg = Segmenter(hubert_config=cfg, params=params, norm_threshold=nt,
                    merge_threshold=mt)
    server = SegmenterServer(seg, max_batch=32, max_wait_ms=max_wait,
                             pipeline_depth=depth)
    print("warming bucket programs ...", file=sys.stderr)
    server.warmup(lengths_s=(2.0, 4.0, 8.0))

    # realistic request mix: 1-8 s utterances, synthetic speech-like
    from sylber_tpu.data.synthetic import synth_utterance

    rng = np.random.RandomState(0)
    pool = []
    for _ in range(64):
        secs = float(rng.uniform(1.0, 8.0))
        wav, _ = synth_utterance(rng, int(secs * 16000))
        pool.append(wav.astype(np.float32))

    lat, lock = [], threading.Lock()
    audio_total = [0.0]
    reqs_per_client = max(1, round(n_reqs / n_clients))

    def client(cid: int, record: bool) -> None:
        r = np.random.RandomState(cid)
        for i in range(reqs_per_client):
            wav = pool[r.randint(len(pool))]
            t0 = time.perf_counter()
            out = server.segment(wav)
            dt = time.perf_counter() - t0
            assert "segments" in out
            if record:
                with lock:
                    lat.append(dt)
                    audio_total[0] += len(wav) / 16000.0

    def run_pass(record: bool) -> float:
        t_start = time.perf_counter()
        threads = [threading.Thread(target=client, args=(c, record))
                   for c in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.perf_counter() - t_start

    # pass 1 touches every (batch, length) bucket program this workload
    # uses — over the tunnel even persistent-cache HITS cost seconds per
    # program (executable deserialize + upload), which would otherwise
    # masquerade as steady-state serving latency
    cold = run_pass(record=False)
    print(f"cold pass: {cold:.1f}s (program loads)", file=sys.stderr)

    def report_pass(wall: float, label: str) -> dict:
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        s = server.stats()
        return {
            "mode": label,
            "device": jax.devices()[0].device_kind,
            "clients": n_clients,
            "requests": len(lat),
            "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 1),
            "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 1),
            "latency_ms_p99": round(float(np.percentile(lat_ms, 99)), 1),
            "throughput_rtfx": round(audio_total[0] / wall, 1),
            "requests_per_sec": round(len(lat) / wall, 1),
            "mean_batch_size": round(s.mean_batch_size, 2),
            "batches": s.batches,
        }

    spec_rate = float(os.environ.get("SYLBER_SERVE_SPECULATE", 0))
    if os.environ.get("SYLBER_SERVE_AB") == "1":
        # adjacent interleaved A/B of the speculative feature-prefix fetch
        # (serving deltas < 2x are tunnel noise unless measured adjacently)
        rate = spec_rate or 6.0
        results = []
        for rep in range(int(os.environ.get("SYLBER_SERVE_AB_REPS", 2))):
            for mode, val in (("off", None), (f"spec@{rate}/s", rate)):
                seg.speculative_tokens_per_s = val
                lat.clear()
                audio_total[0] = 0.0
                wall = run_pass(record=True)
                results.append(report_pass(wall, f"{mode} rep{rep}"))
                print(json.dumps(results[-1]), file=sys.stderr)
        server.stop()
        print(json.dumps(results, indent=1))
        return

    if spec_rate:
        seg.speculative_tokens_per_s = spec_rate
    wall = run_pass(record=True)
    server.stop()
    print(json.dumps(report_pass(
        wall, f"spec@{spec_rate}/s" if spec_rate else "off"), indent=2))


if __name__ == "__main__":
    main()
