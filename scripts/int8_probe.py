"""TPU A/B probe: int8 (W8A8 encoder) vs bf16 Segmenter inference.

Interleaved same-process measurement (tunnel RTT amortized by pipelined
dispatch, same discipline as bench.py): for each length bucket, dispatch N
batches per mode and drain. Reports per-bucket RTFx for bf16 vs int8 and,
when the trained full-width fixture is present, int8-vs-exact boundary F1.

Usage: python scripts/int8_probe.py            (REAL TPU, one client only)
Env: SYLBER_PROBE_BATCHES (default 16), SYLBER_PROBE_BS (32).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sylber_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.utils.metrics import boundary_f1

    nb = int(os.environ.get("SYLBER_PROBE_BATCHES", 16))
    bs = int(os.environ.get("SYLBER_PROBE_BS", 32))

    # trained fixture if available -> honest segmentation workload + F1 gate
    gate_ckpt = os.environ.get("SYLBER_BENCH_GATE_CKPT",
                               "runs/full_proof/full_ckpt.npz")
    params, norm_thr, merge_thr = None, 2.6, 0.8
    if os.path.exists(gate_ckpt):
        from sylber_tpu.io.checkpoint import load_params_npz

        params = load_params_npz(gate_ckpt)
        meta = Path(gate_ckpt).with_suffix(".json")
        if meta.exists():
            m = json.loads(meta.read_text())
            norm_thr = float(m.get("norm_threshold", norm_thr))
            merge_thr = float(m.get("merge_threshold", merge_thr))
        print(f"using trained fixture {gate_ckpt}", file=sys.stderr)

    def make(dtype, precision, fdt, int8):
        cfg = HubertConfig(dtype=dtype, precision=precision,
                           frontend_dtype=fdt, int8_encoder=int8)
        return Segmenter(hubert_config=cfg, length_bucket_s=4.0,
                         params=params)

    seg_bf16 = make(jnp.bfloat16, "default", jnp.bfloat16, False)
    seg_int8 = make(jnp.bfloat16, "default", jnp.bfloat16, True)

    from sylber_tpu.data.synthetic import synth_utterance

    rng = np.random.RandomState(0)
    pool = []
    for _ in range(24):
        wav, _ = synth_utterance(rng, 8 * 16000)
        pool.append(np.clip(wav * 24000, -32768, 32767).astype(np.int16))

    def batches_for(sec):
        L = int(sec * 16000)
        out = []
        for i in range(nb):
            wav = np.zeros((bs, L), np.int16)
            mask = np.ones((bs, L), np.int32)
            for j in range(bs):
                src = pool[(i * bs + j) % len(pool)]
                reps = int(np.ceil(L / len(src)))
                wav[j] = np.tile(src, reps)[:L]
            out.append((jnp.asarray(wav), jnp.asarray(mask)))
        return out

    def run(s, wav, mask):
        _, res = s._forward_segment(s.params, wav, mask,
                                    jnp.float32(norm_thr),
                                    jnp.float32(merge_thr))
        return res.segments, res.num_segments

    def timed(s, bb):
        _ = np.asarray(run(s, *bb[0])[1])  # compile + warm
        t0 = time.perf_counter()
        outs = [run(s, w, m)[1] for w, m in bb]
        for r in outs:
            _ = np.asarray(r)
        return time.perf_counter() - t0

    import jax

    report = {"device": jax.devices()[0].device_kind, "bs": bs,
              "batches": nb}
    for sec in (4.0, 8.0, 16.0):
        bb = batches_for(sec)
        audio_s = nb * bs * sec
        # interleave modes to share tunnel state
        t_bf16 = timed(seg_bf16, bb)
        t_int8 = timed(seg_int8, bb)
        t_bf16 = min(t_bf16, timed(seg_bf16, bb))
        t_int8 = min(t_int8, timed(seg_int8, bb))
        report[f"rtfx_bf16_{int(sec)}s"] = round(audio_s / t_bf16, 1)
        report[f"rtfx_int8_{int(sec)}s"] = round(audio_s / t_int8, 1)
        report[f"speedup_{int(sec)}s"] = round(t_bf16 / t_int8, 3)
        print(json.dumps({k: report[k] for k in report
                          if k.endswith(f"_{int(sec)}s")}), file=sys.stderr)

    # decision-agreement gate vs the exact fp32 program (one batch/bucket)
    if params is not None:
        seg32 = make(jnp.float32, "highest", jnp.float32, False)
        f1s = {}
        for sec in (4.0, 8.0, 16.0):
            w, m = batches_for(sec)[0]
            sq, nq = (np.asarray(x) for x in run(seg_int8, w, m))
            se, ne = (np.asarray(x) for x in run(seg32, w, m))
            f1 = [boundary_f1(sq[j, : nq[j]], se[j, : ne[j]], tol_frames=0)
                  for j in range(bs)]
            f1s[f"{int(sec)}s"] = round(float(np.mean(f1)), 5)
        report["int8_vs_exact_boundary_f1"] = f1s
        print(json.dumps({"int8_vs_exact_boundary_f1": f1s}),
              file=sys.stderr)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
