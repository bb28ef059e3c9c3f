"""Minimal HTTP serving frontend over SegmenterServer (stdlib only).

POST /segment     body: raw little-endian int16 or float32 PCM @ 16 kHz
                  (Content-Type: audio/l16 or application/octet-stream;
                  X-Dtype: int16|float32, default int16)
                  optional query params: norm_threshold, merge_threshold
                  (floats; SegmenterServer groups same-threshold requests
                  into one device batch), in_second=0|1 (default 1:
                  segment boundaries in seconds, reference contract)
                  -> JSON {segments: [[s,e],...], segment_features: [[...]],
                           num_segments: K}
GET  /stats       -> JSON serving counters
GET  /healthz     -> 200 once warmed

This is a deployment shim, not a batch client: throughput comes from many
concurrent connections coalescing in the micro-batcher (ThreadingHTTPServer
gives one thread per connection; the device is driven by the single
dispatcher thread in sylber_tpu.serve).

Usage:
  python scripts/serve_http.py --ckpt /path/to/sylber.ckpt --port 8787 \
      [--max-batch 32] [--max-wait-ms 10] [--bf16]
"""

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sylber_tpu.utils.platform import (  # noqa: E402
    apply_jax_platform, enable_compilation_cache)

apply_jax_platform()
enable_compilation_cache()  # restarts skip the 30-250 s TPU compiles

import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 fast mode (default: fp32 parity mode)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic W8A8 int8 encoder matmuls (implies bf16 "
                        "elsewhere). Measured neutral-vs-bf16 on v5e at "
                        "768-d (0.94-1.0x, boundary-F1 >= 0.992 vs exact); "
                        "kept for wider models where MXU time dominates")
    p.add_argument("--encoding-layer", type=int, default=9,
                   help="encoder depth (reference Segmenter arg)")
    p.add_argument("--no-warmup", action="store_true")
    args = p.parse_args()

    import jax.numpy as jnp

    from sylber_tpu.api import Segmenter
    from sylber_tpu.models.hubert import HubertConfig
    from sylber_tpu.serve import SegmenterServer

    if args.bf16 or args.int8:  # fast serving: bf16 encoder + frontend
        cfg = HubertConfig(num_hidden_layers=args.encoding_layer,
                           dtype=jnp.bfloat16, precision="default",
                           frontend_dtype=jnp.bfloat16,
                           int8_encoder=args.int8)
    else:  # fp32 parity mode
        cfg = HubertConfig(num_hidden_layers=args.encoding_layer)
    seg = Segmenter(model_ckpt=args.ckpt, hubert_config=cfg,
                    encoding_layer=args.encoding_layer)
    server = SegmenterServer(seg, max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms)
    if not args.no_warmup:
        print("warming bucket programs ...", flush=True)
        server.warmup()
    print(f"serving on http://{args.host}:{args.port}", flush=True)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                s = server.stats()
                self._json(200, {
                    k: getattr(s, k) for k in s.__dataclass_fields__
                } | {"mean_batch_size": s.mean_batch_size})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path != "/segment":
                self._json(404, {"error": "not found"})
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            dtype = self.headers.get("X-Dtype", "int16")
            try:
                q = parse_qs(url.query)
                kw = {}
                for name in ("norm_threshold", "merge_threshold"):
                    if name in q:
                        kw[name] = float(q[name][0])
                if "in_second" in q:
                    kw["in_second"] = q["in_second"][0] not in ("0", "false")
                if dtype == "float32":
                    wav = np.frombuffer(raw, "<f4").astype(np.float32)
                else:
                    wav = np.frombuffer(raw, "<i2").astype(np.float32)
                    wav /= 32768.0
                out = server.segment(wav, **kw)
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            self._json(200, {
                "segments": np.asarray(out["segments"]).tolist(),
                "segment_features":
                    np.asarray(out["segment_features"]).tolist(),
                "num_segments": int(len(out["segments"])),
            })

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
