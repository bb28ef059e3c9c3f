"""HTTP serving frontend over the sylber_tpu inference stack (stdlib only).

POST /segment     body: raw little-endian int16 or float32 PCM @ 16 kHz
                  (Content-Type: audio/l16 or application/octet-stream;
                  X-Dtype: int16|float32, default int16)
                  optional query params: norm_threshold, merge_threshold
                  (floats; SegmenterServer groups same-threshold requests
                  into one device batch), in_second=0|1 (default 1:
                  segment boundaries in seconds, reference contract)
                  -> JSON {segments: [[s,e],...], segment_features: [[...]],
                           num_segments: K}
POST /tokenize    same body; requires --centroids. Segments through the
                  micro-batcher, then nearest-centroid token ids
                  -> JSON {tokens: [...], segments, durations, num_segments}
POST /resynthesize  same body; requires --synthesis-ckpt (or mini fixture).
                  query params: steps (ODE steps, default 5), audio=0|1.
                  audio=0 -> JSON {art: [[14-dim], ...]} articulatory
                  trajectory (12 EMA + log-pitch + loudness);
                  audio=1 -> audio/wav bytes through the in-framework
                  vocoder (requires --vocoder-ckpt or the mini fixture).
GET  /stats       -> JSON serving counters
GET  /healthz     -> 200 once warmed

This is a deployment shim, not a batch client: /segment and /tokenize
throughput comes from many concurrent connections coalescing in the
micro-batcher (ThreadingHTTPServer gives one thread per connection; the
device is driven by the single dispatcher thread in sylber_tpu.serve).
/resynthesize runs the flow-matching sampler outside the micro-batcher and
is serialized by a lock — it is the low-QPS luxury path, matching the
reference where synthesis is a separate offline model
(`/root/reference/sylber/model/segment_synthesis.py:103`).

Usage:
  python scripts/serve_http.py --ckpt /path/to/sylber.ckpt --port 8787 \
      [--max-batch 32] [--max-wait-ms 10] [--bf16] [--centroids km.npy] \
      [--synthesis-ckpt dir_or_torch.ckpt] [--vocoder-ckpt gen.ckpt]
"""

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sylber_tpu.utils.platform import (  # noqa: E402
    apply_jax_platform, enable_compilation_cache)

apply_jax_platform()
enable_compilation_cache()  # restarts skip the 30-250 s TPU compiles

import numpy as np  # noqa: E402


class _TooLarge(Exception):
    """Request body exceeds the configured limit (HTTP 413)."""


def wav_bytes(pcm: np.ndarray, sr: int = 16000) -> bytes:
    """float32 (-1,1) -> RIFF/WAV int16 bytes (stdlib; no scipy needed at
    serving time)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        # '<i2' bytes ARE the WAV payload; no per-sample Python packing
        w.writeframes(np.clip(pcm * 32767.0, -32768, 32767)
                      .astype("<i2").tobytes())
    return buf.getvalue()


def build_handler(server, quantizer=None, synth=None, vocoder=None,
                  spk_emb=None, pitch_mean: float = 120.0,
                  max_body_bytes: int = 8 << 20):
    """Handler class over a SegmenterServer plus optional tokenize /
    resynthesis stacks; factored out so tests drive it with tiny models.

    ``max_body_bytes`` (default 8 MiB ≈ 4.4 min of int16 PCM) rejects
    oversized POSTs with 413 BEFORE reading the body — one request can
    otherwise allocate an arbitrary host buffer and push an arbitrarily long
    utterance into the batcher (compile storm on a fresh length bucket).
    Long recordings belong to the longform API, not the serving shim."""
    synth_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self._responded = True
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._responded = False
            try:
                if self.path == "/healthz":
                    self._json(200, {"ok": True})
                elif self.path == "/stats":
                    s = server.stats()
                    self._json(200, {
                        k: getattr(s, k) for k in s.__dataclass_fields__
                    } | {"mean_batch_size": s.mean_batch_size})
                else:
                    self._json(404, {"error": "not found"})
            except (BrokenPipeError, ConnectionError):
                pass
            except Exception as e:  # same per-request isolation as do_POST
                if self._responded:
                    self.close_connection = True
                    return
                self._json(500, {"error": str(e)})

        def _read_wav(self) -> np.ndarray:
            n = int(self.headers.get("Content-Length", 0))
            if n > max_body_bytes:
                raise _TooLarge(
                    f"body {n} bytes > limit {max_body_bytes}; use the "
                    "longform API for long recordings")
            raw = self.rfile.read(n)
            if self.headers.get("X-Dtype", "int16") == "float32":
                return np.frombuffer(raw, "<f4").astype(np.float32)
            return np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            q = parse_qs(url.query)
            self._responded = False
            try:
                if url.path == "/segment":
                    self._segment(q)
                elif url.path == "/tokenize":
                    self._tokenize(q)
                elif url.path == "/resynthesize":
                    self._resynthesize(q)
                else:
                    self._json(404, {"error": "not found"})
            except (BrokenPipeError, ConnectionError):
                pass  # client went away; nothing sane to send
            except Exception as e:  # per-request isolation
                if self._responded:
                    # headers/body already on the wire — a second status
                    # line would corrupt the stream; drop the connection
                    self.close_connection = True
                    return
                if isinstance(e, _TooLarge):
                    code = 413
                elif isinstance(e, (ValueError, KeyError)):
                    code = 400
                else:
                    code = 500
                self._json(code, {"error": str(e)})
                if isinstance(e, _TooLarge):
                    # the unread body is still on the socket; don't let
                    # the server try to parse it as the next request
                    self.close_connection = True

        def _segment_kw(self, q):
            kw = {}
            for name in ("norm_threshold", "merge_threshold"):
                if name in q:
                    kw[name] = float(q[name][0])
            if "in_second" in q:
                kw["in_second"] = q["in_second"][0] not in ("0", "false")
            return kw

        def _segment(self, q):
            out = server.segment(self._read_wav(), **self._segment_kw(q))
            self._json(200, {
                "segments": np.asarray(out["segments"]).tolist(),
                "segment_features":
                    np.asarray(out["segment_features"]).tolist(),
                "num_segments": int(len(out["segments"])),
            })

        def _tokenize(self, q):
            if quantizer is None:
                self._json(503, {"error": "no --centroids configured"})
                return
            import jax.numpy as jnp

            out = server.segment(self._read_wav(), **self._segment_kw(q))
            feats = np.asarray(out["segment_features"])
            if len(feats):
                # pad the segment count to a power-of-two bucket: every
                # distinct K would otherwise compile a fresh argmin program
                # on the request path (seconds-to-minutes over the tunnel)
                k = len(feats)
                kpad = max(8, 1 << (k - 1).bit_length())
                fp = np.zeros((kpad, feats.shape[1]), feats.dtype)
                fp[:k] = feats
                tokens = np.asarray(
                    quantizer.get_indices(jnp.asarray(fp)))[:k]
            else:
                tokens = np.zeros((0,), np.int32)
            segs = np.asarray(out["segments"])
            in_second = self._segment_kw(q).get("in_second", True)
            scale = 50.0 if in_second else 1.0
            durs = ((segs[:, 1] - segs[:, 0]) * scale).round().astype(int) \
                if len(segs) else np.zeros((0,), int)
            self._json(200, {
                "tokens": tokens.reshape(len(feats), -1).tolist()
                if tokens.ndim > 1 else tokens.tolist(),
                "segments": segs.tolist(),
                "durations": durs.tolist(),
                "num_segments": int(len(segs)),
            })

        def _resynthesize(self, q):
            if synth is None:
                self._json(503, {"error": "no --synthesis-ckpt configured"})
                return
            steps = int(q.get("steps", ["5"])[0])
            want_audio = q.get("audio", ["0"])[0] not in ("0", "false")
            if want_audio and vocoder is None:
                self._json(503, {"error": "no --vocoder-ckpt configured"})
                return
            wav = self._read_wav()
            with synth_lock:  # one sampler at a time on the device
                art, segs = synth.resynthesize(input_values=wav[None],
                                               steps=steps)
                if want_audio:
                    dim = getattr(getattr(vocoder, "config", None),
                                  "spk_emb_dim", 64)
                    spk = (np.zeros(dim, np.float32)
                           if spk_emb is None else spk_emb)
                    out = synth.decode_audio(art, spk,
                                             pitch_mean=pitch_mean,
                                             vocoder=vocoder)[0]
            if want_audio:
                body = wav_bytes(np.asarray(out))
                self._responded = True
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(200, {
                    "art": np.asarray(art[0]).tolist(),
                    "segments": (np.asarray(segs[0]).tolist()
                                 if segs is not None else None),
                })

    return Handler


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
    p.add_argument("--centroids", default=None,
                   help="k-means centroid .npy -> enables POST /tokenize")
    p.add_argument("--residual-centroids", default=None)
    p.add_argument("--synthesis-ckpt", default=None,
                   help="SegmentSynthesis checkpoint (Orbax dir or torch) "
                        "-> enables POST /resynthesize")
    p.add_argument("--synthesis-config",
                   default=str(Path(__file__).resolve().parent.parent
                               / "configs" / "sylber_resynthesis.yaml"))
    p.add_argument("--vocoder-ckpt", default=None,
                   help="HiFi-GAN generator torch ckpt -> enables "
                        "/resynthesize?audio=1")
    p.add_argument("--spk-emb", default=None, help=".npy speaker embedding")
    p.add_argument("--pitch-mean", type=float, default=120.0)
    p.add_argument("--max-body-bytes", type=int, default=8 << 20,
                   help="reject larger POST bodies with 413 (default 8 MiB "
                        "~ 4.4 min int16 PCM); longform recordings belong "
                        "to sylber_tpu.longform, not the serving shim")
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

    quantizer = None
    if args.centroids:
        from sylber_tpu.flow.quantizer import (KMQuantizer,
                                               ResidualKMQuantizer)

        quantizer = (ResidualKMQuantizer(args.centroids,
                                         args.residual_centroids)
                     if args.residual_centroids
                     else KMQuantizer(args.centroids))

    synth = vocoder = None
    if args.synthesis_ckpt:
        import yaml

        from sylber_tpu.synthesis import SegmentSynthesis

        scfg = yaml.safe_load(open(args.synthesis_config))
        synth = SegmentSynthesis(model_ckpt=args.synthesis_ckpt,
                                 quantizer=quantizer, **scfg)
        if args.vocoder_ckpt:
            from sylber_tpu.io.torch_convert import (
                hifigan_params_from_torch, torch_load)
            from sylber_tpu.vocoder import SparcDecoder
            from sylber_tpu.vocoder.sparc import SparcDecoderConfig

            sd = torch_load(args.vocoder_ckpt)
            if isinstance(sd, dict) and "generator" in sd:
                sd = sd["generator"]
            dcfg = SparcDecoderConfig()
            vocoder = SparcDecoder(dcfg, params=hifigan_params_from_torch(
                sd, dcfg.generator))

    spk = (np.load(args.spk_emb).astype(np.float32)
           if args.spk_emb else None)

    if not args.no_warmup:
        print("warming bucket programs ...", flush=True)
        server.warmup()
    print(f"serving on http://{args.host}:{args.port}", flush=True)

    handler = build_handler(server, quantizer=quantizer, synth=synth,
                            vocoder=vocoder, spk_emb=spk,
                            pitch_mean=args.pitch_mean,
                            max_body_bytes=args.max_body_bytes)
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
