"""HTTP serving frontend (scripts/serve_http.py): full inference surface.

Drives a real ThreadingHTTPServer over tiny in-process models and asserts
the endpoint contracts: /segment (+ per-request thresholds / in_second),
/tokenize (nearest-centroid ids over the micro-batched segmenter),
/resynthesize (articulatory JSON and audio/wav bytes through the vocoder),
/stats, /healthz, and error isolation (bad body, missing stacks -> 4xx/503,
server stays up).
"""

import importlib.util
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

from sylber_tpu.api import Segmenter
from sylber_tpu.models.hubert import HubertConfig
from sylber_tpu.serve import SegmenterServer

_spec = importlib.util.spec_from_file_location(
    "serve_http", Path(__file__).resolve().parents[2]
    / "scripts" / "serve_http.py")
serve_http = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(serve_http)


def _tiny_hubert_cfg():
    return HubertConfig(num_hidden_layers=1, hidden_size=32,
                        num_attention_heads=4, intermediate_size=64,
                        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=4, precision="default")


def _tiny_synth():
    from sylber_tpu.models.voicebox import RegressorConfig
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisConfig

    cfg = SynthesisConfig(
        encoding_layer=1, hubert=_tiny_hubert_cfg(),
        regressor=RegressorConfig(dim=32, depth=1, dim_head=8, heads=4,
                                  dim_in_proj=8, dim_cond_emb=16,
                                  num_register_tokens=4,
                                  conv_pos_embed_kernel_size=5),
        input_output_dim=16, input_hidden_dims=(32,))
    return SegmentSynthesis(config=cfg)


def _tiny_vocoder():
    from sylber_tpu.vocoder.hifigan import HiFiGANConfig
    from sylber_tpu.vocoder.sparc import SparcDecoder, SparcDecoderConfig

    return SparcDecoder(SparcDecoderConfig(
        spk_emb_dim=8,
        generator=HiFiGANConfig(
            in_channels=14, cond_channels=8, upsample_initial_channel=32,
            upsample_rates=(5, 4, 4, 2, 2),
            upsample_kernel_sizes=(11, 8, 8, 4, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),))))


@pytest.fixture(scope="module")
def http_server():
    from sylber_tpu.flow.quantizer import KMQuantizer

    seg = Segmenter(hubert_config=_tiny_hubert_cfg(), norm_threshold=0.5,
                    merge_threshold=0.9)
    server = SegmenterServer(seg, max_batch=4, max_wait_ms=5.0)
    centroids = np.random.RandomState(0).randn(7, 32).astype(np.float32)
    handler = serve_http.build_handler(
        server, quantizer=KMQuantizer(centroids), synth=_tiny_synth(),
        vocoder=_tiny_vocoder())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    server.stop()


def _wav(seconds=1.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(16000 * seconds)) / 16000.0
    return (np.sin(2 * np.pi * 170 * t) * 0.4
            + 0.01 * rng.randn(len(t))).astype(np.float32)


def _post(base, path, body, headers=None, timeout=600):
    req = urllib.request.Request(
        base + path, data=body,
        headers={"X-Dtype": "float32", **(headers or {})})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.headers.get("Content-Type"), r.read()


def test_segment_endpoint_with_thresholds(http_server):
    ct, raw = _post(http_server,
                    "/segment?norm_threshold=0.2&merge_threshold=0.95"
                    "&in_second=0", _wav().tobytes())
    out = json.loads(raw)
    assert ct == "application/json"
    assert out["num_segments"] == len(out["segments"]) > 0
    ct, raw2 = _post(http_server,
                     "/segment?norm_threshold=0.2&merge_threshold=0.95",
                     _wav().tobytes())
    sec = json.loads(raw2)
    assert sec["num_segments"] == out["num_segments"]
    np.testing.assert_allclose(np.asarray(sec["segments"]) * 50.0,
                               np.asarray(out["segments"]), atol=1e-6)


def test_int16_body(http_server):
    pcm = np.clip(_wav() * 32767, -32768, 32767).astype("<i2")
    _, raw = _post(http_server, "/segment?norm_threshold=0.2", pcm.tobytes(),
                   headers={"X-Dtype": "int16"})
    assert json.loads(raw)["num_segments"] > 0


def test_tokenize_endpoint(http_server):
    _, raw = _post(http_server, "/tokenize?norm_threshold=0.2",
                   _wav().tobytes())
    out = json.loads(raw)
    assert out["num_segments"] == len(out["tokens"]) == len(out["durations"])
    assert all(0 <= t < 7 for t in np.asarray(out["tokens"]).reshape(-1))
    assert all(d > 0 for d in out["durations"])


def test_resynthesize_endpoint_json_and_wav(http_server):
    _, raw = _post(http_server, "/resynthesize?steps=2",
                   _wav(0.5).tobytes())
    out = json.loads(raw)
    art = np.asarray(out["art"])
    assert art.ndim == 2 and art.shape[1] == 14
    assert np.isfinite(art).all()

    ct, body = _post(http_server, "/resynthesize?steps=2&audio=1",
                     _wav(0.5).tobytes())
    assert ct == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    # 50 Hz frames -> 16 kHz samples: payload is 2 bytes/sample
    import wave
    import io

    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 16000
        assert w.getnframes() == art.shape[0] * 320


def test_errors_do_not_kill_server(http_server):
    # too-short utterance -> 400 from SegmenterServer validation
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server, "/segment", np.zeros(10, "<f4").tobytes())
    assert e.value.code == 400
    # unknown route -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server, "/nope", b"")
    assert e.value.code == 404
    # server still alive
    with urllib.request.urlopen(http_server + "/healthz", timeout=60) as r:
        assert json.loads(r.read())["ok"]
    with urllib.request.urlopen(http_server + "/stats", timeout=60) as r:
        assert json.loads(r.read())["requests"] > 0


def test_missing_stacks_return_503():
    seg = Segmenter(hubert_config=_tiny_hubert_cfg())
    server = SegmenterServer(seg, max_batch=2, max_wait_ms=5.0)
    handler = serve_http.build_handler(server)  # no quantizer/synth
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        for path in ("/tokenize", "/resynthesize"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(base, path, _wav().tobytes())
            assert e.value.code == 503
    finally:
        httpd.shutdown()
        server.stop()
