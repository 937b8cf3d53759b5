"""Server integration test (tools/server/tests analog): spawn the engine +
HTTP server on a tiny model in-process and exercise the REST API."""

import http.client
import json
import threading
import time

import pytest

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.models.vocab import Vocab
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.serving.engine import Engine, GenRequest
from rrs_tpu.serving.server import ServerState, make_handler
from rrs_tpu.runtime.sampler import SamplerParams


def _tiny_vocab(n=512):
    # degenerate char-level gpt2 vocab: token i = printable char or <i>
    toks = []
    for i in range(n):
        toks.append(chr(33 + i) if 33 + i < 0x2FF else f"<tok{i}>")
    return Vocab(
        model="gpt2", tokens=toks, scores=None,
        token_types=[1] * n, merges=[], pre="gpt-2",
        bos_id=0, eos_id=1, add_bos=False,
    )


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=128)
    engine = Engine(ctx)
    engine.start()
    vocab = _tiny_vocab(cfg.vocab_size)
    state = ServerState(cfg, vocab, engine, {}, "tiny-test")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port, engine
    httpd.shutdown()
    engine.stop()


def _req(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(method, path, json.dumps(body) if body else None,
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_health_props_models(server):
    port, _ = server
    status, data = _req(port, "GET", "/health")
    assert status == 200 and json.loads(data)["status"] == "ok"
    status, data = _req(port, "GET", "/props")
    assert json.loads(data)["total_slots"] == 2
    status, data = _req(port, "GET", "/v1/models")
    assert json.loads(data)["data"][0]["id"] == "tiny-test"


def test_completion_nonstream(server):
    port, _ = server
    status, data = _req(port, "POST", "/v1/completions", {
        "prompt": [5, 6, 7], "max_tokens": 4, "temperature": 0.0,
    })
    assert status == 200, data
    body = json.loads(data)
    assert body["choices"][0]["finish_reason"] in ("stop", "length")
    assert isinstance(body["choices"][0]["text"], str)


def test_chat_completion(server):
    port, _ = server
    status, data = _req(port, "POST", "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 3, "temperature": 0.0,
    })
    assert status == 200, data
    body = json.loads(data)
    assert body["choices"][0]["message"]["role"] == "assistant"


def test_parallel_requests_and_metrics(server):
    port, engine = server
    results = []

    def go(seed):
        s, d = _req(port, "POST", "/v1/completions", {
            "prompt": [seed, seed + 1], "max_tokens": 4, "temperature": 0.0,
        })
        results.append((s, json.loads(d)))

    threads = [threading.Thread(target=go, args=(i + 3,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3 and all(s == 200 for s, _ in results)

    status, data = _req(port, "GET", "/metrics")
    assert b"llamacpp:requests_total" in data


def test_tokenize_roundtrip(server):
    port, _ = server
    status, data = _req(port, "POST", "/tokenize", {"content": "AB"})
    ids = json.loads(data)["tokens"]
    status, data = _req(port, "POST", "/detokenize", {"tokens": ids})
    assert json.loads(data)["content"] == "AB"


def test_embeddings_endpoint(server):
    port, _ = server
    status, data = _req(port, "POST", "/v1/embeddings", {"input": "AB"})
    assert status == 200, data
    body = json.loads(data)
    v = body["data"][0]["embedding"]
    assert len(v) == PRESETS["tiny"].n_embd
    assert all(isinstance(x, float) for x in v[:4])
