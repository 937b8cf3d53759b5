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


_STATE_HOLDER: dict = {}


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
    _STATE_HOLDER["state"] = state
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


def test_logprobs_completion(server):
    port, _ = server
    status, data = _req(port, "POST", "/v1/completions", {
        "prompt": [5, 6, 7], "max_tokens": 3, "temperature": 0.0,
        "logprobs": 2,
    })
    assert status == 200, data
    lp = json.loads(data)["choices"][0]["logprobs"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) >= 1
    assert all(v <= 0.0 for v in lp["token_logprobs"])
    assert all(len(t) == 2 for t in lp["top_logprobs"])


def test_anthropic_messages(server):
    port, _ = server
    status, data = _req(port, "POST", "/v1/messages", {
        "messages": [{"role": "user", "content": "hi"}],
        "system": "be brief", "max_tokens": 3,
    })
    assert status == 200, data
    body = json.loads(data)
    assert body["type"] == "message" and body["role"] == "assistant"
    assert body["content"][0]["type"] == "text"
    assert body["stop_reason"] in ("end_turn", "max_tokens")
    assert body["usage"]["input_tokens"] > 0


def test_rerank(server):
    port, _ = server
    status, data = _req(port, "POST", "/v1/rerank", {
        "query": "abc", "documents": ["abc abc", "zzzz"], "top_n": 2,
    })
    assert status == 200, data
    body = json.loads(data)
    assert len(body["results"]) == 2
    scores = [r["relevance_score"] for r in body["results"]]
    assert scores == sorted(scores, reverse=True)


def test_infill_no_fim_tokens(server):
    port, _ = server
    status, data = _req(port, "POST", "/infill", {
        "input_prefix": "a", "input_suffix": "b", "max_tokens": 2,
    })
    assert status == 400          # tiny vocab has no FIM tokens


def test_slot_save_restore(server, tmp_path_factory):
    port, engine = server
    # produce a retained prompt cache on some slot
    _req(port, "POST", "/v1/completions",
         {"prompt": [9, 10, 11, 12], "max_tokens": 2, "temperature": 0.0})
    idx = next(i for i, s in enumerate(engine.slots) if s.retained_seq >= 0
               or s.cache_tokens)

    # endpoint is disabled until --slot-save-path is configured
    _STATE_HOLDER["state"].slot_save_path = None
    status, data = _req(port, "POST", f"/slots/{idx}?action=save",
                        {"filename": "s.rrsstate.npz"})
    assert status == 400 and b"slot-save-path" in data

    base = tmp_path_factory.mktemp("slots")
    _STATE_HOLDER["state"].slot_save_path = str(base)

    # path traversal / absolute paths are rejected
    for bad in ("../evil.npz", "/tmp/evil.npz", "a/b.npz", ".."):
        status, data = _req(port, "POST", f"/slots/{idx}?action=save",
                            {"filename": bad})
        assert status == 400, (bad, data)

    fn = "s.rrsstate.npz"
    status, data = _req(port, "POST", f"/slots/{idx}?action=save",
                        {"filename": fn})
    assert status == 200, data
    saved = json.loads(data)
    assert saved["n_saved"] > 0

    status, data = _req(port, "POST", f"/slots/{idx}?action=erase", {})
    assert status == 200 and json.loads(data)["success"]

    status, data = _req(port, "POST", f"/slots/{idx}?action=restore",
                        {"filename": fn})
    assert status == 200, data
    assert json.loads(data)["n_restored"] == saved["n_saved"]


def test_prompt_cache_reuse(server):
    port, engine = server
    prompt = [20, 21, 22, 23, 24, 25]
    _req(port, "POST", "/v1/completions",
         {"prompt": prompt, "max_tokens": 2, "temperature": 0.0})
    # same prefix again: engine should reuse the retained KV prefix
    _req(port, "POST", "/v1/completions",
         {"prompt": prompt + [26], "max_tokens": 2, "temperature": 0.0})
    assert any(s.n_reused > 0 for s in engine.slots)


def test_apply_template_endpoint(server):
    port, _ = server
    status, data = _req(port, "POST", "/apply-template", {
        "messages": [{"role": "user", "content": "hello"}]})
    assert status == 200
    assert "hello" in json.loads(data)["prompt"]


def test_multi_model_router(server, tmp_path_factory):
    """Router: second model registered as a ModelHandle, routed by the
    request's "model" field, load/unload endpoints work."""
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.export import export_random_gguf
    from rrs_tpu.serving.server import ModelHandle

    port, engine = server
    cfg2 = ModelConfig(
        arch="qwen3", n_layers=1, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=256, context_length=256,
        qk_norm=True)
    d = tmp_path_factory.mktemp("router")
    vocab = [chr(33 + i) if 33 + i < 288 else f"<t{i}>" for i in range(256)]
    p2 = export_random_gguf(cfg2, d / "second.gguf", seed=1,
                            vocab_tokens=vocab)
    # register on the running server's default state via the module fixture
    # (the live handler class isn't exposed)
    state = _STATE_HOLDER["state"]
    state.models["second"] = ModelHandle("second", str(p2), n_lanes=1,
                                         max_seq=128)

    status, data = _req(port, "GET", "/v1/models")
    ids = {m["id"]: m for m in json.loads(data)["data"]}
    assert "second" in ids and ids["second"]["loaded"] is False

    status, data = _req(port, "POST", "/v1/completions", {
        "model": "second", "prompt": [1, 2, 3], "max_tokens": 2,
        "temperature": 0.0})
    assert status == 200, data

    status, data = _req(port, "GET", "/v1/models")
    ids = {m["id"]: m for m in json.loads(data)["data"]}
    assert ids["second"]["loaded"] is True

    status, data = _req(port, "POST", "/models/unload", {"model": "second"})
    assert status == 200 and json.loads(data)["success"]
    status, data = _req(port, "GET", "/v1/models")
    ids = {m["id"]: m for m in json.loads(data)["data"]}
    assert ids["second"]["loaded"] is False


def test_engine_error_rollback(server):
    """A failing prefill releases the slot with reason 'error' and the
    engine keeps serving (failed-ubatch rollback analog)."""
    import queue as _q

    port, engine = server
    orig = engine.ctx.prefill
    calls = {"n": 0}

    def boom(seq_id, tokens, all_logits=True):
        calls["n"] += 1
        raise RuntimeError("injected fault")

    engine.ctx.prefill = boom
    try:
        q = _q.Queue()
        from rrs_tpu.serving.engine import GenRequest
        engine.submit(GenRequest(
            prompt_tokens=[1, 2, 3], max_tokens=2,
            on_token=lambda t, p, fin, r: q.put((fin, r))))
        fin, reason = q.get(timeout=60)
        assert fin and reason == "error"
        assert calls["n"] == 1
    finally:
        engine.ctx.prefill = orig
    # engine still works afterwards
    s, d = _req(port, "POST", "/v1/completions",
                {"prompt": [4, 5], "max_tokens": 2, "temperature": 0.0})
    assert s == 200


def test_stress_mixed_endpoints(server):
    """Thread-safety analog (tests/test-thread-safety.cpp): concurrent
    completions, embeddings, rerank and metrics hammering one engine."""
    import random

    port, engine = server
    errors = []

    def completions(i):
        s, d = _req(port, "POST", "/v1/completions", {
            "prompt": [10 + i, 11, 12], "max_tokens": 3, "temperature": 0.0})
        if s != 200:
            errors.append(("cmpl", s, d))

    def chat(i):
        s, d = _req(port, "POST", "/v1/chat/completions", {
            "messages": [{"role": "user", "content": f"x{i}"}],
            "max_tokens": 2})
        if s != 200:
            errors.append(("chat", s, d))

    def embed(i):
        s, d = _req(port, "POST", "/v1/embeddings", {"input": f"zz{i}"})
        if s != 200:
            errors.append(("emb", s, d))

    def metrics(i):
        s, d = _req(port, "GET", "/metrics")
        if s != 200:
            errors.append(("met", s, d))

    jobs = []
    rng = random.Random(0)
    fns = [completions, chat, embed, metrics]
    for i in range(12):
        jobs.append(threading.Thread(target=rng.choice(fns), args=(i,)))
    for t in jobs:
        t.start()
    for t in jobs:
        t.join(timeout=300)
    assert not errors, errors[:3]
    assert not any(t.is_alive() for t in jobs)


def test_engine_speculative_matches_plain():
    """Server-side speculative decoding (draft==target here, so every draft
    accepts) must emit exactly the plain greedy token stream."""
    import queue as _q

    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models.llama import random_weights
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.serving.engine import Engine, GenRequest
    from rrs_tpu.runtime.sampler import SamplerParams

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)

    def collect(engine, prompt, n):
        q = _q.Queue()
        toks = []
        engine.submit(GenRequest(
            prompt_tokens=prompt, max_tokens=n,
            params=SamplerParams(temperature=0.0),
            on_token=lambda t, p, fin, r: (toks.append(t) if t is not None
                                           else None, q.put(fin))[1]))
        while not q.get(timeout=300):
            pass
        return toks

    plain_engine = Engine(InferenceContext(cfg, w, n_lanes=1, max_seq=128))
    plain_engine.start()
    try:
        plain = collect(plain_engine, [5, 6, 7], 10)
    finally:
        plain_engine.stop()

    spec_engine = Engine(
        InferenceContext(cfg, w, n_lanes=1, max_seq=128),
        draft_ctx=InferenceContext(cfg, w, n_lanes=1, max_seq=128),
        n_draft=3)
    spec_engine.start()
    try:
        spec = collect(spec_engine, [5, 6, 7], 10)
    finally:
        spec_engine.stop()

    assert spec == plain, (spec, plain)
    assert spec_engine.n_drafted > 0
    # identical models: every verified draft token accepted
    assert spec_engine.n_draft_accepted == spec_engine.n_drafted


def test_webui_served(server):
    port, _ = server
    status, data = _req(port, "GET", "/")
    assert status == 200
    assert b"<title>rrs_tpu server</title>" in data
    assert b"/v1/chat/completions" in data


def test_finish_reason_length_and_bad_grammar_400(server):
    port, engine = server
    # max_tokens exhaustion must report "length" (not "stop")
    st, body = _req(port, "POST", "/v1/completions",
                    {"prompt": "ab", "max_tokens": 1, "temperature": 0})
    assert st == 200
    body = json.loads(body)
    assert body["choices"][0]["finish_reason"] == "length"

    # invalid grammar must be a 400, not a dropped connection
    st, body = _req(port, "POST", "/completion",
                    {"prompt": "ab", "n_predict": 2,
                     "grammar": 'root ::= "a'})
    assert st == 400 and "error" in json.loads(body)


def test_prompt_too_long_rejected(server):
    port, engine = server
    st, body = _req(port, "POST", "/v1/completions",
                    {"prompt": "a" * 200, "max_tokens": 2})  # ctx is 128
    assert st == 200
    body = json.loads(body)
    assert "prompt too long" in (body["choices"][0]["finish_reason"] or "")


def test_stop_string_reason_and_no_prefix_leak(server):
    port, engine = server
    # find what the model generates greedily, then use a 2-char stop string
    # that starts mid-generation to check (a) reason == "stop", (b) the
    # emitted text contains NO prefix of the stop string
    st, free = _req(port, "POST", "/v1/completions",
                    {"prompt": "ab", "max_tokens": 6, "temperature": 0})
    text = json.loads(free)["choices"][0]["text"]
    if len(text) < 3:
        import pytest
        pytest.skip("model produced too little text")
    stop = text[2:4]
    st, body = _req(port, "POST", "/v1/completions",
                    {"prompt": "ab", "max_tokens": 6, "temperature": 0,
                     "stop": [stop]})
    assert st == 200
    out = json.loads(body)["choices"][0]
    assert out["finish_reason"] == "stop"
    assert out["text"] == text.split(stop)[0]
