"""OpenAI-compatible HTTP server (tools/server analog, stdlib http.server).

Routes (server.cpp:160-200 route table):
  POST /v1/chat/completions   OAI chat (stream + non-stream)
  POST /v1/completions        OAI completions
  POST /completion            llama.cpp-native completion
  POST /tokenize, /detokenize
  GET  /health, /props, /metrics (Prometheus-ish), /slots, /v1/models
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from rrs_tpu.runtime.sampler import SamplerParams
from rrs_tpu.serving.chat import apply_template, detect_template, stop_strings_for
from rrs_tpu.serving.engine import Engine, GenRequest


class ModelHandle:
    """One loadable model in the router (server-models.cpp analog): lazily
    loaded on first request, unloadable to free HBM."""

    def __init__(self, name: str, path: str, n_lanes: int = 2,
                 max_seq: int = 2048, kv_quant: str = "none"):
        self.name = name
        self.path = path
        self.n_lanes = n_lanes
        self.max_seq = max_seq
        self.kv_quant = kv_quant
        self.state: "ServerState | None" = None

    @property
    def loaded(self) -> bool:
        return self.state is not None

    def load(self) -> "ServerState":
        if self.state is None:
            from rrs_tpu.models.loader import load_model
            from rrs_tpu.models.vocab import Vocab
            from rrs_tpu.runtime.recurrent import make_context

            cfg, weights, md = load_model(self.path)
            vocab = Vocab.from_gguf(md)
            ctx = make_context(cfg, weights, n_lanes=self.n_lanes,
                               max_seq=self.max_seq, kv_quant=self.kv_quant)
            engine = Engine(ctx)
            engine.start()
            self.state = ServerState(cfg, vocab, engine, md, self.name)
        return self.state

    def unload(self) -> None:
        if self.state is not None:
            self.state.engine.stop()
            self.state = None
            import gc

            gc.collect()


class ServerState:
    def __init__(self, cfg, vocab, engine: Engine, md: dict, model_name: str):
        self.cfg = cfg
        self.vocab = vocab
        self.engine = engine
        self.md = md
        self.model_name = model_name
        self.template = detect_template(md)
        # model's own Jinja template (primary path) + tool-call dialect
        self.chat_template = str(md.get("tokenizer.chat_template", "") or "")
        from rrs_tpu.serving.chat import detect_tool_format

        self.tool_format = detect_tool_format(self.chat_template)
        bos = vocab.tokens[vocab.bos_id] if 0 <= vocab.bos_id < len(vocab.tokens) else ""
        eos = vocab.tokens[vocab.eos_id] if 0 <= vocab.eos_id < len(vocab.tokens) else ""
        self.special_tokens = {"bos_token": bos, "eos_token": eos}
        self.t_start = time.time()
        # multi-model router (server-models.cpp): name -> ModelHandle;
        # requests with a different "model" field route to that handle
        self.models: dict[str, ModelHandle] = {}
        # multimodal projector (clip.cpp weights), set via --mmproj
        self.clip_cfg = None
        self.clip_weights = None
        # audio tower (mtmd-audio + whisper-enc analog), same --mmproj file
        self.audio_cfg = None
        self.audio_weights = None
        # /slots save/restore base dir (--slot-save-path); endpoints are
        # disabled when unset, mirroring the reference's slot_save_path gate
        self.slot_save_path = None

    def render_chat(self, messages, tools=None, add_assistant=True):
        """(prompt text, extra stop strings) via the model's Jinja template,
        falling back to the heuristic family."""
        from rrs_tpu.serving.chat import build_prompt

        return build_prompt(self.chat_template, self.template, messages,
                            tools=tools, add_assistant=add_assistant,
                            special=self.special_tokens)


def _sampler_params(body: dict) -> SamplerParams:
    return SamplerParams(
        temperature=float(body.get("temperature", 1.0 if "temperature" in body else 0.8)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.05)),
        penalty_repeat=float(body.get("repeat_penalty", 1.0)),
        penalty_freq=float(body.get("frequency_penalty", 0.0)),
        penalty_present=float(body.get("presence_penalty", 0.0)),
        seed=int(body.get("seed", 42)),
        xtc_probability=float(body.get("xtc_probability", 0.0)),
        xtc_threshold=float(body.get("xtc_threshold", 0.1)),
        top_n_sigma=float(body.get("top_n_sigma", 0.0)),
        mirostat=int(body.get("mirostat", 0)),
        mirostat_tau=float(body.get("mirostat_tau", 5.0)),
        mirostat_eta=float(body.get("mirostat_eta", 0.1)),
        dry_multiplier=float(body.get("dry_multiplier", 0.0)),
        dry_base=float(body.get("dry_base", 1.75)),
        dry_allowed_length=int(body.get("dry_allowed_length", 2)),
        logit_bias=tuple(
            (int(k), float(v))
            for k, v in (body.get("logit_bias") or {}).items()
        ) if isinstance(body.get("logit_bias"), dict) else (),
    )


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        st = state      # default model; rebound per request by _route

        def log_message(self, fmt, *args):
            pass

        # -- helpers ---------------------------------------------------

        def _json(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def _run_request(self, prompt_tokens, body, stop_strings=(),
                         probs_out=None, segments=None, infill=False):
            """Submit and collect; returns a (piece, finished, reason)
            iterator. Setup (grammar parse, schema conversion, submit) runs
            EAGERLY so invalid requests raise here — the route maps that to
            a 400 instead of a dropped connection. The submitted GenRequest
            is exposed on the generator as ``.req`` (abort on disconnect)."""
            q: "queue.Queue" = queue.Queue()

            def on_token(token, piece, finished, reason):
                q.put((piece, finished, reason))

            n_probs = int(body.get("n_probs") or 0)
            if body.get("logprobs") not in (None, False):
                lp = body["logprobs"]
                n_probs = max(n_probs, lp if isinstance(lp, int) else 0, 1)
            n_probs = max(n_probs, int(body.get("top_logprobs") or 0))
            on_probs = None
            if n_probs and probs_out is not None:
                def on_probs(token, logprob, top):
                    probs_out.append((token, logprob, top))

            stops = body.get("stop") or []
            if isinstance(stops, str):
                stops = [stops]
            grammar = None
            gbnf = body.get("grammar")
            rf = body.get("response_format") or {}
            if not gbnf and body.get("json_schema"):
                from rrs_tpu.runtime.json_schema import json_schema_to_gbnf
                gbnf = json_schema_to_gbnf(body["json_schema"])
            if not gbnf and rf.get("type") == "json_schema":
                from rrs_tpu.runtime.json_schema import json_schema_to_gbnf
                gbnf = json_schema_to_gbnf(
                    rf.get("json_schema", {}).get("schema", {}))
            if not gbnf and rf.get("type") == "json_object":
                from rrs_tpu.runtime.json_schema import json_schema_to_gbnf
                gbnf = json_schema_to_gbnf({})
            if gbnf:
                from rrs_tpu.runtime.grammar import Grammar

                # lazy tool-call grammars: grammar_lazy + grammar_triggers
                # ([{"type": "word"|"pattern"|"token", "value": ...}] or
                # plain strings), server-task.cpp params
                words, patterns, ttoks = [], [], []
                for trig in body.get("grammar_triggers") or []:
                    if isinstance(trig, str):
                        words.append(trig)
                    elif isinstance(trig, dict):
                        ty = trig.get("type", "word")
                        val = trig.get("value", trig.get("word", ""))
                        if ty in ("pattern", "pattern_full", 2, 3):
                            patterns.append(str(val))
                        elif ty in ("token", 0):
                            ttoks.append(int(val))
                        else:
                            words.append(str(val))
                grammar = Grammar(
                    gbnf,
                    lazy=bool(body.get("grammar_lazy"))
                    or bool(words or patterns or ttoks),
                    trigger_words=words, trigger_patterns=patterns,
                    trigger_tokens=ttoks)
            req = GenRequest(
                prompt_tokens=prompt_tokens,
                max_tokens=int(body.get("max_tokens") or body.get("n_predict") or 128),
                params=_sampler_params(body),
                stop_tokens=tuple(
                    t for t in (self.st.vocab.eos_id,) if t is not None and t >= 0
                ),
                stop_strings=tuple(stops) + tuple(stop_strings),
                on_token=on_token,
                decode_fn=lambda ids: self.st.vocab.decode(ids),
                grammar=grammar,
                token_pieces=(self.st.vocab.pieces()
                              if grammar or infill else None),
                token_trie=(self.st.vocab.token_trie()
                            if grammar is not None else None),
                n_probs=n_probs,
                on_probs=on_probs,
                segments=segments,
                infill=infill,
            )
            self.st.engine.submit(req)

            def _collect():
                while True:
                    piece, finished, reason = q.get()
                    yield piece, finished, reason
                    if finished:
                        break

            class _Collected:
                def __init__(self, it, rq):
                    self._it = it
                    self.req = rq

                def __iter__(self):
                    return self._it

            return _Collected(_collect(), req)

        def _stream_sse(self, gen, wrap):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def send_chunk(obj):
                data = b"data: " + json.dumps(obj).encode() + b"\n\n"
                self.wfile.write(hex(len(data))[2:].encode() + b"\r\n" + data + b"\r\n")

            try:
                for piece, finished, reason in gen:
                    if piece or finished:
                        send_chunk(wrap(piece, finished, reason))
            except (BrokenPipeError, ConnectionResetError):
                # client went away: stop the engine slot instead of
                # generating to max_tokens into a queue nobody drains
                if getattr(gen, "req", None) is not None:
                    gen.req.abort = True
                return
            data = b"data: [DONE]\n\n"
            self.wfile.write(hex(len(data))[2:].encode() + b"\r\n" + data + b"\r\n")
            self.wfile.write(b"0\r\n\r\n")

        # -- feature handlers -------------------------------------------

        def _handle_anthropic(self, body):
            """Anthropic /v1/messages (non-stream + stream event protocol)."""
            messages = list(body.get("messages", []))
            if body.get("system"):
                messages = [{"role": "system", "content": body["system"]}] + messages
            text, stops = self.st.render_chat(messages)
            toks = self.st.vocab.encode(text, add_special=False)
            rid = f"msg_{uuid.uuid4().hex[:16]}"
            body = dict(body)
            body.setdefault("max_tokens", 256)
            try:
                gen = self._run_request(toks, body, stop_strings=stops)
            except Exception as e:                            # noqa: BLE001
                self._json({"error": str(e)}, 400)
                return
            if body.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def ev(name, obj):
                    data = (f"event: {name}\n"
                            f"data: {json.dumps(obj)}\n\n").encode()
                    self.wfile.write(hex(len(data))[2:].encode() + b"\r\n"
                                     + data + b"\r\n")

                ev("message_start", {"type": "message_start", "message": {
                    "id": rid, "type": "message", "role": "assistant",
                    "content": [], "model": self.st.model_name,
                    "usage": {"input_tokens": len(toks), "output_tokens": 0}}})
                ev("content_block_start", {
                    "type": "content_block_start", "index": 0,
                    "content_block": {"type": "text", "text": ""}})
                n_out = 0
                stop_reason = "end_turn"
                for piece, finished, reason in gen:
                    if piece:
                        n_out += 1
                        ev("content_block_delta", {
                            "type": "content_block_delta", "index": 0,
                            "delta": {"type": "text_delta", "text": piece}})
                    if finished:
                        stop_reason = ("max_tokens" if reason == "length"
                                       else "end_turn")
                ev("content_block_stop",
                   {"type": "content_block_stop", "index": 0})
                ev("message_delta", {"type": "message_delta",
                                     "delta": {"stop_reason": stop_reason},
                                     "usage": {"output_tokens": n_out}})
                ev("message_stop", {"type": "message_stop"})
                self.wfile.write(b"0\r\n\r\n")
            else:
                parts, reason = [], "end_turn"
                for piece, finished, r in gen:
                    parts.append(piece)
                    if finished:
                        reason = "max_tokens" if r == "length" else "end_turn"
                content = "".join(parts)
                self._json({
                    "id": rid, "type": "message", "role": "assistant",
                    "model": self.st.model_name,
                    "content": [{"type": "text", "text": content}],
                    "stop_reason": reason,
                    "usage": {"input_tokens": len(toks),
                              "output_tokens": len(parts)},
                })

        def _handle_infill(self, body):
            """Fill-in-the-middle completion (tools/server /infill route):
            fim_pre + prefix + fim_suf + suffix + fim_mid [+ prompt]."""
            v = self.st.vocab
            if v.fim_pre_id < 0 or v.fim_suf_id < 0 or v.fim_mid_id < 0:
                self._json({"error": "model has no FIM tokens"}, 400)
                return
            prefix = str(body.get("input_prefix", ""))
            suffix = str(body.get("input_suffix", ""))
            extra = str(body.get("prompt", "") or "")
            toks = ([v.fim_pre_id] + v.encode(prefix, add_special=False)
                    + [v.fim_suf_id] + v.encode(suffix, add_special=False)
                    + [v.fim_mid_id]
                    + (v.encode(extra, add_special=False) if extra else []))
            try:
                gen = self._run_request(toks, body, infill=True)
            except Exception as e:                            # noqa: BLE001
                self._json({"error": str(e)}, 400)
                return
            parts, reason = [], "stop"
            for piece, finished, r in gen:
                parts.append(piece)
                if finished:
                    reason = r or "stop"
            self._json({"content": "".join(parts),
                        "stop_type": reason,
                        "tokens_evaluated": len(toks),
                        "tokens_predicted": len(parts)})

        def _handle_rerank(self, body):
            """Causal-LM reranking: score(doc | query) = mean logprob of the
            document tokens conditioned on the query. (The reference serves
            dedicated rank-pooling models, tools/server rerank; this engine
            scores with the loaded causal LM instead.)"""
            query = str(body.get("query", ""))
            docs = body.get("documents") or []
            top_n = int(body.get("top_n") or len(docs))
            results = []
            for i, doc in enumerate(docs):
                q_toks = self.st.vocab.encode(
                    f"Query: {query}\nDocument: ", add_special=True)
                d_toks = self.st.vocab.encode(str(doc), add_special=False)
                if not d_toks:
                    results.append({"index": i, "relevance_score": -1e30})
                    continue
                toks = (q_toks + d_toks)[: self.st.engine.ctx.kv.max_seq - 1]
                nd = len(toks) - len(q_toks)

                def score(toks=toks, nd=nd):
                    # device-side NLL (prefill_logprobs): [T]-float readback
                    # instead of [T, V] logits + host log-softmax (the
                    # full-logits readback dominates through a remote link)
                    import numpy as np

                    ctx = self.st.engine.ctx
                    seq = ctx.new_sequence()
                    try:
                        lp = ctx.prefill_logprobs(
                            seq, toks, list(toks[1:]) + [0])
                    finally:
                        ctx.kv.seq_rm(seq)
                    doc_lp = np.asarray(lp, np.float64)[
                        len(toks) - nd - 1 : len(toks) - 1]
                    return float(doc_lp.sum()) / max(nd, 1)

                results.append({"index": i,
                                "relevance_score": self.st.engine.call(score)})
            results.sort(key=lambda r: -r["relevance_score"])
            self._json({"model": self.st.model_name,
                        "object": "list",
                        "results": results[:top_n],
                        "usage": {"total_tokens": 0}})

        def _handle_slot_action(self, body):
            import re as _re
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            m = _re.match(r"^/slots/(\d+)$", u.path)
            if not m:
                self._json({"error": "not found"}, 404)
                return
            idx = int(m.group(1))
            if idx >= len(self.st.engine.slots):
                self._json({"error": "no such slot"}, 400)
                return
            action = (parse_qs(u.query).get("action") or [""])[0]

            def _confined(fname: str) -> str:
                # save/restore write the filesystem on behalf of an HTTP
                # client: require an operator-configured base dir and a
                # plain basename (no separators / '..'), like the
                # reference's --slot-save-path validation
                import os
                base = self.st.slot_save_path
                if not base:
                    raise ValueError(
                        "slot save/restore disabled (start the server "
                        "with --slot-save-path)")
                if (not fname or os.path.basename(fname) != fname
                        or fname in (".", "..")):
                    raise ValueError(f"invalid filename {fname!r}")
                return os.path.join(base, fname)

            try:
                if action == "save":
                    self._json(self.st.engine.save_slot(
                        idx, _confined(body.get("filename",
                                                f"slot{idx}.rrsstate"))))
                elif action == "restore":
                    self._json(self.st.engine.restore_slot(
                        idx, _confined(body.get("filename",
                                                f"slot{idx}.rrsstate"))))
                elif action == "erase":
                    self.st.engine.call(lambda: self.st.engine.erase_slot(idx))
                    self._json({"id_slot": idx, "success": True})
                else:
                    self._json({"error": f"unknown action '{action}'"}, 400)
            except Exception as e:                        # noqa: BLE001
                self._json({"error": str(e)}, 400)

        # -- routes ----------------------------------------------------

        def _route(self, body) -> None:
            """Multi-model routing (server-models.cpp): a request naming a
            registered non-default model runs on that model's engine."""
            name = body.get("model")
            if not name or name == state.model_name:
                return
            handle = state.models.get(name)
            if handle is not None:
                self.st = handle.load()

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                # built-in chat webui (tools/server/public analog)
                import pathlib

                page = (pathlib.Path(__file__).parent / "webui.html"
                        ).read_bytes()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
            elif self.path == "/health":
                self._json({"status": "ok"})
            elif self.path in ("/v1/models", "/models"):
                data = [{
                    "id": state.model_name, "object": "model",
                    "created": int(state.t_start), "owned_by": "rrs_tpu",
                    "loaded": True,
                }]
                for name, h in state.models.items():
                    data.append({"id": name, "object": "model",
                                 "created": int(state.t_start),
                                 "owned_by": "rrs_tpu", "loaded": h.loaded})
                self._json({"object": "list", "data": data})
            elif self.path == "/props":
                self._json({
                    "model": self.st.model_name,
                    "chat_template": self.st.template,
                    "total_slots": len(self.st.engine.slots),
                    "n_ctx": self.st.engine.ctx.kv.max_seq,
                })
            elif self.path == "/slots":
                self._json([
                    {
                        "id": s.index,
                        "state": s.state.name,
                        "n_prompt": s.n_prompt,
                        "n_generated": len(s.generated) if s.req else 0,
                    }
                    for s in self.st.engine.slots
                ])
            elif self.path == "/metrics":
                e = self.st.engine
                lines = [
                    "# TYPE llamacpp:prompt_tokens_total counter",
                    f"llamacpp:prompt_tokens_total {e.n_prompt_tokens}",
                    "# TYPE llamacpp:tokens_predicted_total counter",
                    f"llamacpp:tokens_predicted_total {e.n_generated_tokens}",
                    "# TYPE llamacpp:requests_total counter",
                    f"llamacpp:requests_total {e.n_requests}",
                ]
                perf = getattr(e.ctx, "perf", None)
                if perf:
                    p = perf()
                    lines += [
                        "# TYPE llamacpp:prompt_tokens_seconds_total counter",
                        f"llamacpp:prompt_tokens_seconds_total {p['t_p_eval_ms']/1e3:.3f}",
                        "# TYPE llamacpp:predicted_tokens_seconds_total counter",
                        f"llamacpp:predicted_tokens_seconds_total {p['t_eval_ms']/1e3:.3f}",
                        "# TYPE llamacpp:prompt_tokens_per_second gauge",
                        f"llamacpp:prompt_tokens_per_second {p['pp_tok_per_s']:.2f}",
                        "# TYPE llamacpp:predicted_tokens_per_second gauge",
                        f"llamacpp:predicted_tokens_per_second {p['tg_tok_per_s']:.2f}",
                    ]
                data = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            try:
                body = self._read_body()
            except Exception as e:
                self._json({"error": str(e)}, 400)
                return

            if self.path == "/models/load":
                h = state.models.get(body.get("model", ""))
                if h is None:
                    self._json({"error": "unknown model"}, 400)
                else:
                    h.load()
                    self._json({"success": True, "model": h.name})
                return
            if self.path == "/models/unload":
                h = state.models.get(body.get("model", ""))
                if h is None:
                    self._json({"error": "unknown model"}, 400)
                else:
                    h.unload()
                    self._json({"success": True, "model": h.name})
                return

            self._route(body)

            if self.path == "/tokenize":
                ids = self.st.vocab.encode(
                    body.get("content", ""),
                    add_special=bool(body.get("add_special", False)),
                )
                self._json({"tokens": ids})
                return
            if self.path == "/detokenize":
                self._json({"content": self.st.vocab.decode(body.get("tokens", []))})
                return

            if self.path == "/v1/chat/completions":
                from rrs_tpu.serving.chat import extract_reasoning, parse_tool_calls

                messages = body.get("messages", [])
                tools = body.get("tools") or None
                # multimodal: lift image/audio parts out in order, leaving
                # markers in the text (mtmd media chunks)
                media = []          # ordered ("image", url) | ("audio", b64)
                if (self.st.clip_weights is not None
                        or self.st.audio_weights is not None):
                    from rrs_tpu.mtmd.pipeline import IMAGE_MARKER

                    msgs2 = []
                    for m in messages:
                        c = m.get("content")
                        if isinstance(c, list):
                            parts = []
                            for part in c:
                                if (part.get("type") == "image_url"
                                        and self.st.clip_weights is not None):
                                    url = part["image_url"]
                                    url = url.get("url") if isinstance(url, dict) else url
                                    media.append(("image", url))
                                    parts.append({"type": "text",
                                                  "text": IMAGE_MARKER})
                                elif (part.get("type") == "input_audio"
                                        and self.st.audio_weights is not None):
                                    ia = part.get("input_audio", {})
                                    media.append(("audio", ia.get("data", "")))
                                    parts.append({"type": "text",
                                                  "text": IMAGE_MARKER})
                                else:
                                    parts.append(part)
                            m = {**m, "content": parts}
                        msgs2.append(m)
                    messages = msgs2
                text, chat_stops = self.st.render_chat(messages, tools=tools)
                toks = self.st.vocab.encode(text, add_special=False)
                rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
                probs = []
                segments = None
                if media:
                    from rrs_tpu.mtmd.pipeline import (IMAGE_MARKER,
                                                       decode_audio_b64,
                                                       decode_image_b64,
                                                       embed_images)

                    chunks = []
                    for kind, payload in media:
                        if kind == "image":
                            chunks.extend(embed_images(
                                self.st.clip_cfg, self.st.clip_weights,
                                [decode_image_b64(payload)]))
                        else:
                            import numpy as np

                            from rrs_tpu.mtmd.audio import embed_audio

                            pcm = decode_audio_b64(payload)
                            emb = embed_audio(self.st.audio_cfg,
                                              self.st.audio_weights, pcm)
                            chunks.append(np.concatenate(emb, axis=0))
                    segments = []
                    for i, piece in enumerate(text.split(IMAGE_MARKER)):
                        if piece:
                            segments.append(("tokens", self.st.vocab.encode(
                                piece, add_special=False)))
                        if i < len(chunks):
                            # qwen2vl chunks are (emb, merged grid) — the
                            # grid drives M-RoPE positions at prefill
                            kind = ("embeds_mrope"
                                    if isinstance(chunks[i], tuple)
                                    else "embeds")
                            segments.append((kind, chunks[i]))
                try:
                    gen = self._run_request(
                        toks, body, stop_strings=chat_stops,
                        probs_out=probs, segments=segments,
                    )
                except Exception as e:                        # noqa: BLE001
                    self._json({"error": str(e)}, 400)
                    return
                if body.get("stream"):
                    def wrap(piece, finished, reason):
                        delta = {} if finished else {"content": piece}
                        return {
                            "id": rid, "object": "chat.completion.chunk",
                            "model": self.st.model_name,
                            "choices": [{"index": 0, "delta": delta,
                                         "finish_reason": reason if finished else None}],
                        }
                    self._stream_sse(gen, wrap)
                else:
                    parts, reason = [], "stop"
                    for piece, finished, r in gen:
                        parts.append(piece)
                        if finished:
                            reason = r or "stop"
                    content = "".join(parts)
                    reasoning, content = extract_reasoning(content)
                    tool_calls = []
                    if tools:
                        content, tool_calls = parse_tool_calls(
                            content, fmt=self.st.tool_format)
                    msg = {"role": "assistant", "content": content}
                    if reasoning is not None:
                        msg["reasoning_content"] = reasoning
                    if tool_calls:
                        msg["tool_calls"] = tool_calls
                        reason = "tool_calls"
                    n_out = len(probs) if probs else len(content.split())
                    resp_choice = {"index": 0, "finish_reason": reason,
                                   "message": msg}
                    if probs:
                        resp_choice["logprobs"] = {"content": [
                            {"token": self.st.vocab.decode([t]),
                             "logprob": lp,
                             "top_logprobs": [
                                 {"token": self.st.vocab.decode([tt]),
                                  "logprob": tlp} for tt, tlp in top]}
                            for t, lp, top in probs]}
                    self._json({
                        "id": rid, "object": "chat.completion",
                        "model": self.st.model_name, "created": int(time.time()),
                        "choices": [resp_choice],
                        "usage": {"prompt_tokens": len(toks),
                                  "completion_tokens": n_out,
                                  "total_tokens": len(toks) + n_out},
                    })
                return

            if self.path == "/v1/messages":
                # Anthropic Messages API (server.cpp:179 route analog)
                self._handle_anthropic(body)
                return

            if self.path == "/apply-template":
                messages = body.get("messages", [])
                text, _ = self.st.render_chat(
                    messages, tools=body.get("tools") or None)
                self._json({"prompt": text})
                return

            if self.path == "/infill":
                self._handle_infill(body)
                return

            if self.path in ("/rerank", "/v1/rerank", "/reranking"):
                self._handle_rerank(body)
                return

            if self.path.startswith("/slots/"):
                self._handle_slot_action(body)
                return

            if self.path in ("/v1/embeddings", "/embeddings", "/embedding"):
                inputs = body.get("input") or body.get("content") or ""
                if isinstance(inputs, str):
                    inputs = [inputs]
                data = []
                for i, text in enumerate(inputs):
                    toks = (text if isinstance(text, list)
                            else self.st.vocab.encode(str(text), add_special=True))
                    vec = self.st.engine.call(
                        lambda toks=toks: self.st.engine.ctx.embed(toks))
                    data.append({"object": "embedding", "index": i,
                                 "embedding": [float(x) for x in vec]})
                self._json({"object": "list", "data": data,
                            "model": self.st.model_name})
                return

            if self.path in ("/v1/completions", "/completion", "/completions"):
                prompt = body.get("prompt", "")
                toks = (
                    prompt if isinstance(prompt, list)
                    else self.st.vocab.encode(str(prompt), add_special=True)
                )
                rid = f"cmpl-{uuid.uuid4().hex[:12]}"
                probs = []
                try:
                    gen = self._run_request(toks, body, probs_out=probs)
                except Exception as e:                        # noqa: BLE001
                    self._json({"error": str(e)}, 400)
                    return
                if body.get("stream"):
                    def wrap(piece, finished, reason):
                        return {
                            "id": rid, "object": "text_completion",
                            "model": self.st.model_name,
                            "choices": [{"index": 0, "text": piece,
                                         "finish_reason": reason if finished else None}],
                        }
                    self._stream_sse(gen, wrap)
                else:
                    parts, reason = [], "stop"
                    for piece, finished, r in gen:
                        parts.append(piece)
                        if finished:
                            reason = r or "stop"
                    choice = {"index": 0, "text": "".join(parts),
                              "finish_reason": reason}
                    if probs:
                        choice["logprobs"] = {
                            "tokens": [self.st.vocab.decode([t])
                                       for t, _, _ in probs],
                            "token_logprobs": [lp for _, lp, _ in probs],
                            "top_logprobs": [
                                {self.st.vocab.decode([tt]): tlp
                                 for tt, tlp in top}
                                for _, _, top in probs],
                        }
                    self._json({
                        "id": rid, "object": "text_completion",
                        "model": self.st.model_name, "created": int(time.time()),
                        "choices": [choice],
                    })
                return

            self._json({"error": "not found"}, 404)

    return Handler


def serve(args):
    from rrs_tpu.models.loader import load_model
    from rrs_tpu.models.vocab import Vocab
    from rrs_tpu.runtime.recurrent import make_context
    from rrs_tpu.parallel.distributed import maybe_initialize, mesh_from_args

    maybe_initialize(args)
    mesh = mesh_from_args(args)
    from rrs_tpu.models.loader import parse_kv_overrides

    cfg, weights, md = load_model(
        args.model, fuse=mesh is None,
        overrides=parse_kv_overrides(getattr(args, "override_kv", None)))
    vocab = Vocab.from_gguf(md)
    n_lanes = args.parallel
    if mesh is not None:
        n_lanes = -(-n_lanes // mesh.shape["dp"]) * mesh.shape["dp"]
    ctx = make_context(cfg, weights, n_lanes=n_lanes, max_seq=args.ctx,
                       kv_quant=getattr(args, "cache_type", "none"),
                       mesh=mesh)
    if mesh is not None:
        print(f"tensor/data parallel over mesh {dict(mesh.shape)}")
    draft_ctx = None
    if getattr(args, "model_draft", None):
        dcfg, dweights, _ = load_model(args.model_draft)
        draft_ctx = make_context(dcfg, dweights, n_lanes=args.parallel,
                                 max_seq=args.ctx)
        print(f"speculative decoding with draft {args.model_draft}")
    engine = Engine(ctx, draft_ctx=draft_ctx,
                    n_draft=getattr(args, "draft", 4))
    engine.start()
    state = ServerState(cfg, vocab, engine, md, model_name=str(args.model))
    if getattr(args, "slot_save_path", None):
        import os
        os.makedirs(args.slot_save_path, exist_ok=True)
        state.slot_save_path = args.slot_save_path
    if getattr(args, "mmproj", None):
        from rrs_tpu.gguf.reader import read_gguf

        with read_gguf(args.mmproj) as g:
            names = set(g.tensors)
        if "v.blk.0.ln1.weight" in names or "v.patch_embd.weight" in names:
            from rrs_tpu.mtmd.clip import load_mmproj

            state.clip_cfg, state.clip_weights = load_mmproj(args.mmproj)
            print(f"loaded multimodal projector {args.mmproj} "
                  f"({state.clip_cfg.projector_type}: "
                  f"{state.clip_cfg.n_output_tokens} tokens/img)")
        if "a.conv1d.1.weight" in names:
            from rrs_tpu.mtmd.audio import load_audio_mmproj

            state.audio_cfg, state.audio_weights = load_audio_mmproj(
                args.mmproj)
            print(f"loaded audio tower {args.mmproj} "
                  f"({state.audio_cfg.projector} projector, "
                  f"{state.audio_cfg.n_mel} mel bins)")
    for extra in getattr(args, "models", None) or []:
        name = extra.split("=", 1)[0] if "=" in extra else extra
        path = extra.split("=", 1)[1] if "=" in extra else extra
        state.models[name] = ModelHandle(
            name, path, n_lanes=args.parallel, max_seq=args.ctx,
            kv_quant=getattr(args, "cache_type", "none"))
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    print(f"serving {args.model} on http://{args.host}:{args.port} "
          f"({args.parallel} slots, ctx {args.ctx})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        engine.stop()
