"""Continuous-batching inference engine (server-context.cpp analog).

Slot lifecycle mirrors server_slot (server-context.cpp:1959+ update_slots):
IDLE -> PROCESSING_PROMPT (chunked prefill, n_batch budget per iteration)
     -> GENERATING (batched decode, one shared step for all generating slots)
     -> released on stop condition / EOS / length.

Differences from the reference, by TPU design: the engine thread drives a
fixed-lane InferenceContext whose jitted step shapes are bucketed, so any mix
of slots maps to one of a few compiled executables (the graph-reuse analog);
context-shift (halving) is applied when a slot hits the lane's max_seq.
"""

from __future__ import annotations

import dataclasses
import enum
import queue
import threading
import time
from typing import Callable, Optional

import jax
import numpy as np

from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams, sample

# Token-DFA compilation (runtime/grammar.py TokenDFA): grammars whose PDA
# state space closes within the state budget are compiled ONCE and then
# enforced INSIDE the device decode scan: zero violations, chaining stays
# on, constrained decoding at the plain fast-path rate (measured 207.1 vs
# 207.7 unconstrained). The compile runs in a SEPARATE PROCESS: seconds
# of pure-Python trie walking on a sibling thread thrashes the GIL both
# ways (engine 36 -> 1.0 tok/s AND the walk itself 8 s -> ~250 s,
# measured round 5); a spawn-context process has its own GIL and
# grammar.py is jax-free so the child never touches the TPU. Keyed by
# (gbnf, vocab size); None records a failed/oversized compile so it is
# not retried.
_DFA_CACHE: dict = {}
_DFA_PENDING: set = set()
_DFA_LOCK = threading.Lock()


def _dfa_worker(gbnf, pieces, eog_ids, out_path):
    """Child-process entry: rebuild grammar + trie locally (cheaper than
    pickling the 151k-node trie in), compile, pickle the TokenDFA out.
    Imports only jax-free modules — the axon jax hook never fires."""
    import pickle

    from rrs_tpu.runtime.grammar import (Grammar, build_token_trie,
                                         compile_token_dfa)

    try:
        g = Grammar(gbnf)
        trie = build_token_trie(pieces)
        dfa = compile_token_dfa(g, pieces, trie, eog_ids=eog_ids)
    except Exception:                                         # noqa: BLE001
        dfa = None
    with open(out_path, "wb") as f:
        pickle.dump(dfa, f)


def _dfa_compile_async(key, grammar, pieces, trie, eog_ids):
    gbnf = getattr(grammar, "gbnf", "")
    if not gbnf:
        return                      # process rebuild needs the source text
    with _DFA_LOCK:
        if key in _DFA_CACHE or key in _DFA_PENDING:
            return
        _DFA_PENDING.add(key)

    def work():
        import multiprocessing as mp
        import pickle
        import tempfile

        dfa = None
        try:
            fd, path = tempfile.mkstemp(prefix="rrs_dfa_", suffix=".pkl")
            os_close_silent(fd)
            ctx = mp.get_context("spawn")
            proc = ctx.Process(target=_dfa_worker,
                               args=(gbnf, list(pieces), tuple(eog_ids),
                                     path),
                               daemon=True)
            proc.start()
            proc.join(timeout=600)
            if proc.is_alive():
                proc.terminate()
            else:
                with open(path, "rb") as f:
                    dfa = pickle.load(f)
        except Exception:                                     # noqa: BLE001
            dfa = None
        finally:
            try:
                import os as _os

                _os.unlink(path)
            except OSError:
                pass
        with _DFA_LOCK:
            _DFA_CACHE[key] = dfa
            _DFA_PENDING.discard(key)

    threading.Thread(target=work, daemon=True).start()


def os_close_silent(fd):
    import os as _os

    try:
        _os.close(fd)
    except OSError:
        pass


class SlotState(enum.Enum):
    IDLE = 0
    PROMPT = 1
    GENERATING = 2


@dataclasses.dataclass
class GenRequest:
    prompt_tokens: list[int]
    max_tokens: int = 128
    params: SamplerParams = dataclasses.field(default_factory=SamplerParams)
    stop_tokens: tuple[int, ...] = ()
    stop_strings: tuple[str, ...] = ()
    # callback(token_id, text_piece, finished, finish_reason)
    on_token: Optional[Callable] = None
    decode_fn: Optional[Callable[[list[int]], str]] = None  # ids -> text
    grammar: Optional[object] = None          # runtime.grammar.Grammar
    token_pieces: Optional[list[str]] = None  # vocab pieces for grammar masking
    token_trie: Optional[dict] = None         # prefix trie over pieces (mask
                                              # acceleration; vocab.token_trie)
    n_probs: int = 0                          # top-k logprobs per token
    # callback(token_id, logprob, [(tid, logprob) x n_probs])
    on_probs: Optional[Callable] = None
    # multimodal: ordered prompt segments [("tokens", [ids]) | ("embeds",
    # np.ndarray [T, E])]; when set, prompt_tokens is ignored for prefill
    segments: Optional[list] = None
    # fill-in-the-middle: use the dedicated infill sampler
    # (llama_sampler_init_infill)
    infill: bool = False
    # set by the submitter (e.g. on client disconnect) to stop generating;
    # checked at every emitted token
    abort: bool = False
    id: int = 0


@dataclasses.dataclass
class Slot:
    index: int
    state: SlotState = SlotState.IDLE
    req: Optional[GenRequest] = None
    seq_id: int = -1
    prompt_pos: int = 0
    generated: list = dataclasses.field(default_factory=list)
    sent_text_len: int = 0
    last_logits: Optional[np.ndarray] = None
    key: Optional[jax.Array] = None
    t_start: float = 0.0
    n_prompt: int = 0
    grammar: Optional[object] = None
    mirostat_mu: float = 10.0
    draft_seq: int = -1               # draft-model sequence (speculative)
    # prompt-cache retention (server_slot prompt cache analog,
    # server-context.cpp:105-121): the lane's KV survives release so the next
    # request with a shared prefix skips re-prefilling it
    retained_seq: int = -1
    cache_tokens: list = dataclasses.field(default_factory=list)
    n_reused: int = 0
    # set by _emit when it returns True: "stop" (stop token/string),
    # "length" (max_tokens), or "cancelled" (client abort)
    finish_reason: str = "stop" 


class Engine:
    """Background thread turning queued requests into streamed tokens."""

    # per-iteration prompt budget (n_batch analog); long prompts land in
    # the 1024/2048 prefill buckets instead of paying many 256-dispatches
    PROMPT_CHUNK = 1024

    def __init__(self, ctx: InferenceContext, draft_ctx=None, n_draft: int = 4):
        # server-side speculative decoding (server-context.cpp batch_spec
        # path): a draft model proposes n tokens, the target verifies them
        # in one chunked step. Engaged per decode round when exactly one
        # slot is generating greedily with no grammar/penalties/logprobs.
        self.draft_ctx = draft_ctx
        self.n_draft = n_draft
        self.n_drafted = 0
        self.n_draft_accepted = 0
        self.ctx = ctx
        self.slots = [Slot(i) for i in range(ctx.kv.n_lanes)]
        self.pending: "queue.Queue[GenRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._next_id = 0
        self._lock = threading.Lock()
        # side tasks: callables executed on the engine thread between
        # batching iterations (embed/rerank/state-IO share the context
        # safely with decode — the single-compute-thread rule of the
        # reference's server loop)
        self._side: "queue.Queue" = queue.Queue()
        # inflight device micro-run (pipelined decode; see _decode_step)
        self._inflight = None
        # metrics (/metrics analog)
        self.n_prompt_tokens = 0
        self.n_generated_tokens = 0
        self.n_requests = 0

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=5)

    def submit(self, req: GenRequest) -> int:
        with self._lock:
            self._next_id += 1
            req.id = self._next_id
        self.pending.put(req)
        self._wake.set()
        return req.id

    def call(self, fn, timeout: float = 300.0):
        """Run ``fn()`` on the engine thread; return its result (or raise)."""
        if not self._thread.is_alive():
            return fn()
        done = threading.Event()
        box: dict = {}

        def task():
            try:
                box["r"] = fn()
            except Exception as e:          # noqa: BLE001
                box["e"] = e
            done.set()

        self._side.put(task)
        self._wake.set()
        if not done.wait(timeout):
            raise TimeoutError("engine side task timed out")
        if "e" in box:
            raise box["e"]
        return box.get("r")

    # -- engine loop -------------------------------------------------------

    def _free_slot(self) -> Optional[Slot]:
        for s in self.slots:
            if s.state == SlotState.IDLE:
                return s
        return None

    def _launch(self, slot: Slot, req: GenRequest):
        n_prompt = (len(req.prompt_tokens) if req.segments is None else
                    sum(len(seg[1]) for seg in req.segments))
        if n_prompt >= self.ctx.kv.max_seq:
            # the reference rejects the task (server-context launch checks);
            # admitting it would clip every overflow position into the last
            # cell and silently corrupt the lane
            if req.on_token:
                req.on_token(None, "", True, "error: prompt too long "
                             f"({n_prompt} tokens, context {self.ctx.kv.max_seq})")
            return
        slot.state = SlotState.PROMPT
        slot.req = req
        slot.n_reused = 0
        if self.draft_ctx is not None:
            # draft runs the FULL prompt, so target prefix reuse is disabled
            # in speculative mode (keeps the two caches in lockstep)
            if slot.retained_seq >= 0:
                try:
                    self.ctx.kv.seq_rm(slot.retained_seq)
                except ValueError:
                    pass
                slot.retained_seq = -1
                slot.cache_tokens = []
            slot.draft_seq = self.draft_ctx.new_sequence()
        if req.segments is not None and slot.retained_seq >= 0:
            # multimodal prompts skip prefix reuse (chunks aren't tokens)
            try:
                self.ctx.kv.seq_rm(slot.retained_seq)
            except ValueError:
                pass
            slot.retained_seq = -1
            slot.cache_tokens = []
        if slot.retained_seq >= 0 and not self.ctx.kv.has_seq(slot.retained_seq):
            slot.retained_seq = -1      # prompt cache was LRU-evicted
            slot.cache_tokens = []
        if slot.retained_seq >= 0:
            # prompt-cache reuse: keep the common prefix of the retained KV
            # (update_slots prompt reuse, server-context.cpp); at least one
            # prompt token must be re-evaluated to produce logits
            n_common = 0
            # cache_tokens includes the final generated token, which was
            # sampled but never fed to the KV cache (lane holds one fewer
            # position) — clamp reuse to what the lane actually stores, or
            # the next prefill would start one KV position ahead of the
            # cache and silently shift every later position
            stored = self.ctx.kv.lengths[self.ctx.kv.lane_of(slot.retained_seq)]
            limit = min(len(slot.cache_tokens), stored,
                        len(req.prompt_tokens) - 1)
            while n_common < limit and \
                    slot.cache_tokens[n_common] == req.prompt_tokens[n_common]:
                n_common += 1
            slot.seq_id = slot.retained_seq
            slot.retained_seq = -1
            self.ctx.kv.unmark_retained(slot.seq_id)
            if n_common > 0:
                try:
                    self.ctx.kv.seq_rm(slot.seq_id, p0=n_common)
                except RuntimeError:
                    # recurrent/hybrid memory cannot rewind mid-sequence
                    # (llama_memory_recurrent::seq_rm restriction): only a
                    # full-prefix match reuses; otherwise start fresh
                    n_common = 0
            if n_common == 0:
                self.ctx.kv.seq_rm(slot.seq_id)
                slot.seq_id = self.ctx.new_sequence()
            slot.prompt_pos = n_common
            slot.n_reused = n_common
        else:
            slot.seq_id = self.ctx.new_sequence()
            slot.prompt_pos = 0
        slot.cache_tokens = []
        slot.generated = []
        slot.sent_text_len = 0
        slot.key = jax.random.PRNGKey(req.params.seed + req.id)
        slot.t_start = time.time()
        slot.n_prompt = len(req.prompt_tokens)
        slot.grammar = req.grammar.copy() if req.grammar is not None else None
        if (slot.grammar is not None and req.token_pieces
                and req.token_trie is not None
                and not getattr(req.grammar, "lazy", False)):
            _dfa_compile_async(self._dfa_key(req), req.grammar,
                               req.token_pieces, req.token_trie,
                               tuple(req.stop_tokens))
        slot.mirostat_mu = 2.0 * req.params.mirostat_tau
        slot.finish_reason = "stop"
        self.n_requests += 1

    def _release(self, slot: Slot, reason: str):
        req = slot.req
        if req and req.on_token:
            req.on_token(None, "", True, reason)
        if slot.draft_seq >= 0 and self.draft_ctx is not None:
            try:
                self.draft_ctx.kv.seq_rm(slot.draft_seq)
            except ValueError:
                pass
            slot.draft_seq = -1
        if slot.seq_id >= 0:
            if getattr(self.ctx.cfg, "any_swa", False) or (
                    req is not None and req.segments is not None):
                # SWA ring caches can't be safely parked-over while idle;
                # multimodal lanes hold embedding rows whose positions
                # don't correspond to prompt_tokens (cache_tokens would
                # lie about the KV contents and poison prefix reuse)
                try:
                    self.ctx.kv.seq_rm(slot.seq_id)
                except ValueError:
                    pass
            else:
                # retain the lane's KV as a prompt cache for the next request
                slot.retained_seq = slot.seq_id
                slot.cache_tokens = (list(req.prompt_tokens)
                                     + list(slot.generated)) if req else []
                self.ctx.kv.mark_retained(slot.seq_id)
        slot.state = SlotState.IDLE
        slot.req = None
        slot.seq_id = -1
        slot.last_logits = None

    def erase_slot(self, index: int) -> None:
        """Drop a slot's retained prompt cache (/slots erase action)."""
        s = self.slots[index]
        if s.retained_seq >= 0:
            try:
                self.ctx.kv.seq_rm(s.retained_seq)
            except ValueError:
                pass
            s.retained_seq = -1
            s.cache_tokens = []

    # -- slot state save/restore (/slots/{id}?action=save|restore,
    #    server-context.cpp:105-121 + llama_state_seq_* analog) ------------

    def save_slot(self, index: int, path: str) -> dict:
        from rrs_tpu.runtime import state as state_io

        s = self.slots[index]
        seq = s.seq_id if s.seq_id >= 0 else s.retained_seq
        if seq < 0:
            raise ValueError(f"slot {index} has no sequence to save")
        def do():
            return state_io.save_sequence(self.ctx, seq, path,
                                          tokens=s.cache_tokens or None)
        n_bytes = self.call(do)
        return {"id_slot": index, "filename": str(path),
                "n_saved": self.ctx.kv.lengths[self.ctx.kv.lane_of(seq)],
                "n_written": n_bytes}

    def restore_slot(self, index: int, path: str) -> dict:
        from rrs_tpu.runtime import state as state_io

        s = self.slots[index]
        if s.state != SlotState.IDLE:
            raise ValueError(f"slot {index} is busy")
        def do():
            self.erase_slot(index)
            seq_id, tokens = state_io.load_sequence(self.ctx, path)
            s.retained_seq = seq_id
            s.cache_tokens = list(tokens or [])
            self.ctx.kv.mark_retained(seq_id)
            return self.ctx.kv.lengths[self.ctx.kv.lane_of(seq_id)]
        n = self.call(do)
        return {"id_slot": index, "filename": str(path), "n_restored": n}

    @staticmethod
    def _stop_holdback(full: str, stop_strings) -> int:
        """Chars at the end of ``full`` that are a prefix of some stop
        string — withheld from streaming so a stop string completed by a
        LATER token never partially leaks to the client."""
        hold = 0
        for ss in stop_strings:
            top = min(len(ss) - 1, len(full))
            for j in range(top, hold, -1):
                if full.endswith(ss[:j]):
                    hold = j
                    break
        return hold

    def _emit(self, slot: Slot, token: int) -> bool:
        """Append a generated token, stream text, check stop conditions.
        Returns True when the slot should be released; the reason lands in
        slot.finish_reason ("stop" | "length" | "cancelled")."""
        req = slot.req
        slot.generated.append(token)
        self.n_generated_tokens += 1
        if req.abort:
            slot.finish_reason = "cancelled"
            return True
        if token in req.stop_tokens:
            slot.finish_reason = "stop"
            return True
        finishing = len(slot.generated) >= req.max_tokens
        piece = ""
        if req.decode_fn:
            full = req.decode_fn(slot.generated)
            for ss in req.stop_strings:
                idx = full.find(ss)
                if idx >= 0:
                    piece = full[slot.sent_text_len : idx]
                    if piece and req.on_token:
                        req.on_token(token, piece, False, None)
                    slot.finish_reason = "stop"
                    return True
            piece = full[slot.sent_text_len :]
            if not finishing:
                # hold back text that might become a stop-string match or a
                # partial multi-byte char once later tokens arrive
                hold = self._stop_holdback(full, req.stop_strings)
                if hold:
                    piece = piece[: max(0, len(piece) - hold)]
                if piece.endswith("�"):
                    piece = piece[:-1]
            if piece:
                slot.sent_text_len += len(piece)
        if req.on_token:
            req.on_token(token, piece, False, None)
        if finishing:
            slot.finish_reason = "length"
        return finishing

    def _emit_probs(self, slot: Slot, token: int) -> None:
        """Report the sampled token's logprob + top-n alternatives
        (completion n_probs / OAI logprobs)."""
        req = slot.req
        if not req or req.n_probs <= 0 or req.on_probs is None \
                or slot.last_logits is None:
            return
        raw = slot.last_logits.astype(np.float64)
        m = raw.max()
        logz = m + np.log(np.exp(raw - m).sum())
        lp = raw - logz
        k = min(req.n_probs, lp.shape[-1])
        top = np.argpartition(-lp, k - 1)[:k]
        top = top[np.argsort(-lp[top])]
        req.on_probs(token, float(lp[token]),
                     [(int(t), float(lp[t])) for t in top])

    def _sample_token(self, slot: Slot) -> int:
        import jax.numpy as jnp

        from rrs_tpu.runtime.sampler import dry_penalties, mirostat_v2_sample

        slot.key, sub = jax.random.split(slot.key)
        raw = slot.last_logits
        p = slot.req.params
        if p.dry_multiplier > 0.0:
            pen = dry_penalties(
                slot.generated, raw.shape[-1],
                multiplier=p.dry_multiplier, base=p.dry_base,
                allowed_length=p.dry_allowed_length,
                penalty_last_n=p.penalty_last_n,
            )
            if pen:
                raw = raw.copy()
                for tid, v in pen.items():
                    if tid < raw.shape[-1]:
                        raw[tid] -= v
        if p.mirostat:
            token, slot.mirostat_mu = mirostat_v2_sample(
                jnp.asarray(raw), sub, slot.mirostat_mu, p
            )
            return self._grammar_check(slot, token)
        if slot.req.infill and slot.req.token_pieces:
            from rrs_tpu.runtime.sampler import infill_sample

            token = infill_sample(np.asarray(raw), slot.req.token_pieces,
                                  set(slot.req.stop_tokens), sub)
            return self._grammar_check(slot, token)
        logits = jnp.asarray(raw[None, :])
        counts = None
        if p.penalty_repeat != 1.0 or p.penalty_freq or p.penalty_present:
            v = logits.shape[-1]
            window = self.ctx._pen_window(slot.generated, p.penalty_last_n)
            c = np.zeros((1, v), np.float32)
            for t in window:
                c[0, t] += 1
            counts = jnp.asarray(c)
        token = int(sample(logits, sub, p, recent_counts=counts)[0])
        return self._grammar_check(slot, token, counts)

    def _grammar_check(self, slot: Slot, token: int, counts=None) -> int:
        import jax.numpy as jnp

        g = slot.grammar
        p = slot.req.params
        if g is not None:
            pieces = slot.req.token_pieces
            piece = pieces[token] if pieces and token < len(pieces) else ""
            if getattr(g, "awaiting_trigger", False):
                # lazy grammar: unconstrained until the trigger fires
                # (llama-grammar.h:119-143)
                g.feed_token(token, piece)
                return token
            if token in slot.req.stop_tokens:
                if g.done:
                    return token    # grammar complete: EOS allowed
            elif piece and g.accept_text(piece):
                return token
            # rejected: lazy full mask + resample (common_sampler strategy)
            mask = np.asarray(
                g.allowed_mask(pieces, trie=slot.req.token_trie), bool)
            if g.done:
                for st in slot.req.stop_tokens:
                    if st < mask.shape[0]:
                        mask[st] = True
            masked = np.where(mask, slot.last_logits, -1e30)
            slot.key, sub = jax.random.split(slot.key)
            token = int(sample(jnp.asarray(masked[None, :]), sub, p,
                               recent_counts=counts)[0])
            if slot.req.stop_tokens and token in slot.req.stop_tokens:
                return token
            piece = pieces[token] if token < len(pieces) else ""
            g.accept_text(piece)
        return token

    def _loop(self):
        while not self._stop.is_set():
            try:
                did_work = self._iterate()
            except Exception:                                 # noqa: BLE001
                # an escaped error here would kill the engine thread and
                # leave every HTTP request blocked on its queue forever;
                # fail the in-flight slots and keep serving
                import traceback

                traceback.print_exc()
                for sl in self.slots:
                    if sl.state != SlotState.IDLE:
                        try:
                            if sl.seq_id >= 0:
                                self.ctx.kv.seq_rm(sl.seq_id)
                                sl.seq_id = -1
                        except Exception:                     # noqa: BLE001
                            pass
                        self._release(sl, "error")
                did_work = True
            if not did_work:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def _iterate(self) -> bool:
        # run queued side tasks first (embed/rerank/state IO)
        ran_side = False
        while True:
            try:
                task = self._side.get_nowait()
            except queue.Empty:
                break
            task()
            ran_side = True

        # admit pending requests into free slots
        while True:
            slot = self._free_slot()
            if slot is None:
                break
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            self._launch(slot, req)

        # context-shift: drop the oldest half (keeping the first cell) when a
        # lane is about to overflow (server-context.cpp:1988-2044)
        for s in self.slots:
            if s.state == SlotState.GENERATING and s.seq_id >= 0:
                lane = self.ctx.kv.lane_of(s.seq_id)
                n = self.ctx.kv.lengths[lane]
                if n >= self.ctx.kv.max_seq - 1:
                    n_keep = 1
                    n_discard = max((n - n_keep) // 2, 1)
                    try:
                        self.ctx.kv.seq_shift(self.ctx.cfg, s.seq_id,
                                              n_keep, n_discard)
                    except RuntimeError:
                        # SWA models can't context-shift (iSWA restriction);
                        # finish the slot at the context limit instead
                        self._release(s, "length")
                        continue
                    if s.draft_seq >= 0 and self.draft_ctx is not None:
                        # the draft cache can't be realigned after a target
                        # shift (positions diverge); drop it and fall back
                        # to one-token decode for the rest of this slot
                        try:
                            self.draft_ctx.kv.seq_rm(s.draft_seq)
                        except ValueError:
                            pass
                        s.draft_seq = -1

        # 1) prompt chunks. Multiple mid-prompt slots pack into ONE dispatch
        # (the reference batches prompt work across slots into a single
        # ubatch, server-context.cpp:2058+); multimodal-segment and
        # draft-model slots take the per-slot path. A failed step rolls
        # back the sequence(s) and releases with an error (the reference's
        # failed-ubatch rollback, llama-context.cpp:1620-1648)
        prompt_slots = [s for s in self.slots if s.state == SlotState.PROMPT]
        if prompt_slots:
            batchable = [
                s for s in prompt_slots
                if s.req.segments is None and s.draft_seq < 0
            ] if hasattr(self.ctx, "prefill_multi") else []
            group = batchable if len(batchable) >= 2 else prompt_slots[:1]
            try:
                if len(group) >= 2:
                    self._prompt_step_multi(group)
                else:
                    self._prompt_step(group[0])
            except Exception:                      # noqa: BLE001
                import traceback

                traceback.print_exc()
                for s in group:
                    if s.seq_id >= 0:
                        try:
                            self.ctx.kv.seq_rm(s.seq_id)
                        except (ValueError, RuntimeError):
                            pass
                        s.seq_id = -1
                    self._release(s, "error")
            return True

        # 2) batched decode for all GENERATING slots
        gen = [s for s in self.slots if s.state == SlotState.GENERATING]
        if not gen:
            return ran_side
        try:
            self._decode_step(gen)
        except Exception:                          # noqa: BLE001
            import traceback

            traceback.print_exc()
            for s in gen:
                if s.seq_id >= 0:
                    try:
                        self.ctx.kv.seq_rm(s.seq_id)
                    except (ValueError, RuntimeError):
                        pass
                    s.seq_id = -1
                self._release(s, "error")
        return True

    def _prompt_step_multi(self, slots) -> None:
        """One prompt chunk for SEVERAL slots in a single batched dispatch
        (chunks bucket-padded per lane; per-lane final-position gather)."""
        max_chunk = min(self.PROMPT_CHUNK, self.ctx.max_chunk)
        chunks = {}
        for s in slots:
            chunk = s.req.prompt_tokens[
                s.prompt_pos : s.prompt_pos + max_chunk]
            chunks[s.seq_id] = list(chunk) or [0]
        outs = self.ctx.prefill_multi(chunks)
        for s in slots:
            c = chunks[s.seq_id]
            s.prompt_pos += len(c)
            self.n_prompt_tokens += len(c)
            if s.prompt_pos >= len(s.req.prompt_tokens):
                s.last_logits = outs[s.seq_id]
                s.state = SlotState.GENERATING
                tok = self._sample_token(s)
                self._emit_probs(s, tok)
                if self._emit(s, tok):
                    self._release(s, s.finish_reason)

    def _prompt_step(self, s: Slot) -> None:
        if s.req.segments is not None:
            # multimodal: one segment per iteration (tokens or embeds)
            kind, payload = s.req.segments[s.prompt_pos]
            if kind == "embeds":
                logits = self.ctx.prefill_embeds(s.seq_id, payload)
                self.n_prompt_tokens += payload.shape[0]
            elif kind == "embeds_mrope":
                emb, grid = payload        # qwen2vl (emb, merged llm grid)
                logits = self.ctx.prefill_embeds(s.seq_id, emb,
                                                 mrope_grid=grid)
                self.n_prompt_tokens += emb.shape[0]
            else:
                logits = self.ctx.prefill(s.seq_id, list(payload) or [0],
                                          all_logits=False)
                self.n_prompt_tokens += len(payload)
            s.prompt_pos += 1
            done = s.prompt_pos >= len(s.req.segments)
        else:
            chunk = s.req.prompt_tokens[
                s.prompt_pos : s.prompt_pos + self.PROMPT_CHUNK]
            if not chunk:
                chunk = [0]  # empty prompt: feed BOS-ish placeholder
            logits = self.ctx.prefill(s.seq_id, chunk, all_logits=False)
            if s.draft_seq >= 0:
                self.draft_ctx.prefill(s.draft_seq, chunk, all_logits=False)
            s.prompt_pos += len(chunk)
            self.n_prompt_tokens += len(chunk)
            done = s.prompt_pos >= len(s.req.prompt_tokens)
        if done:
            s.last_logits = logits[-1]
            s.state = SlotState.GENERATING
            tok = self._sample_token(s)
            self._emit_probs(s, tok)
            if self._emit(s, tok):
                self._release(s, s.finish_reason)

    def _spec_eligible(self, s: Slot) -> bool:
        p = s.req.params
        if not (self.draft_ctx is not None and s.draft_seq >= 0
                and p.temperature == 0.0 and s.grammar is None
                and s.req.n_probs == 0 and p.penalty_repeat == 1.0
                and not p.penalty_freq and not p.penalty_present
                and not p.dry_multiplier and not p.mirostat
                and not self.ctx.cfg.is_recurrent
                and not self.ctx.cfg.is_hybrid):
            return False
        # a spec round feeds up to n_draft+1 tokens into the target cache
        # (and n_draft into the draft's) between context-shift checks; fall
        # back to one-token decode near the limit or cache writes past
        # max_seq would be clipped into the last slot, corrupting attention
        kv = self.ctx.kv
        if kv.lengths[kv.lane_of(s.seq_id)] + self.n_draft + 1 > kv.max_seq:
            return False
        dkv = self.draft_ctx.kv
        if dkv.lengths[dkv.lane_of(s.draft_seq)] + self.n_draft + 1 > dkv.max_seq:
            return False
        return True

    def _decode_step_spec(self, s: Slot) -> None:
        """One speculative round: draft proposes, target verifies in a single
        chunked prefill, caches roll back to the accepted length."""
        import numpy as np

        last = s.generated[-1]
        lane = self.ctx.kv.lane_of(s.seq_id)
        l0 = self.ctx.kv.lengths[lane]
        dlane = self.draft_ctx.kv.lane_of(s.draft_seq)
        d0 = self.draft_ctx.kv.lengths[dlane]

        proposal = []
        cur = last
        for _ in range(self.n_draft):
            dl = self.draft_ctx.decode({s.draft_seq: cur})[s.draft_seq]
            cur = int(np.argmax(dl))
            proposal.append(cur)
        self.n_drafted += len(proposal)

        logits = self.ctx.prefill(s.seq_id, [last] + proposal)
        accepted = []
        for i, p in enumerate(proposal):
            want = int(np.argmax(logits[i]))
            accepted.append(want)
            if want != p:
                break
        else:
            accepted.append(int(np.argmax(logits[len(proposal)])))
        self.n_draft_accepted += sum(
            1 for i in range(min(len(accepted), len(proposal)))
            if accepted[i] == proposal[i])

        # roll both caches back to "everything fed except the newest token":
        # target keeps l0 + len(accepted); the draft rewinds the whole round
        # and re-feeds [last] + accepted[:-1] (its own proposals may diverge
        # after the first rejection)
        self.ctx.kv.seq_rm(s.seq_id, p0=l0 + len(accepted))
        self.draft_ctx.kv.seq_rm(s.draft_seq, p0=d0)
        refeed = [last] + accepted[:-1]
        if refeed:
            self.draft_ctx.prefill(s.draft_seq, refeed, all_logits=False)
        s.last_logits = logits[min(len(accepted) - 1, len(proposal))]
        for tok in accepted:
            if self._emit(s, tok):
                self._release(s, s.finish_reason)
                return

    def _fast_eligible(self, s: Slot) -> bool:
        """Slot can decode via the device-side multi-token run:
        temperature/top-k/top-p/min-p sampling, repetition/frequency/
        presence penalties, logit bias, XTC and mirostat v2 run ON
        DEVICE (XTC/mirostat as static trace variants — see
        _decode_run_fn); grammar slots ride the fast path optimistically
        (tokens validated against the host PDA at flush, violations
        rewound + resampled — see _flush_fast). DRY, top-n-sigma and
        typical run on device as static trace variants (round 5); n_probs
        logprobs are served from the captured top-128 candidate rows.
        Only infill falls back to the host chain; no draft model; cache
        headroom for the whole run."""
        if not hasattr(self.ctx, "decode_run"):   # recurrent/hybrid contexts
            return False
        p = s.req.params
        n = self.ctx.DECODE_RUN_STEPS
        kv = self.ctx.kv
        if kv.slot_pos.get(kv.lane_of(s.seq_id)) is not None:
            return False     # seq_div'd lane: rope positions != slots
        if kv.mrope_delta.get(kv.lane_of(s.seq_id)):
            return False     # M-RoPE image lane: positions trail slots
        if (self.ctx._penalties_active(p)
                and 0 <= p.penalty_last_n < 2 * n):
            # (negative last_n = whole-history window, which never evicts
            # and is always fast-path safe)
            # chained runs schedule window evictions from host history,
            # which must not reach into a still-unread run's tokens
            return False
        if s.grammar is not None and not s.req.token_pieces:
            return False              # can't validate without pieces
        if p.mirostat and p.mirostat != 2:
            return False               # only v2 has a device twin
        if s.req.n_probs > 128:
            return False               # candidate capture holds top-128
        return (s.draft_seq < 0 and not s.req.infill
                and (p.top_k <= 0 or p.top_k <= 128)
                # headroom: post-dispatch length stays below the
                # context-shift trigger (max_seq-1), so a shift can never
                # fire while a run is in flight
                and kv.lengths[kv.lane_of(s.seq_id)] + n + 1 < kv.max_seq)

    @staticmethod
    def _dfa_key(req) -> tuple:
        return (getattr(req.grammar, "gbnf", "") or id(req.grammar),
                len(req.token_pieces or ()))

    def _slot_dfa(self, s: Slot):
        """(TokenDFA, state_row) when the slot's grammar has a compiled
        DFA and its CURRENT host PDA state maps to a row; else None."""
        g = s.grammar
        if g is None or getattr(g, "awaiting_trigger", False):
            return None
        dfa = _DFA_CACHE.get(self._dfa_key(s.req))
        if dfa is None:
            return None
        row = dfa.index_of(g)
        return (dfa, row) if row >= 0 else None

    def _dfa_device(self, dfa):
        """Upload (masks, trans) once per TokenDFA, padded to the model
        vocab so the kernel's [B, V] slice stays in-bounds."""
        dev = getattr(dfa, "_dev", None)
        if dev is None:
            import jax.numpy as jnp

            v = self.ctx.cfg.vocab_size
            m, t = dfa.masks, dfa.trans
            if m.shape[1] < v:
                pad = v - m.shape[1]
                m = np.pad(m, ((0, 0), (0, pad)))
                t = np.pad(t, ((0, 0), (0, pad)), constant_values=-1)
            dev = dfa._dev = (jnp.asarray(m[:, :v]), jnp.asarray(t[:, :v]))
        return dev

    def _dispatch_fast(self, gen: list, chain=None) -> dict:
        """Dispatch one device-side micro-run (DECODE_RUN_STEPS tokens per
        slot, on-device sampling + penalties). Returns the inflight
        record."""
        dfa_arg = None
        if chain is None:
            gslots = [s for s in gen if s.grammar is not None]
            if gslots:
                infos = [self._slot_dfa(s) for s in gslots]
                if all(i is not None for i in infos) and \
                        len({id(i[0]) for i in infos}) == 1:
                    gm, gt = self._dfa_device(infos[0][0])
                    dfa_arg = (gm, gt, {s.seq_id: i[1]
                                        for s, i in zip(gslots, infos)})
        handle = self.ctx.decode_run_start(
            {s.seq_id: (s.generated[-1] if chain is None else None)
             for s in gen},
            {s.seq_id: s.key for s in gen},
            {s.seq_id: s.req.params for s in gen},
            chain=chain,
            histories={s.seq_id: s.generated for s in gen},
            mus={s.seq_id: s.mirostat_mu for s in gen
                 if s.req.params.mirostat},
            dfa=dfa_arg,
        )
        # keyed by (seq_id, request id): a released lane retains its seq_id
        # as a prompt cache, so a later request on the same lane must NOT
        # match a dangling inflight run from the previous one
        items = {
            (s.seq_id, s.req.id):
                self.ctx.kv.lengths[self.ctx.kv.lane_of(s.seq_id)]
                - handle["n"]
            for s in gen
        }
        return {"handle": handle, "items": items}

    def _flush_fast(self, inf: dict) -> None:
        """Read an inflight run's tokens and emit them. Sequences whose slot
        was released while the run was in flight are skipped (their lengths
        were already rewound at release; the run's extra cache writes sit
        past the rewound length and are overwritten on reuse).

        Grammar slots ride the fast path OPTIMISTICALLY: the device run
        samples unconstrained, and each token is validated against the
        host PDA here. On the first violation the cache rewinds to just
        before the offending position, one host decode step recovers the
        logits there, and the usual mask-and-resample host path
        (_sample_token -> _grammar_check) produces the corrected token.
        Models that mostly emit grammar-legal tokens (the common case for
        JSON-schema'd outputs) keep near-fast-path throughput; a
        violation costs one extra dispatch. Chaining is disabled while
        any generating slot holds a grammar (_decode_step), so a rewind
        never invalidates an already-dispatched next run."""
        h = inf["handle"]
        # ONE batched readback: every np.asarray of a device array is a
        # separate relay round trip (~15-25 ms each). Slots that consume
        # the candidate rows (grammar validation, n_probs logprobs) fetch
        # them WITH toks/keys in the same device_get — the lazy per-array
        # fetch measured 207.7 -> 163.6 tok/s on logprobs requests.
        need_cands = any(
            s.req is not None and (s.grammar is not None
                                   or (s.req.n_probs > 0
                                       and s.req.on_probs is not None))
            for s in self.slots
            if s.state == SlotState.GENERATING
            and (s.seq_id, s.req.id) in inf["items"])
        if need_cands:
            toks_np, keys_np, cv_np, ci_np = jax.device_get(
                (h["toks"], h["keys"], h["cand_v"], h["cand_i"]))
            inf["cands"] = (cv_np, ci_np)
        else:
            toks_np, keys_np = jax.device_get((h["toks"], h["keys"]))

        def cands():
            if "cands" not in inf:
                inf["cands"] = (np.asarray(h["cand_v"]),
                                np.asarray(h["cand_i"]))
            return inf["cands"]

        for (seq_id, req_id), base in inf["items"].items():
            slot = next(
                (s for s in self.slots
                 if s.seq_id == seq_id and s.state == SlotState.GENERATING
                 and s.req is not None and s.req.id == req_id),
                None)
            if slot is None:
                continue
            lane = h["lanes"][seq_id]
            slot.key = jax.numpy.asarray(keys_np[lane])
            for i, tok in enumerate(toks_np[lane].tolist()):
                if slot.grammar is not None \
                        and not self._grammar_accepts(slot, tok):
                    # resample from the run's captured top-128 candidates:
                    # the violating step's KV cell is already correct (it
                    # held the PREVIOUS, accepted token), so only the
                    # sampled token needs replacing — no device round
                    # trips (round-4; was 1 recovery decode + 1 full-vocab
                    # masked sample per violation)
                    cv, ci = cands()
                    tok2 = self._resample_from_candidates(
                        slot, cv[lane, i], ci[lane, i],
                        seed=int(keys_np[lane][-1]) ^ (base + i))
                    if tok2 is not None:
                        self.ctx.kv.seq_rm(seq_id, p0=base + i + 1)
                        self._emit_probs_fast(slot, tok2, cv[lane, i],
                                              ci[lane, i])
                        if self._emit(slot, tok2):
                            self._release(slot, slot.finish_reason)
                        break
                    # no legal candidate in the top-128: full host path
                    self.ctx.kv.seq_rm(seq_id, p0=base + i)
                    out = self.ctx.decode({seq_id: slot.generated[-1]})
                    slot.last_logits = out[seq_id]
                    tok = self._sample_token(slot)   # masks + resamples
                    self._emit_probs(slot, tok)
                    if self._emit(slot, tok):
                        self._release(slot, slot.finish_reason)
                    break
                if slot.req.n_probs > 0 and slot.req.on_probs is not None:
                    cv, ci = cands()
                    self._emit_probs_fast(slot, tok, cv[lane, i],
                                          ci[lane, i])
                if self._emit(slot, tok):   # stop token/string or max_tokens
                    # the cache holds tokens fed through step i; rewind the
                    # overshoot past the accepted token
                    self.ctx.kv.seq_rm(seq_id, p0=base + i + 1)
                    self._release(slot, slot.finish_reason)
                    break

    def _emit_probs_fast(self, slot: Slot, token: int, vals, ids) -> None:
        """n_probs logprobs from the decode run's captured top-128
        candidate row (_emit_probs' fast-path twin): log-softmax
        renormalized over the candidates — the tail past rank 128 carries
        negligible mass and top-128 exceeds any OAI top_logprobs cap, so
        no extra device readback is needed (server-context.cpp:1959+
        populates probs from the sampler's candidate set the same way)."""
        req = slot.req
        if not req or req.n_probs <= 0 or req.on_probs is None:
            return
        v = np.asarray(vals, np.float64)
        ids = np.asarray(ids)
        m = v.max()
        lp = v - (m + np.log(np.exp(v - m).sum()))
        k = min(req.n_probs, len(ids))
        where = np.nonzero(ids == token)[0]
        # mirostat samples from the full vocab; a pick outside the
        # captured candidates reports the worst candidate's logprob
        tok_lp = float(lp[where[0]]) if len(where) else float(lp[-1])
        req.on_probs(token, tok_lp,
                     [(int(ids[j]), float(lp[j])) for j in range(k)])

    def _resample_from_candidates(self, slot: Slot, vals, ids, seed: int):
        """Grammar-violation resample over the decode run's captured
        (vals, ids) top-128 candidate row: mirrors device_sample's
        temperature/top-k/top-p/min-p math with the grammar's legality
        mask applied, advances the PDA with the pick, and returns the
        token — or None when no candidate is legal (the caller falls
        back to the full-vocab host path). Purely host-side numpy."""
        g = slot.grammar
        pieces = slot.req.token_pieces
        p = slot.req.params
        ids = np.asarray(ids)
        legal = np.zeros(len(ids), bool)
        for j, tid in enumerate(ids.tolist()):
            if tid in slot.req.stop_tokens:
                legal[j] = g.done
            else:
                piece = pieces[tid] if tid < len(pieces) else ""
                legal[j] = bool(piece) and g.accepts_text(piece)
        if not legal.any():
            return None
        v = np.asarray(vals, np.float64)
        k = min(p.top_k, len(ids)) if p.top_k > 0 else len(ids)
        allowed = np.arange(len(ids)) < k
        t = p.temperature if p.temperature > 0 else 1.0
        scaled = np.where(allowed, v / t, -np.inf)
        e = np.exp(scaled - scaled.max())
        probs = e / e.sum()
        cum = np.cumsum(probs)
        keep = allowed & ((cum - probs) < p.top_p) \
            & (probs >= p.min_p * probs.max())
        keep[0] = True
        final = keep & legal
        if not final.any():
            final = legal        # sampler filters excluded every legal one
        if p.temperature <= 0:
            j = int(np.argmax(np.where(final, v, -np.inf)))
        else:
            rng = np.random.default_rng(seed & 0x7FFFFFFF)
            gum = rng.gumbel(size=len(ids))
            j = int(np.argmax(np.where(final, scaled, -np.inf) + gum))
        tok = int(ids[j])
        if tok not in slot.req.stop_tokens:
            g.accept_text(pieces[tok] if tok < len(pieces) else "")
        return tok

    def _grammar_accepts(self, slot: Slot, token: int) -> bool:
        """Advance the slot's grammar with ``token`` if it is legal
        (mirrors _grammar_check's accept arm); False = violation."""
        g = slot.grammar
        pieces = slot.req.token_pieces
        piece = pieces[token] if pieces and token < len(pieces) else ""
        if getattr(g, "awaiting_trigger", False):
            g.feed_token(token, piece)    # unconstrained until trigger
            return True
        if token in slot.req.stop_tokens:
            return g.done                 # EOS only once grammar completes
        return bool(piece) and g.accept_text(piece)

    def _decode_step(self, gen: list) -> None:
        # pipelined device micro-runs: dispatch run N+1 (chained on run N's
        # device-resident last token) BEFORE reading run N's results, so the
        # relay round-trip hides behind device compute — the serving analog
        # of CUDA-graph decode capture (ggml-cuda.cu:2881-2930)
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            gen_set = {(s.seq_id, s.req.id) for s in gen}
            if (set(prev["items"]) == gen_set
                    and all(self._fast_eligible(s) for s in gen)
                    # grammar slots must validate (and maybe rewind) the
                    # previous run BEFORE the next one is dispatched —
                    # UNLESS the run was DFA-enforced on device (round 5:
                    # sampled tokens are legal by construction, so no
                    # rewind can occur and the chain stays valid)
                    and (all(s.grammar is None for s in gen)
                         or prev["handle"]["feats"][5])):
                self._inflight = self._dispatch_fast(
                    gen, chain=prev["handle"])
                self._flush_fast(prev)
                return
            self._flush_fast(prev)
            gen = [s for s in self.slots
                   if s.state == SlotState.GENERATING]
            if not gen:
                return
        if len(gen) == 1 and self._spec_eligible(gen[0]):
            self._decode_step_spec(gen[0])
            return
        if all(self._fast_eligible(s) for s in gen):
            self._inflight = self._dispatch_fast(gen)
            return
        step = {s.seq_id: s.generated[-1] for s in gen}
        out = self.ctx.decode(step)
        for s in gen:
            s.last_logits = out[s.seq_id]
            tok = self._sample_token(s)
            self._emit_probs(s, tok)
            if self._emit(s, tok):
                self._release(s, s.finish_reason)
