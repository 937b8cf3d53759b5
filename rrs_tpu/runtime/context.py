"""Inference context: the decode loop (llama-context.cpp analog).

Replaces llama_context::decode + graph reuse + scheduler with a small set of
jitted step functions keyed by (batch lanes, chunk length) buckets — the
TPU analog of the reference's topology-based graph reuse
(llm_graph_result::can_reuse, llama-context.cpp:1138): same bucket => same
compiled executable, zero re-trace.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import llama as llama_model
from rrs_tpu.runtime.kv_cache import KVCache
from rrs_tpu.runtime.sampler import SamplerParams, sample

# 2048 works since tcq4_matmul sizes its K-blocks against XLA's scoped-VMEM
# output placement (a <16MB custom-call OUTPUT lands in scoped vmem on top
# of the kernel's double-buffered blocks; see ops/tcq4_matmul.py)
PREFILL_BUCKETS = (16, 64, 256, 512, 1024, 2048)


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


class InferenceContext:
    """Single-model inference context over a fixed-lane KV cache."""

    def __init__(
        self,
        cfg: ModelConfig,
        weights: llama_model.ModelWeights,
        n_lanes: int = 1,
        max_seq: int = 2048,
        kv_dtype=jnp.bfloat16,
        kv_quant: str = "none",
        mesh=None,
    ):
        """``mesh``: optional jax Mesh with ("dp", "tp") axes — the product
        entry to tensor parallelism (--tp on generate/serve; the reference's
        --split-mode row, llama.h:193-197). Weights are sharded per
        parallel/sharding.py's megatron plan, KV heads over tp and lanes
        over dp, and the step functions run under shard_map."""
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from rrs_tpu.parallel import sharding as _sh

            if mesh.shape["dp"] > 1 and n_lanes % mesh.shape["dp"]:
                raise ValueError(
                    f"n_lanes={n_lanes} must be divisible by dp={mesh.shape['dp']}")
            weights = _sh.shard_weights(weights, mesh)
        self.weights = weights
        # SWA ring sizing must cover the largest prefill chunk in use; SWA
        # models cap the chunk at 512 (the reference's n_ubatch default) so
        # rings stay window+512 instead of ballooning to the top bucket
        chunk_cap = 512 if getattr(cfg, "any_swa", False) \
            else PREFILL_BUCKETS[-1]
        self.max_chunk = min(chunk_cap, max_seq)
        self.kv = KVCache.create(cfg, n_lanes, max_seq, kv_dtype,
                                 quant=kv_quant, max_chunk=self.max_chunk,
                                 tp=mesh.shape["tp"] if mesh else 1)
        self._next_seq_id = 0
        # perf counters (llama_perf_context analog, llama-context.cpp:2716)
        self.n_prefill_tokens = 0
        self.n_decode_tokens = 0
        self.t_prefill_s = 0.0
        self.t_decode_s = 0.0

        if mesh is None:
            self._step_fn = jax.jit(functools.partial(self._step, cfg))
            self._step_last_fn = jax.jit(
                functools.partial(self._step, cfg, last_only=True))
            self._step_lastidx_fn = jax.jit(
                functools.partial(self._step_lastidx, cfg))
        else:
            self._shard_kv()
            self._step_fn = self._tp_step_fn(last_only=False)
            self._step_last_fn = self._tp_step_fn(last_only=True)
            self._step_lastidx_fn = self._tp_step_fn(last_only=False,
                                                     lastidx=True)

    # -- tensor-parallel plumbing -----------------------------------------

    def _kv_pspec(self):
        from jax.sharding import PartitionSpec as P

        # MLA caches hold ONE latent kv head — replicated over tp (every
        # shard's query heads attend the same [rope | c_kv] rows); GQA
        # caches shard their kv heads over tp
        kvp = P("dp", None, None, None) if self.cfg.is_mla \
            else P("dp", "tp", None, None)
        return [(kvp, kvp) if isinstance(c, tuple) else kvp for c in self.kv.k]

    def _shard_kv(self):
        from jax.sharding import NamedSharding

        specs = self._kv_pspec()
        put = lambda c, s: jax.tree.map(
            lambda a, sp: jax.device_put(a, NamedSharding(self.mesh, sp)),
            c, s, is_leaf=lambda x: not isinstance(x, tuple))
        self.kv.k = [put(c, s) for c, s in zip(self.kv.k, specs)]
        self.kv.v = [put(c, s) for c, s in zip(self.kv.v, specs)]

    def _make_tp_step(self, last_only: bool, lastidx: bool = False,
                      pos_rank: int = 0):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from rrs_tpu.parallel import sharding as _sh

        cfg = self.cfg
        mesh = self.mesh
        lcfg = _sh._local_cfg(cfg, mesh.shape["tp"])
        wspecs = _sh.weight_pspecs(self.weights)
        kv_specs = self._kv_pspec()

        def step(weights, tokens, start_pos, lengths, k_caches, v_caches,
                 *rest):
            logits, nk, nv = InferenceContext._step(
                lcfg, weights, tokens, start_pos, lengths, k_caches,
                v_caches, last_only=last_only,
                last_idx=rest[0] if lastidx else None,
                pos_row=rest[-1] if pos_rank else None)
            # lm_head is column-parallel: gather vocab shards, drop padding
            logits = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
            return logits[..., : cfg.vocab_size], nk, nv

        in_specs = (wspecs, P("dp", None), P("dp"), P("dp"),
                    kv_specs, kv_specs)
        if lastidx:
            in_specs = in_specs + (P("dp"),)
        if pos_rank:
            # rope-position rows (seq_div / M-RoPE deltas): per-lane host
            # state, sharded over dp lanes, replicated over tp
            in_specs = in_specs + (P(*(("dp",) + (None,) * (pos_rank - 1))),)
        fn = shard_map(
            step, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P("dp", None, None), kv_specs, kv_specs),
            check_vma=False)
        return jax.jit(fn)

    def _tp_step_fn(self, last_only: bool, lastidx: bool = False,
                    pos_rank: int = 0):
        cache = getattr(self, "_tp_steps", None)
        if cache is None:
            cache = self._tp_steps = {}
        key = (last_only, lastidx, pos_rank)
        if key not in cache:
            cache[key] = self._make_tp_step(last_only, lastidx, pos_rank)
        return cache[key]

    def perf(self) -> dict:
        """llama_perf_context analog: token counts + throughput."""
        return {
            "n_p_eval": self.n_prefill_tokens,
            "n_eval": self.n_decode_tokens,
            "t_p_eval_ms": self.t_prefill_s * 1e3,
            "t_eval_ms": self.t_decode_s * 1e3,
            "pp_tok_per_s": self.n_prefill_tokens / self.t_prefill_s
            if self.t_prefill_s else 0.0,
            "tg_tok_per_s": self.n_decode_tokens / self.t_decode_s
            if self.t_decode_s else 0.0,
        }

    # -- jitted step -------------------------------------------------------

    @staticmethod
    def _step(cfg, weights, tokens, start_pos, lengths, k_caches, v_caches,
              last_only: bool = False, last_idx=None, pos_row=None):
        """tokens [B, T]; start_pos/lengths [B]. Computes causal mask, runs
        forward, returns (logits, caches). Padded token slots (token == -1)
        are masked out of the cache write by pointing their slot at position
        max_seq-1... they are instead handled by never advancing lengths.

        ``pos_row`` ([B, T] int32): absolute ROPE positions when they
        diverge from slot indices (after llama_memory_seq_div /
        self-extend); masking and cache slots stay slot-based (division
        is monotone, so slot order == position order)."""
        b, t = tokens.shape
        # the largest per-layer cache = the non-SWA (full) size; SWA layers
        # hold smaller rings and mod the slot indices themselves (attention())
        s = max(
            (c[0] if isinstance(c, tuple) else c).shape[2] for c in k_caches
        )
        pos = start_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        slots = pos  # lane-local: slot == absolute position (no wraparound yet)
        # lanes whose row is entirely padding (start_pos < 0) attend nothing
        mask_pos = jnp.where(start_pos[:, None] < 0, -1, pos)
        safe_tokens = jnp.maximum(tokens, 0)
        # Padded lanes (start_pos < 0) must not corrupt live cells: park their
        # writes at slot s-1, which any sequence reaching that position
        # overwrites with its own K/V before attending to it.
        safe_slots = jnp.where(
            start_pos[:, None] < 0, s - 1, jnp.clip(slots, 0, s - 1)
        )
        if last_only and last_idx is None:
            # serving only consumes the final position; gather before the
            # lm_head so the chunk x vocab head matmul isn't computed at all
            last_idx = jnp.full((b,), t - 1, jnp.int32)
        logits, nk, nv = llama_model.forward(
            cfg, weights, safe_tokens,
            pos if pos_row is None else pos_row,
            k_caches, v_caches, mask_pos,
            safe_slots, last_idx=last_idx,
        )
        return logits, nk, nv

    @staticmethod
    def _step_lastidx(cfg, weights, tokens, start_pos, lengths, k_caches,
                      v_caches, last_idx, pos_row=None):
        """_step variant with a traced per-lane final-position index:
        the cross-slot batched-prompt path (server-context.cpp packing
        several slots' prompt chunks into one ubatch) has a different
        chunk length per lane."""
        return InferenceContext._step(
            cfg, weights, tokens, start_pos, lengths, k_caches, v_caches,
            last_idx=last_idx, pos_row=pos_row)

    def _pos_rows(self, start_pos_np, t: int) -> np.ndarray:
        rows = np.zeros((len(start_pos_np), t), np.int32)
        for lane, st in enumerate(start_pos_np):
            if int(st) >= 0:
                rows[lane] = self.kv.positions_row(lane, int(st), t)
        return rows

    def _pos_row_kwargs(self, start_pos_np, t: int) -> dict:
        """[B, t] absolute-rope-position row when any lane's positions
        diverge from slot indices (seq_div remap or a retained M-RoPE
        delta); empty when slots == positions everywhere. Jit-kwarg form
        for the single-device step fns — mesh callers use _tp_step_fn's
        positional pos_rank variants instead."""
        if not (self.kv.slot_pos or self.kv.mrope_delta) or \
                self.mesh is not None:
            return {}
        return {"pos_row": jnp.asarray(self._pos_rows(start_pos_np, t))}

    def _run(self, tokens_np: np.ndarray, start_pos_np: np.ndarray,
             last_only: bool = False):
        fn = self._step_last_fn if last_only else self._step_fn
        # seq_div remapped some lane's positions (or an M-RoPE image
        # chunk trailed them): feed absolute rope positions per row
        # (slots/masks stay derived from start_pos)
        args = ()
        kwargs = self._pos_row_kwargs(start_pos_np, tokens_np.shape[1])
        if self.mesh is not None and (self.kv.slot_pos
                                      or self.kv.mrope_delta):
            # tp variant with a replicated pos_row operand (shard_map
            # needs a static arity; kwargs only work on the jit path)
            fn = self._tp_step_fn(last_only=last_only, pos_rank=2)
            args = (jnp.asarray(self._pos_rows(
                start_pos_np, tokens_np.shape[1])),)
        logits, nk, nv = fn(
            self.weights,
            jnp.asarray(tokens_np, jnp.int32),
            jnp.asarray(start_pos_np, jnp.int32),
            self.kv.lengths_array(),
            self.kv.k,
            self.kv.v,
            *args,
            **kwargs,
        )
        self.kv.k = nk
        self.kv.v = nv
        return logits

    # -- public API --------------------------------------------------------

    def new_sequence(self) -> int:
        seq_id = self._next_seq_id
        self._next_seq_id += 1
        self.kv.seq_new(seq_id)
        return seq_id

    def prefill(self, seq_id: int, tokens: list[int],
                all_logits: bool = True) -> np.ndarray:
        """Feed prompt tokens; returns logits [T, V] (or just the final
        position [1, V] with all_logits=False — the serving path, which
        avoids materializing GBs of [B, chunk, V])."""
        lane = self.kv.lane_of(seq_id)
        b = self.kv.n_lanes
        max_chunk = self.max_chunk
        out = []
        i = 0
        while i < len(tokens):
            chunk = tokens[i : i + max_chunk]
            t = min(_bucket(len(chunk)), max_chunk)
            tok = np.full((b, t), -1, np.int32)
            start = np.full((b,), -1, np.int32)
            tok[lane, : len(chunk)] = chunk
            start[lane] = self.kv.lengths[lane]
            import time as _time

            t0 = _time.perf_counter()
            last = not all_logits and len(chunk) == t
            logits = self._run(tok, start, last_only=last)
            if all_logits:
                out.append(np.asarray(logits[lane, : len(chunk)]))
            elif last:
                out = [np.asarray(logits[lane])]
            else:
                out = [np.asarray(logits[lane, len(chunk) - 1 : len(chunk)])]
            self.t_prefill_s += _time.perf_counter() - t0
            self.kv.lengths[lane] += len(chunk)
            self.n_prefill_tokens += len(chunk)
            i += len(chunk)
        return np.concatenate(out, axis=0)

    def prefill_logprobs(self, seq_id: int, tokens: list[int],
                         targets: list[int]) -> np.ndarray:
        """Prefill the chunk AND compute log p(targets[i] | tokens[..i]) on
        device (log-softmax + gather fused into the forward). Readback is
        [T] floats instead of the [T, V] logits tensor — through a remote
        device link the full-logits readback dominates perplexity runs
        (151936-vocab f32 logits are ~0.6 MB *per position*)."""
        lane = self.kv.lane_of(seq_id)
        b = self.kv.n_lanes
        if not hasattr(self, "_nll_fn"):
            cfg = self.cfg

            def step(weights, tokens, start_pos, lengths, k, v, tgt,
                     pos_row=None):
                logits, nk, nv = InferenceContext._step(
                    cfg, weights, tokens, start_pos, lengths, k, v,
                    pos_row=pos_row)
                lse = jax.scipy.special.logsumexp(logits, axis=-1)
                picked = jnp.take_along_axis(
                    logits, tgt[:, :, None], axis=-1)[:, :, 0]
                return picked - lse, nk, nv

            if self.mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P
                from rrs_tpu.parallel import sharding as _sh

                lcfg = _sh._local_cfg(cfg, self.mesh.shape["tp"])
                kv_specs = self._kv_pspec()

                def tp_step(weights, tokens, start_pos, lengths, k, v, tgt):
                    logits, nk, nv = InferenceContext._step(
                        lcfg, weights, tokens, start_pos, lengths, k, v)
                    logits = jax.lax.all_gather(logits, "tp", axis=-1,
                                                tiled=True)
                    logits = logits[..., : cfg.vocab_size]
                    lse = jax.scipy.special.logsumexp(logits, axis=-1)
                    picked = jnp.take_along_axis(
                        logits, tgt[:, :, None], axis=-1)[:, :, 0]
                    return picked - lse, nk, nv

                step = shard_map(
                    tp_step, mesh=self.mesh,
                    in_specs=(_sh.weight_pspecs(self.weights),
                              P("dp", None), P("dp"), P("dp"),
                              kv_specs, kv_specs, P("dp", None)),
                    out_specs=(P("dp", None), kv_specs, kv_specs),
                    check_vma=False)
            self._nll_fn = jax.jit(step)
        assert len(targets) == len(tokens)
        out = []
        i = 0
        while i < len(tokens):
            chunk = tokens[i : i + self.max_chunk]
            tchunk = targets[i : i + self.max_chunk]
            t = min(_bucket(len(chunk)), self.max_chunk)
            tok = np.full((b, t), -1, np.int32)
            tgt = np.zeros((b, t), np.int32)
            start = np.full((b,), -1, np.int32)
            tok[lane, : len(chunk)] = chunk
            tgt[lane, : len(tchunk)] = tchunk
            start[lane] = self.kv.lengths[lane]
            import time as _time

            t0 = _time.perf_counter()
            lp, nk, nv = self._nll_fn(
                self.weights, jnp.asarray(tok), jnp.asarray(start),
                self.kv.lengths_array(), self.kv.k, self.kv.v,
                jnp.asarray(tgt), **self._pos_row_kwargs(start, t))
            self.kv.k, self.kv.v = nk, nv
            out.append(np.asarray(lp[lane, : len(chunk)], np.float64))
            self.t_prefill_s += _time.perf_counter() - t0
            self.kv.lengths[lane] += len(chunk)
            self.n_prefill_tokens += len(chunk)
            i += len(chunk)
        return np.concatenate(out, axis=0)

    def prefill_multi(
        self, chunks: dict[int, list[int]],
    ) -> dict[int, np.ndarray]:
        """Pack several sequences' prompt chunks into ONE bucketed dispatch
        (the reference packs prompt work across slots into a single batch,
        server-context.cpp:2058+). Each chunk must fit max_chunk. Returns
        the final-position logits [V] per sequence."""
        assert chunks
        b = self.kv.n_lanes
        t = min(_bucket(max(len(c) for c in chunks.values())), self.max_chunk)
        tok = np.full((b, t), -1, np.int32)
        start = np.full((b,), -1, np.int32)
        last = np.zeros((b,), np.int32)
        lanes = {}
        for seq_id, c in chunks.items():
            assert 0 < len(c) <= t, (len(c), t)
            lane = self.kv.lane_of(seq_id)
            lanes[seq_id] = lane
            tok[lane, : len(c)] = c
            start[lane] = self.kv.lengths[lane]
            last[lane] = len(c) - 1
        import time as _time

        t0 = _time.perf_counter()
        fn, args = self._step_lastidx_fn, ()
        if self.mesh is not None and (self.kv.slot_pos
                                      or self.kv.mrope_delta):
            fn = self._tp_step_fn(last_only=False, lastidx=True, pos_rank=2)
            args = (jnp.asarray(self._pos_rows(start, t)),)
        logits, nk, nv = fn(
            self.weights, jnp.asarray(tok), jnp.asarray(start),
            self.kv.lengths_array(), self.kv.k, self.kv.v,
            jnp.asarray(last), *args, **self._pos_row_kwargs(start, t))
        self.kv.k, self.kv.v = nk, nv
        out = {}
        for seq_id, c in chunks.items():
            self.kv.lengths[lanes[seq_id]] += len(c)
            self.n_prefill_tokens += len(c)
            out[seq_id] = np.asarray(logits[lanes[seq_id], 0])
        self.t_prefill_s += _time.perf_counter() - t0
        return out

    def _embd_step_fn(self, pos_rank: int):
        """Build (and cache) the embedding-prefill step for ``pos_rank``:
        0 = slot positions, 2 = [B, T] remapped rope rows, 3 = [B, T, 3]
        M-RoPE rows. Separate shard_map variants because the mesh path
        needs a static in_specs tuple per arity."""
        cache = getattr(self, "_embd_steps", None)
        if cache is None:
            cache = self._embd_steps = {}
        if pos_rank in cache:
            return cache[pos_rank]
        mesh = self.mesh
        cfg = self.cfg
        if mesh is not None:
            from rrs_tpu.parallel import sharding as _sh

            cfg = _sh._local_cfg(cfg, mesh.shape["tp"])

        def step(weights, emb, start_pos, k_caches, v_caches, *rest):
            pos_row = rest[0] if pos_rank else None
            bb, t, _ = emb.shape
            s = max((c[0] if isinstance(c, tuple) else c).shape[2]
                    for c in k_caches)
            pos = start_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
            mask_pos = jnp.where(start_pos[:, None] < 0, -1, pos)
            safe_slots = jnp.where(start_pos[:, None] < 0, s - t,
                                   jnp.clip(pos, 0, s - 1))
            logits, nk, nv = llama_model.forward(
                cfg, weights, jnp.zeros((bb, t), jnp.int32),
                pos if pos_row is None else pos_row,
                k_caches, v_caches, mask_pos, safe_slots, embeds=emb)
            if mesh is not None:
                logits = jax.lax.all_gather(logits, "tp", axis=-1,
                                            tiled=True)
                logits = logits[..., : self.cfg.vocab_size]
            return logits, nk, nv

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from rrs_tpu.parallel import sharding as _sh

            kv_specs = self._kv_pspec()
            in_specs = (_sh.weight_pspecs(self.weights),
                        P("dp", None, None), P("dp"), kv_specs, kv_specs)
            if pos_rank:
                in_specs += (P(*(("dp",) + (None,) * (pos_rank - 1))),)
            step = shard_map(
                step, mesh=mesh, in_specs=in_specs,
                out_specs=(P("dp", None, None), kv_specs, kv_specs),
                check_vma=False)
        cache[pos_rank] = jax.jit(step)
        return cache[pos_rank]

    def prefill_embeds(self, seq_id: int, embeds: np.ndarray,
                       mrope_grid=None) -> np.ndarray:
        """Feed raw input embeddings [T, E] (multimodal image chunks; the
        llama_batch.embd path). Returns logits [T, V].

        ``mrope_grid`` ((gh, gw) MERGED llm grid): qwen2vl image chunks
        carry 3-channel (t, h, w) M-RoPE positions for the grid and leave
        the lane's future text positions trailing the slot index
        (kv_cache.mrope_begin_image)."""
        lane = self.kv.lane_of(seq_id)
        b = self.kv.n_lanes
        t = embeds.shape[0]
        emb = np.zeros((b, t, embeds.shape[1]), np.float32)
        start = np.full((b,), -1, np.int32)
        emb[lane] = embeds
        start[lane] = self.kv.lengths[lane]
        pos_row = None
        if mrope_grid is not None:
            # under TP the ViT ran replicated on host/device 0 and the
            # embeddings enter the sharded LLM like text does; the [B, T,
            # 3] M-RoPE rows are per-lane host state, replicated over tp
            # (mtmd.h:110-210 embedding-injection contract)
            gh, gw = mrope_grid
            assert gh * gw == t, (mrope_grid, t)
            rows = np.zeros((b, t, 3), np.int32)
            rows[lane] = self.kv.mrope_begin_image(lane, gh, gw)
            pos_row = jnp.asarray(rows)
        elif (self.kv.mrope_delta.get(lane)
                or self.kv.slot_pos.get(lane) is not None):
            rows = np.zeros((b, t), np.int32)
            rows[lane] = self.kv.positions_row(lane, self.kv.lengths[lane], t)
            pos_row = jnp.asarray(rows)
        fn = self._embd_step_fn(0 if pos_row is None else pos_row.ndim)
        extra = () if pos_row is None else (pos_row,)
        logits, nk, nv = fn(
            self.weights, jnp.asarray(emb, jnp.bfloat16),
            jnp.asarray(start, jnp.int32), self.kv.k, self.kv.v, *extra)
        self.kv.k, self.kv.v = nk, nv
        self.kv.lengths[lane] += t
        self.n_prefill_tokens += t
        return np.asarray(logits[lane])

    def decode(self, seq_tokens: dict[int, int]) -> dict[int, np.ndarray]:
        """One batched decode step: {seq_id: token} -> {seq_id: logits [V]}."""
        b = self.kv.n_lanes
        tok = np.full((b, 1), -1, np.int32)
        start = np.full((b,), -1, np.int32)
        lanes = {}
        for seq_id, token in seq_tokens.items():
            lane = self.kv.lane_of(seq_id)
            tok[lane, 0] = token
            start[lane] = self.kv.lengths[lane]
            lanes[seq_id] = lane
        import time as _time

        t0 = _time.perf_counter()
        logits = self._run(tok, start)
        out = {}
        for seq_id, lane in lanes.items():
            out[seq_id] = np.asarray(logits[lane, 0])
            self.kv.lengths[lane] += 1
            self.n_decode_tokens += 1
        self.t_decode_s += _time.perf_counter() - t0
        return out

    # -- device-side multi-token decode (serving fast path) ----------------

    # tokens/dispatch for the serving fast path; overshoot past a stop is
    # rewound (bounded waste). Measured (bench_served, real v5e): the
    # pipelined engine still pays ~26 ms of relay dispatch per run, so
    # per-token overhead scales 1/n: 16 -> 163.6 tok/s, 24 -> ~180.
    # 24 (not 32) keeps slots with the default penalty_last_n=64 window
    # on the fast path (the eviction schedule needs last_n >= 2n — see
    # _fast_eligible) and keeps streaming bursts under ~150 ms.
    DECODE_RUN_STEPS = int(os.environ.get("RRS_DECODE_RUN_STEPS", "24"))

    def _decode_run_fn(self, n_steps: int, xtc: bool = False,
                       mir: bool = False, typ: bool = False,
                       sig: bool = False, dry: bool = False,
                       gdfa: bool = False):
        """Build (and cache) the jitted n_steps-token decode+sample scan —
        the serving analog of CUDA-graph decode capture (ggml-cuda.cu:
        2881-2930): one dispatch per n_steps tokens instead of one per
        token, with on-device temperature/top-k/top-p/min-p sampling plus
        repetition/frequency/presence penalties and dense logit bias
        (llama_sampler_penalties on device: the counts vector rides the
        scan carry; the sliding-window eviction schedule is precomputed
        on host — see decode_run_start).

        ``xtc``/``mir``/``typ``/``sig``/``dry`` are static trace variants:
        when any lane in the run uses XTC, mirostat v2, typical-p,
        top-n-sigma, or DRY, the corresponding device transforms
        (device_xtc / device_mirostat / device_sample's typical arm /
        device_top_n_sigma / device_dry) are traced in; otherwise the
        base scan compiles without them (and keeps its original RNG
        stream). DRY slides a DRY_WINDOW-token ring through the scan
        carry (window capped at 256 recent tokens on the fast path —
        longer dry windows are approximated by their newest 256).

        ``gdfa``: grammar enforcement ON DEVICE via a compiled token-DFA
        (runtime/grammar.py TokenDFA): per-lane DFA state rides the scan
        carry; each step masks the full-V logits with the state's
        legality row BEFORE candidate capture (sampled tokens are legal
        by construction — no violations, no rewinds, chaining stays on)
        and steps the state through the [S, V] transition table."""
        from rrs_tpu.runtime.sampler import (device_dry, device_mirostat,
                                             device_penalties, device_sample,
                                             device_top_n_sigma, device_xtc,
                                             topk_candidates)

        cfg = self.cfg
        mesh = self.mesh
        if mesh is not None:
            from rrs_tpu.parallel import sharding as _sh

            run_cfg = _sh._local_cfg(cfg, mesh.shape["tp"])
        else:
            run_cfg = cfg

        def body(weights, token, start, keys, temp, top_k, top_p, min_p,
                 rep, frq, prs, xtc_p, xtc_t, mir_eta, mir_tau, mu0,
                 typ_p, nsig, dry_mult, dry_base, dry_allowed, dry_lastn,
                 dwin0, gmask, gtrans, gstate0, counts, bias, evict,
                 k_caches, v_caches):
            s = max((c[0] if isinstance(c, tuple) else c).shape[2]
                    for c in k_caches)
            v_ids = jnp.arange(counts.shape[-1], dtype=jnp.int32)[None, :]

            def step(carry, ev):
                tok, pos, ks, vs, kk, cnt, mu, dwin, gstate = carry
                mask_pos = jnp.where(pos[:, None] < 0, -1, pos[:, None])
                safe_slots = jnp.where(pos[:, None] < 0, s - 1,
                                       jnp.clip(pos[:, None], 0, s - 1))
                logits, nk, nv = llama_model.forward(
                    run_cfg, weights, jnp.maximum(tok[:, None], 0),
                    mask_pos, ks, vs, mask_pos, safe_slots)
                l = logits[:, 0, :].astype(jnp.float32)
                if mesh is not None:
                    l = jax.lax.all_gather(l, "tp", axis=-1, tiled=True)
                    l = l[..., : cfg.vocab_size]
                l = device_penalties(l, cnt, rep, frq, prs, bias)
                if xtc or mir:
                    nk4 = jax.vmap(lambda k_: jax.random.split(k_, 4))(kk)
                    sub, kx, km, kk = (nk4[:, 0], nk4[:, 1], nk4[:, 2],
                                       nk4[:, 3])
                else:
                    nk2 = jax.vmap(jax.random.split)(kk)
                    sub, kk = nk2[:, 0], nk2[:, 1]
                if xtc:
                    l = device_xtc(l, kx, temp, xtc_p, xtc_t)
                if sig:
                    l = device_top_n_sigma(l, nsig)
                if gdfa:
                    glive = gstate >= 0
                    srow = jnp.clip(gstate, 0, gmask.shape[0] - 1)
                    rowm = jnp.take(gmask, srow, axis=0)       # [B, V]
                    from rrs_tpu.runtime.sampler import NEG_INF
                    l = jnp.where(glive[:, None] & ~rowm[:, :l.shape[-1]],
                                  NEG_INF, l)
                # per-step candidate capture: the (vals, idx) top-128 the
                # sampler draws from rides the run outputs (tiny: n*128*8
                # bytes/lane), so a grammar-violation resample needs NO
                # device round trips (engine._flush_fast) and n_probs
                # logprobs come straight off the handle
                cv, ci = topk_candidates(l)
                if dry:
                    cv, ci = device_dry(dwin, cv, ci, dry_mult, dry_base,
                                        dry_allowed, dry_lastn)
                nxt = device_sample(l, sub, temp, top_k, top_p, min_p,
                                    cands=(cv, ci),
                                    typ_p=typ_p if typ else None)
                if mir:
                    mtok, mu2 = device_mirostat(l, km, temp, mu, mir_eta,
                                                mir_tau)
                    mir_on = mir_eta > 0
                    nxt = jnp.where(mir_on, mtok, nxt)
                    mu = jnp.where(mir_on & (pos >= 0), mu2, mu)
                nxt = jnp.where(pos < 0, tok, nxt)
                # slide the penalty window: count the sampled token in and
                # the host-scheduled evictee (-1 = none) out. Dense one-hot
                # adds — a [B, V] scatter would serialize (the KV-append
                # lesson, CLAUDE.md)
                cnt = cnt + (v_ids == nxt[:, None]).astype(cnt.dtype) \
                    - (v_ids == ev[:, None]).astype(cnt.dtype)
                if dry:
                    dwin = jnp.concatenate([dwin[:, 1:], nxt[:, None]],
                                           axis=1)
                if gdfa:
                    flat = (srow.astype(jnp.int32) * gtrans.shape[1]
                            + nxt)
                    ns = jnp.take(gtrans.reshape(-1), flat).astype(
                        jnp.int32)
                    gstate = jnp.where(glive & (pos >= 0), ns, gstate)
                npos = jnp.where(pos < 0, pos, pos + 1)
                return (nxt, npos, nk, nv, kk, cnt, mu, dwin,
                        gstate), (nxt, cv, ci)

            (tok, pos, ks, vs, kk, cnt, mu, dwin, gstate), \
                (out, cvs, cis) = jax.lax.scan(
                    step, (token, start, k_caches, v_caches, keys, counts,
                           mu0, dwin0, gstate0),
                    jnp.moveaxis(evict, 1, 0), length=n_steps)
            return (jnp.moveaxis(out, 0, 1), ks, vs, kk, cnt, mu, dwin,
                    gstate, jnp.moveaxis(cvs, 0, 1),
                    jnp.moveaxis(cis, 0, 1))

        if mesh is None:
            return jax.jit(body)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from rrs_tpu.parallel import sharding as _sh

        wspecs = _sh.weight_pspecs(self.weights)
        kv_specs = self._kv_pspec()
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(wspecs, P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                      P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                      P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                      P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                      P("dp"), P("dp", None),
                      P(None, None), P(None, None), P("dp"),
                      P("dp", None), P("dp", None), P("dp", None),
                      kv_specs, kv_specs),
            out_specs=(P("dp", None), kv_specs, kv_specs, P("dp"),
                       P("dp", None), P("dp"), P("dp", None), P("dp"),
                       P("dp", None, None), P("dp", None, None)),
            check_vma=False)
        return jax.jit(fn)

    def decode_run_start(
        self,
        seq_tokens: dict[int, int],
        keys: dict[int, jax.Array],
        params: dict[int, SamplerParams],
        n_steps: int = 0,
        chain: Optional[dict] = None,
        histories: Optional[dict] = None,
        mus: Optional[dict] = None,
        dfa: Optional[tuple] = None,   # (masks_dev [S, V] bool,
                                       #  trans_dev [S, V] i16,
                                       #  {seq_id: state_row}) — device
                                       #  grammar enforcement (TokenDFA)
    ) -> dict:
        """Dispatch (without waiting) an n_steps decode+sample run. Feeds
        each sequence's pending token and samples n_steps tokens per lane
        on device; lane lengths advance by n_steps (the final sampled token
        is NOT fed) — callers rewind with seq_rm when they accept fewer.

        ``chain``: a previous run's handle; the token/key vectors are taken
        from its device outputs, so back-to-back runs pipeline without a
        host round-trip (the relay dispatch latency hides behind device
        compute). Returns a handle {toks, keys, lanes, n}; results are
        device arrays until the caller np.asarray()s them.

        ``histories``: per-seq recent host-side token history (the slot's
        generated list) for sequences with repetition/frequency/presence
        penalties. Builds the initial [B, V] count vector (non-chained
        dispatches) and the per-step eviction schedule that slides the
        penalty window on device. Callers must keep penalty_last_n >=
        2*n_steps for chained runs (the engine gates this), or the
        evictees could be tokens sampled in the still-unread previous run,
        which the host cannot know.

        ``mus``: per-seq running mirostat-v2 mu (slot state) for mirostat
        lanes; the updated values come back in the handle's ``mu``."""
        n_steps = n_steps or self.DECODE_RUN_STEPS
        if chain is not None:
            feats = chain["feats"]
        else:
            feats = (any(p.xtc_probability > 0 for p in params.values()),
                     any(p.mirostat for p in params.values()),
                     any(p.typical_p < 1.0 for p in params.values()),
                     any(p.top_n_sigma > 0 for p in params.values()),
                     any(p.dry_multiplier > 0 for p in params.values()),
                     dfa is not None)
        if not hasattr(self, "_run_fns"):
            self._run_fns = {}
        key3 = (n_steps,) + feats
        if key3 not in self._run_fns:
            self._run_fns[key3] = self._decode_run_fn(n_steps, *feats)
        fn = self._run_fns[key3]

        b = self.kv.n_lanes
        if chain is not None:
            # chained run: everything except the tiny eviction schedule
            # derives from the previous handle's device outputs — no bulk
            # host->device uploads, so the relay round-trip is just the
            # dispatch (the uploads were the dominant serving overhead)
            tokv = chain["toks"][:, -1]
            keyv = chain["keys"]
            startv = jnp.where(chain["start"] < 0, chain["start"],
                               chain["start"] + chain["n"])
            tempv, top_kv = chain["temp"], chain["top_k"]
            top_pv, min_pv = chain["top_p"], chain["min_p"]
            repv, frqv, prsv = chain["rep"], chain["frq"], chain["prs"]
            countsv, biasv = chain["counts"], chain["bias"]
            xtcpv, xtctv = chain["xtc_p"], chain["xtc_t"]
            etav, tauv, muv = chain["eta"], chain["tau"], chain["mu"]
            typv, nsigv = chain["typ_p"], chain["nsig"]
            drymv, drybv = chain["dry_mult"], chain["dry_base"]
            dryav, drylv = chain["dry_allowed"], chain["dry_lastn"]
            dwinv = chain["dwin"]
            gmaskv, gtransv, gstatev = (chain["gmask"], chain["gtrans"],
                                        chain["gstate"])
            lanes = dict(chain["lanes"])
            evictv = self._evict_schedule(histories, lanes, chain.get(
                "params", {}), n_steps, offset=chain["n"])
        else:
            start = np.full((b,), -1, np.int32)
            temp = np.zeros((b,), np.float32)
            top_k = np.ones((b,), np.int32)
            top_p = np.ones((b,), np.float32)
            min_p = np.zeros((b,), np.float32)
            xtcp = np.zeros((b,), np.float32)
            xtct = np.full((b,), 1.0, np.float32)
            eta = np.zeros((b,), np.float32)
            tau = np.zeros((b,), np.float32)
            mu = np.zeros((b,), np.float32)
            typ = np.ones((b,), np.float32)
            nsg = np.zeros((b,), np.float32)
            drym = np.zeros((b,), np.float32)
            dryb = np.ones((b,), np.float32)
            drya = np.ones((b,), np.int32)
            dryl = np.zeros((b,), np.int32)
            from rrs_tpu.runtime.sampler import DRY_WINDOW
            dwin = np.full((b, DRY_WINDOW), -1, np.int32)
            tok = np.zeros((b,), np.int32)
            key_rows = [jax.random.PRNGKey(0)] * b
            lanes = {}
            for seq_id, token in seq_tokens.items():
                lane = self.kv.lane_of(seq_id)
                lanes[seq_id] = lane
                start[lane] = self.kv.lengths[lane]
                p = params[seq_id]
                temp[lane] = p.temperature
                top_k[lane] = min(p.top_k, 128) if p.top_k > 0 else 128
                top_p[lane] = p.top_p
                min_p[lane] = p.min_p
                if p.xtc_probability > 0:
                    xtcp[lane] = p.xtc_probability
                    xtct[lane] = p.xtc_threshold
                if p.mirostat:
                    eta[lane] = p.mirostat_eta
                    tau[lane] = p.mirostat_tau
                    mu[lane] = ((mus or {}).get(seq_id)
                                or 2.0 * p.mirostat_tau)
                typ[lane] = p.typical_p
                nsg[lane] = p.top_n_sigma
                if p.dry_multiplier > 0:
                    drym[lane] = p.dry_multiplier
                    dryb[lane] = p.dry_base
                    drya[lane] = max(1, p.dry_allowed_length)
                    dryl[lane] = DRY_WINDOW if p.penalty_last_n < 0 \
                        else min(p.penalty_last_n, DRY_WINDOW)
                    hist = (histories or {}).get(seq_id) or []
                    recent = hist[-DRY_WINDOW:]
                    if recent:
                        dwin[lane, -len(recent):] = recent
                tok[lane] = token
                key_rows[lane] = keys[seq_id]
            tokv = jnp.asarray(tok)
            keyv = jnp.stack(key_rows)
            startv = jnp.asarray(start)
            tempv = jnp.asarray(temp)
            top_kv = jnp.asarray(top_k)
            top_pv = jnp.asarray(top_p)
            min_pv = jnp.asarray(min_p)
            xtcpv, xtctv = jnp.asarray(xtcp), jnp.asarray(xtct)
            etav, tauv, muv = (jnp.asarray(eta), jnp.asarray(tau),
                               jnp.asarray(mu))
            typv, nsigv = jnp.asarray(typ), jnp.asarray(nsg)
            drymv, drybv = jnp.asarray(drym), jnp.asarray(dryb)
            dryav, drylv = jnp.asarray(drya), jnp.asarray(dryl)
            dwinv = jnp.asarray(dwin)
            if dfa is not None:
                gmaskv, gtransv, seq_states = dfa
                gstate = np.full((b,), -1, np.int32)
                for seq_id, row in seq_states.items():
                    gstate[self.kv.lane_of(seq_id)] = row
                gstatev = jnp.asarray(gstate)
            else:
                gmaskv = jnp.zeros((1, 8), jnp.bool_)
                gtransv = jnp.zeros((1, 8), jnp.int16)
                gstatev = jnp.full((b,), -1, jnp.int32)
            repv, frqv, prsv, countsv, biasv = self._penalty_operands(
                lanes, params, histories)
            evictv = self._evict_schedule(histories, lanes, params,
                                          n_steps, offset=0)

        import time as _time

        t0 = _time.perf_counter()
        toks, nk, nv, nkeys, ncounts, nmu, ndwin, ngstate, cand_v, \
            cand_i = fn(
                self.weights, tokv, startv, keyv, tempv, top_kv, top_pv,
                min_pv, repv, frqv, prsv, xtcpv, xtctv, etav, tauv, muv,
                typv, nsigv, drymv, drybv, dryav, drylv, dwinv,
                gmaskv, gtransv, gstatev,
                countsv, biasv, evictv, self.kv.k, self.kv.v)
        self.kv.k, self.kv.v = nk, nv
        for seq_id, lane in lanes.items():
            self.kv.lengths[lane] += n_steps
            self.n_decode_tokens += n_steps
        self.t_decode_s += _time.perf_counter() - t0
        return {"toks": toks, "keys": nkeys, "lanes": lanes, "n": n_steps,
                "cand_v": cand_v, "cand_i": cand_i,
                "start": startv, "temp": tempv, "top_k": top_kv,
                "top_p": top_pv, "min_p": min_pv,
                "rep": repv, "frq": frqv, "prs": prsv,
                "xtc_p": xtcpv, "xtc_t": xtctv,
                "eta": etav, "tau": tauv, "mu": nmu, "feats": feats,
                "typ_p": typv, "nsig": nsigv, "dry_mult": drymv,
                "dry_base": drybv, "dry_allowed": dryav, "dry_lastn": drylv,
                "dwin": ndwin,
                "gmask": gmaskv, "gtrans": gtransv, "gstate": ngstate,
                "counts": ncounts, "bias": biasv, "params": dict(params)}

    @staticmethod
    def _penalties_active(p) -> bool:
        # penalty_last_n == 0 disables penalties outright
        # (llama-sampling.cpp:2777 is_empty).
        return (p.penalty_last_n != 0
                and (p.penalty_repeat != 1.0 or p.penalty_freq != 0.0
                     or p.penalty_present != 0.0))

    @staticmethod
    def _pen_window(hist, last_n: int):
        """llama.cpp penalty_last_n sentinels (arg.cpp:1639): 0 disables
        (empty window), <= -1 means the whole history."""
        if last_n == 0:
            return []
        if last_n < 0:
            return hist
        return hist[-last_n:]

    def _penalty_operands(self, lanes, params, histories):
        """[B] rep/frq/prs + [B, V] counts/bias for a fresh dispatch. The
        all-identity case reuses cached device-resident zero tensors so
        penalty-free serving uploads nothing new."""
        b, v = self.kv.n_lanes, self.cfg.vocab_size
        any_pen = any(self._penalties_active(p) or p.logit_bias
                      for p in params.values())
        if not any_pen:
            if not hasattr(self, "_pen_identity"):
                self._pen_identity = (
                    jnp.ones((b,), jnp.float32),
                    jnp.zeros((b,), jnp.float32),
                    jnp.zeros((b,), jnp.float32),
                    jnp.zeros((b, v), jnp.float32),
                    jnp.zeros((b, v), jnp.float32),
                )
            return self._pen_identity
        rep = np.ones((b,), np.float32)
        frq = np.zeros((b,), np.float32)
        prs = np.zeros((b,), np.float32)
        counts = np.zeros((b, v), np.float32)
        bias = np.zeros((b, v), np.float32)
        for seq_id, p in params.items():
            lane = lanes[seq_id]
            if self._penalties_active(p):
                rep[lane] = p.penalty_repeat
                frq[lane] = p.penalty_freq
                prs[lane] = p.penalty_present
                hist = (histories or {}).get(seq_id, [])
                for t in self._pen_window(hist, p.penalty_last_n):
                    if 0 <= t < v:
                        counts[lane, t] += 1
            for tid, bval in p.logit_bias:
                if 0 <= int(tid) < v:
                    bias[lane, int(tid)] += float(bval)
        return (jnp.asarray(rep), jnp.asarray(frq), jnp.asarray(prs),
                jnp.asarray(counts), jnp.asarray(bias))

    def _evict_schedule(self, histories, lanes, params, n_steps, offset):
        """[B, n_steps] int32 token ids leaving the penalty window after
        each sampled step (-1 = none). ``offset`` is the number of
        device-sampled tokens the host history does not yet include
        (chained runs: the previous, still-unread run's n)."""
        any_pen = (any(self._penalties_active(p) for p in params.values())
                   if params else False)
        if not any_pen or not histories:
            if not hasattr(self, "_evict_none"):
                self._evict_none = {}
            key = n_steps
            if key not in self._evict_none:
                self._evict_none[key] = jnp.full(
                    (self.kv.n_lanes, n_steps), -1, jnp.int32)
            return self._evict_none[key]
        ev = np.full((self.kv.n_lanes, n_steps), -1, np.int32)
        for seq_id, hist in histories.items():
            p = params.get(seq_id)
            if p is None or not self._penalties_active(p):
                continue
            if p.penalty_last_n < 0:          # whole-history window: no
                continue                      # token ever leaves it
            lane = lanes[seq_id]
            true_len = len(hist) + offset
            for i in range(n_steps):
                e = true_len + i - p.penalty_last_n
                if 0 <= e < len(hist):
                    ev[lane, i] = hist[e]
        return jnp.asarray(ev)

    def decode_run(
        self,
        seq_tokens: dict[int, int],
        keys: dict[int, jax.Array],
        params: dict[int, SamplerParams],
        n_steps: int = 0,
    ) -> tuple[dict[int, np.ndarray], dict[int, jax.Array]]:
        """Synchronous decode_run_start: returns ({seq: [n] tokens},
        {seq: key'})."""
        h = self.decode_run_start(seq_tokens, keys, params, n_steps)
        # (host histories omitted: callers of the synchronous helper do
        # plain sampling; the engine passes histories for penalty slots)
        toks_np = np.asarray(h["toks"])
        out = {s: toks_np[lane] for s, lane in h["lanes"].items()}
        out_keys = {s: h["keys"][lane] for s, lane in h["lanes"].items()}
        return out, out_keys

    def embed(self, tokens: list[int], pooling: str = "mean") -> np.ndarray:
        """Sequence embedding from the final hidden state (llama_encode +
        pooling analog; causal-LM contexts support mean/last pooling).
        Runs a standalone forward without the LM head or persistent cache."""
        import jax

        run_cfg = self.cfg
        if self.mesh is not None:
            from rrs_tpu.parallel import sharding as _sh

            run_cfg = _sh._local_cfg(self.cfg, self.mesh.shape["tp"])

        def hidden(w, toks):
            from rrs_tpu.models import llama as llama_model
            from rrs_tpu.ops.basic import rms_norm

            b, t = toks.shape
            pos = jnp.arange(t, dtype=jnp.int32)[None, :]
            kc, vc = llama_model.scratch_caches(run_cfg, b, t)
            attn_fn = llama_model.mla_attention if run_cfg.is_mla \
                else llama_model.attention
            x = llama_model.embed_rows(w.embed, toks)
            for li, lw in enumerate(w.layers):
                h = rms_norm(x, lw.attn_norm, run_cfg.rms_eps)
                attn_out, kc[li], vc[li] = attn_fn(
                    run_cfg, lw, h, pos, kc[li], vc[li], pos, pos, li=li)
                x = x + attn_out
                h = rms_norm(x, lw.ffn_norm, run_cfg.rms_eps)
                x = x + llama_model.ffn(run_cfg, lw, h, li=li)
            return rms_norm(x, w.final_norm, run_cfg.rms_eps)

        # cache the jitted forward: a fresh jit per call would retrace and
        # recompile the whole model on EVERY /v1/embeddings request
        fn = getattr(self, "_embed_fn", None)
        if fn is None:
            if self.mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P
                from rrs_tpu.parallel import sharding as _sh

                fn = jax.jit(shard_map(
                    hidden, mesh=self.mesh,
                    in_specs=(_sh.weight_pspecs(self.weights), P(None, None)),
                    out_specs=P(None, None, None),
                    check_vma=False))
            else:
                fn = jax.jit(hidden)
            self._embed_fn = fn
        hs = np.asarray(fn(
            self.weights, jnp.asarray(np.asarray(tokens, np.int32)[None, :])
        ))[0]
        if pooling == "last":
            v = hs[-1]
        else:
            v = hs.mean(axis=0)
        return v.astype(np.float32)

    def generate(
        self,
        prompt: list[int],
        max_new_tokens: int,
        params: Optional[SamplerParams] = None,
        stop_tokens: tuple[int, ...] = (),
    ) -> list[int]:
        """Simple single-sequence generation loop (tools/completion analog)."""
        params = params or SamplerParams(temperature=0.0)
        seq = self.new_sequence()
        logits = self.prefill(seq, prompt)
        key = jax.random.PRNGKey(params.seed)
        out = []
        last = logits[-1:]
        for _ in range(max_new_tokens):
            key, sub = jax.random.split(key)
            token = int(sample(jnp.asarray(last), sub, params)[0])
            if token in stop_tokens:
                break
            out.append(token)
            step_logits = self.decode({seq: token})
            last = step_logits[seq][None, :]
        self.kv.seq_rm(seq)
        return out
