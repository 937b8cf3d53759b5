"""Hybrid memory + context (llama-memory-hybrid.cpp analog): attention
layers get KV lanes, recurrent layers get conv/ssm state lanes, one unified
lane bookkeeping. Same restrictions as the recurrent memory: no mid-sequence
rewind, no context shift."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import hybrid as hybrid_model
from rrs_tpu.runtime.sampler import SamplerParams, sample

PREFILL_CHUNK = 128


class HybridCache:
    """Per-layer: (k, v) for attention layers, (conv, ssm) for recurrent."""

    def __init__(self, cfg: ModelConfig, kinds: list[str], n_lanes: int,
                 max_seq: int, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.kinds = kinds
        self.max_seq = max_seq
        self.k, self.v, self.conv, self.ssm = [], [], [], []
        for kind in kinds:
            if kind == "attn":
                shape = (n_lanes, cfg.n_kv_heads, max_seq, cfg.head_dim)
                self.k.append(jnp.zeros(shape, dtype))
                self.v.append(jnp.zeros(shape, dtype))
                self.conv.append(None)
                self.ssm.append(None)
            else:
                self.k.append(None)
                self.v.append(None)
                self.conv.append(jnp.zeros(
                    (n_lanes, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), dtype))
                self.ssm.append(jnp.zeros(
                    (n_lanes, cfg.ssm_d_inner, cfg.ssm_d_state), jnp.float32))
        self.lengths = [0] * n_lanes
        self.seq_ids: list[Optional[int]] = [None] * n_lanes
        self.retained: dict = {}
        self.sizes = [max_seq] * cfg.n_layers

    @property
    def n_lanes(self) -> int:
        return len(self.lengths)

    @property
    def quantized(self) -> bool:
        return False

    def find_free_lane(self):
        for i, s in enumerate(self.seq_ids):
            if s is None:
                return i
        return None

    def lane_of(self, seq_id: int) -> int:
        return self.seq_ids.index(seq_id)

    def has_seq(self, seq_id: int) -> bool:
        return seq_id in self.seq_ids

    def mark_retained(self, seq_id: int) -> None:
        import time

        if seq_id in self.seq_ids:
            self.retained[seq_id] = time.monotonic()

    def unmark_retained(self, seq_id: int) -> None:
        self.retained.pop(seq_id, None)

    def seq_new(self, seq_id: int) -> int:
        lane = self.find_free_lane()
        if lane is None and self.retained:
            victim = min(self.retained, key=self.retained.get)
            self.seq_rm(victim)
            lane = self.find_free_lane()
        if lane is None:
            raise RuntimeError("hybrid cache: no free lane")
        self.seq_ids[lane] = seq_id
        self.lengths[lane] = 0
        for li, kind in enumerate(self.kinds):
            if kind != "attn":
                self.conv[li] = self.conv[li].at[lane].set(0)
                self.ssm[li] = self.ssm[li].at[lane].set(0)
        return lane

    def seq_rm(self, seq_id: int, p0: int = 0) -> None:
        lane = self.lane_of(seq_id)
        if p0 == 0:
            self.seq_ids[lane] = None
            self.lengths[lane] = 0
            self.retained.pop(seq_id, None)
        elif p0 >= self.lengths[lane]:
            pass
        else:
            raise RuntimeError(
                "hybrid memory cannot remove a sequence suffix "
                "(recurrent layers cannot rewind)")

    def seq_cp(self, src_seq: int, dst_seq: int) -> None:
        src = self.lane_of(src_seq)
        dst = self.seq_new(dst_seq)
        for li, kind in enumerate(self.kinds):
            if kind == "attn":
                self.k[li] = self.k[li].at[dst].set(self.k[li][src])
                self.v[li] = self.v[li].at[dst].set(self.v[li][src])
            else:
                self.conv[li] = self.conv[li].at[dst].set(self.conv[li][src])
                self.ssm[li] = self.ssm[li].at[dst].set(self.ssm[li][src])
        self.lengths[dst] = self.lengths[src]

    def seq_keep(self, seq_id: int) -> None:
        for s in list(self.seq_ids):
            if s is not None and s != seq_id:
                self.seq_rm(s)

    def seq_shift(self, cfg, seq_id, n_keep, n_discard):
        raise RuntimeError("context shift is not supported for hybrid models")

    def lengths_array(self):
        return jnp.asarray(self.lengths, jnp.int32)


class HybridContext:
    """Context for Jamba-style models (same surface as InferenceContext)."""

    def __init__(self, cfg: ModelConfig, weights, n_lanes: int = 1,
                 max_seq: int = 4096, kv_dtype=jnp.bfloat16, kv_quant="none"):
        self.cfg = cfg
        self.weights = weights
        kinds = [l.kind for l in weights.layers]
        self.kv = HybridCache(cfg, kinds, n_lanes, max_seq, dtype=kv_dtype)
        self._next_seq_id = 0
        self.n_prefill_tokens = 0
        self.n_decode_tokens = 0
        self._step_fn = jax.jit(functools.partial(self._step, cfg))

    @staticmethod
    def _step(cfg, weights, tokens, start_pos, k, v, conv, ssm):
        b, t = tokens.shape
        smax = max((c.shape[2] for c in k if c is not None), default=1)
        pos = start_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        mask_pos = jnp.where(start_pos[:, None] < 0, -1, pos)
        safe_slots = jnp.where(start_pos[:, None] < 0, smax - t,
                               jnp.clip(pos, 0, smax - 1))
        return hybrid_model.forward(
            cfg, weights, jnp.maximum(tokens, 0), pos, k, v, conv, ssm,
            mask_pos, safe_slots)

    def _run(self, tokens_np, start_np):
        logits, nk, nv, nc, ns = self._step_fn(
            self.weights,
            jnp.asarray(tokens_np, jnp.int32),
            jnp.asarray(start_np, jnp.int32),
            self.kv.k, self.kv.v, self.kv.conv, self.kv.ssm,
        )
        self.kv.k, self.kv.v = nk, nv
        self.kv.conv, self.kv.ssm = nc, ns
        return logits

    def new_sequence(self) -> int:
        seq_id = self._next_seq_id
        self._next_seq_id += 1
        self.kv.seq_new(seq_id)
        return seq_id

    def prefill(self, seq_id: int, tokens: list[int],
                all_logits: bool = True) -> np.ndarray:
        """Exact-size chunks (recurrent layers advance per real token)."""
        lane = self.kv.lane_of(seq_id)
        b = self.kv.n_lanes
        out = []
        i = 0
        while i < len(tokens):
            rem = len(tokens) - i
            step = PREFILL_CHUNK if rem >= PREFILL_CHUNK \
                else 1 << (rem.bit_length() - 1)
            tok = np.zeros((b, step), np.int32)
            start = np.full((b,), -1, np.int32)
            tok[lane, :] = tokens[i : i + step]
            start[lane] = self.kv.lengths[lane]
            logits = self._run(tok, start)
            out.append(np.asarray(logits[lane, :step]))
            self.kv.lengths[lane] += step
            self.n_prefill_tokens += step
            i += step
        res = np.concatenate(out, axis=0)
        return res if all_logits else res[-1:]

    def decode(self, seq_tokens: dict[int, int]) -> dict[int, np.ndarray]:
        b = self.kv.n_lanes
        tok = np.zeros((b, 1), np.int32)
        start = np.full((b,), -1, np.int32)
        lanes = {}
        for seq_id, token in seq_tokens.items():
            lane = self.kv.lane_of(seq_id)
            tok[lane, 0] = token
            start[lane] = self.kv.lengths[lane]
            lanes[seq_id] = lane
        logits = self._run(tok, start)
        out = {}
        for seq_id, lane in lanes.items():
            out[seq_id] = np.asarray(logits[lane, 0])
            self.kv.lengths[lane] += 1
            self.n_decode_tokens += 1
        return out

    def embed(self, tokens: list[int], pooling: str = "mean") -> np.ndarray:
        seq = self.new_sequence()
        try:
            self.prefill(seq, tokens)
            lane = self.kv.lane_of(seq)
            for li, kind in enumerate(self.kv.kinds):
                if kind != "attn":
                    v = np.asarray(self.kv.ssm[li][lane]).mean(axis=-1)
                    break
            else:
                v = np.zeros((self.cfg.n_embd,), np.float32)
        finally:
            self.kv.seq_rm(seq)
        return v.astype(np.float32)

    def generate(self, prompt, max_new_tokens, params=None, stop_tokens=()):
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
