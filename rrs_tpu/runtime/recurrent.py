"""Recurrent-state memory + context for Mamba-family models — the
llama-memory-recurrent.cpp analog.

Device state per layer per lane: conv_state [d_conv-1, d_inner] and
ssm_state [d_inner, d_state]; host state is the same lane bookkeeping as
KVCache (one sequence per lane = the reference's rs_cell per seq). The
reference's constraint carries over: a recurrent state cannot be rewound to
an arbitrary position (llama_memory_recurrent::seq_rm only supports full
removal or tail-keep), so seq_rm with 0 < p0 < length raises.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import mamba as mamba_model
from rrs_tpu.runtime.sampler import SamplerParams, sample

PREFILL_CHUNK = 128


class RecurrentCache:
    """Lane-based recurrent state store (duck-types KVCache's host API)."""

    def __init__(self, cfg: ModelConfig, n_lanes: int, max_seq: int,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.max_seq = max_seq
        if cfg.rwkv_head_size > 0:
            # RWKV6: .conv holds the token-shift pair [2, E]; .ssm holds the
            # wkv linear-attention state [H, D, D]
            h = cfg.n_embd // cfg.rwkv_head_size
            shape_c = (n_lanes, 2, cfg.n_embd)
            shape_s = (n_lanes, h, cfg.rwkv_head_size, cfg.rwkv_head_size)
        else:
            shape_c = (n_lanes, cfg.ssm_d_conv - 1, cfg.ssm_d_inner)
            shape_s = (n_lanes, cfg.ssm_d_inner, cfg.ssm_d_state)
        self.conv = [jnp.zeros(shape_c, dtype) for _ in range(cfg.n_layers)]
        self.ssm = [jnp.zeros(shape_s, jnp.float32) for _ in range(cfg.n_layers)]
        self.lengths = [0] * n_lanes
        self.seq_ids: list[Optional[int]] = [None] * n_lanes
        self.retained: dict = {}
        self.sizes = [max_seq] * cfg.n_layers

    @property
    def n_lanes(self) -> int:
        return self.conv[0].shape[0]

    @property
    def quantized(self) -> bool:
        return False

    # -- host-side lane ops (mirror KVCache) -------------------------------

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
            raise RuntimeError("recurrent cache: no free lane")
        self.seq_ids[lane] = seq_id
        self.lengths[lane] = 0
        # zero the lane's states
        for li in range(len(self.conv)):
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
            pass          # nothing to remove
        else:
            # the recurrent state cannot be rewound mid-sequence
            # (llama_memory_recurrent::seq_rm restriction)
            raise RuntimeError(
                "recurrent memory cannot remove a sequence suffix")

    def seq_cp(self, src_seq: int, dst_seq: int) -> None:
        src = self.lane_of(src_seq)
        dst = self.seq_new(dst_seq)
        for li in range(len(self.conv)):
            self.conv[li] = self.conv[li].at[dst].set(self.conv[li][src])
            self.ssm[li] = self.ssm[li].at[dst].set(self.ssm[li][src])
        self.lengths[dst] = self.lengths[src]

    def seq_keep(self, seq_id: int) -> None:
        for s in list(self.seq_ids):
            if s is not None and s != seq_id:
                self.seq_rm(s)

    def seq_shift(self, cfg, seq_id, n_keep, n_discard):
        raise RuntimeError("context shift is not supported for recurrent models")


class RecurrentContext:
    """InferenceContext counterpart for recurrent models (same surface the
    engine/CLI use: prefill / decode / generate / new_sequence / kv)."""

    def __init__(self, cfg: ModelConfig, weights, n_lanes: int = 1,
                 max_seq: int = 4096, kv_dtype=jnp.bfloat16, kv_quant="none"):
        self.cfg = cfg
        self.weights = weights
        self.kv = RecurrentCache(cfg, n_lanes, max_seq, dtype=kv_dtype)
        self._next_seq_id = 0
        self.n_prefill_tokens = 0
        self.n_decode_tokens = 0
        self._step_fn = jax.jit(functools.partial(self._step, cfg))

    @staticmethod
    def _step(cfg, weights, tokens, active, conv_states, ssm_states):
        if cfg.rwkv_head_size > 0:
            from rrs_tpu.models import rwkv6 as rwkv_model

            return rwkv_model.forward(cfg, weights, tokens, conv_states,
                                      ssm_states, active=active)
        logits, nc, ns = mamba_model.forward(
            cfg, weights, tokens, conv_states, ssm_states, active=active)
        return logits, nc, ns

    def _run(self, tokens_np: np.ndarray, active_np: np.ndarray):
        logits, nc, ns = self._step_fn(
            self.weights,
            jnp.asarray(tokens_np, jnp.int32),
            jnp.asarray(active_np, bool),
            self.kv.conv, self.kv.ssm,
        )
        self.kv.conv = nc
        self.kv.ssm = ns
        return logits

    # -- public API ---------------------------------------------------------

    def new_sequence(self) -> int:
        seq_id = self._next_seq_id
        self._next_seq_id += 1
        self.kv.seq_new(seq_id)
        return seq_id

    def prefill(self, seq_id: int, tokens: list[int],
                all_logits: bool = True) -> np.ndarray:
        """Chunked prefill. The recurrent state advances exactly one step per
        token, so chunks are EXACT sizes (no padding): PREFILL_CHUNK-sized
        chunks, then power-of-two tail pieces -> at most log2 jit shapes."""
        lane = self.kv.lane_of(seq_id)
        b = self.kv.n_lanes
        out = []
        i = 0
        while i < len(tokens):
            rem = len(tokens) - i
            step = PREFILL_CHUNK if rem >= PREFILL_CHUNK \
                else 1 << (rem.bit_length() - 1)
            chunk = tokens[i : i + step]
            tok = np.zeros((b, step), np.int32)
            act = np.zeros((b,), bool)
            tok[lane, :] = chunk
            act[lane] = True
            logits = self._run(tok, act)
            out.append(np.asarray(logits[lane, :step]))
            self.kv.lengths[lane] += step
            self.n_prefill_tokens += step
            i += step
        res = np.concatenate(out, axis=0)
        return res if all_logits else res[-1:]

    def decode(self, seq_tokens: dict[int, int]) -> dict[int, np.ndarray]:
        b = self.kv.n_lanes
        tok = np.zeros((b, 1), np.int32)
        act = np.zeros((b,), bool)
        lanes = {}
        for seq_id, token in seq_tokens.items():
            lane = self.kv.lane_of(seq_id)
            tok[lane, 0] = token
            act[lane] = True
            lanes[seq_id] = lane
        logits = self._run(tok, act)
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
            # pool over nothing useful for recurrent: use final ssm state mean
            lane = self.kv.lane_of(seq)
            v = np.asarray(self.kv.ssm[-1][lane]).mean(axis=-1).reshape(-1)
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


def make_context(cfg: ModelConfig, weights, **kw):
    """Context factory: hybrid vs recurrent vs attention (the memory-variant
    switch in llama_model::create_memory)."""
    if cfg.is_hybrid or cfg.is_recurrent:
        if kw.get("mesh") is not None:
            raise NotImplementedError(
                "--tp/--dp is not yet supported for recurrent/hybrid models")
        kw.pop("mesh", None)
    if cfg.is_hybrid:
        from rrs_tpu.runtime.hybrid import HybridContext

        return HybridContext(cfg, weights, **kw)
    if cfg.is_recurrent:
        return RecurrentContext(cfg, weights, **kw)
    from rrs_tpu.runtime.context import InferenceContext

    return InferenceContext(cfg, weights, **kw)
