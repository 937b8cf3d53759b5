"""KV cache: device ring buffers + host-side cell bookkeeping.

TPU-native redesign of llama-kv-cache.{h,cpp} / llama-kv-cells.h: the logical
"cells" state (which sequence owns which slot, positions, lengths) is plain
host Python; the device state is static-shaped per-layer [B, S, Hkv, D]
arrays updated with scatters inside the jitted step. Each batch lane is a
stream (the reference's non-unified `n_stream` mode, llama-kv-cache.h:221):
one sequence owns one lane, so seq_rm/seq_cp are O(1) host ops on lane
metadata plus optional device copies.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rrs_tpu.models.config import ModelConfig


@dataclasses.dataclass
class KVCache:
    """Per-layer K/V device arrays plus host-side lane state."""

    k: list[jnp.ndarray]          # L x [B, Hkv, S, D] (kv-head-major)
    v: list[jnp.ndarray]
    max_seq: int
    # host-side cell state per lane
    lengths: list[int]            # tokens currently stored per lane
    seq_ids: list[Optional[int]]  # sequence occupying each lane (None = free)

    @property
    def n_lanes(self) -> int:
        return self.k[0].shape[0]

    @classmethod
    def create(
        cls,
        cfg: ModelConfig,
        n_lanes: int,
        max_seq: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (n_lanes, cfg.n_kv_heads, max_seq, cfg.head_dim)
        k = [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]
        v = [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]
        return cls(k=k, v=v, max_seq=max_seq,
                   lengths=[0] * n_lanes, seq_ids=[None] * n_lanes)

    # -- host-side cell ops (llama_memory_seq_* analogs) -------------------

    def find_free_lane(self) -> Optional[int]:
        for i, s in enumerate(self.seq_ids):
            if s is None:
                return i
        return None

    def lane_of(self, seq_id: int) -> int:
        return self.seq_ids.index(seq_id)

    def seq_new(self, seq_id: int) -> int:
        lane = self.find_free_lane()
        if lane is None:
            raise RuntimeError("KV cache: no free lane")
        self.seq_ids[lane] = seq_id
        self.lengths[lane] = 0
        return lane

    def seq_rm(self, seq_id: int, p0: int = 0) -> None:
        """Remove positions >= p0 of a sequence (llama_memory_seq_rm semantics
        for suffix removal; p0=0 frees the lane)."""
        lane = self.lane_of(seq_id)
        if p0 == 0:
            self.seq_ids[lane] = None
            self.lengths[lane] = 0
        else:
            self.lengths[lane] = min(self.lengths[lane], p0)

    def seq_cp(self, src_seq: int, dst_seq: int) -> None:
        """Fork a sequence into a fresh lane (prompt-sharing / speculative)."""
        src = self.lane_of(src_seq)
        dst = self.seq_new(dst_seq)
        n = self.lengths[src]
        for li in range(len(self.k)):
            self.k[li] = self.k[li].at[dst, :, :n].set(self.k[li][src, :, :n])
            self.v[li] = self.v[li].at[dst, :, :n].set(self.v[li][src, :, :n])
        self.lengths[dst] = n

    def seq_keep(self, seq_id: int) -> None:
        for s in list(self.seq_ids):
            if s is not None and s != seq_id:
                self.seq_rm(s)

    def lengths_array(self) -> jnp.ndarray:
        return jnp.asarray(self.lengths, jnp.int32)
