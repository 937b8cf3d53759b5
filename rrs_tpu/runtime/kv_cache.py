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

    k: list[jnp.ndarray]          # L x [B, Hkv, S_l, D] (kv-head-major)
    v: list[jnp.ndarray]
    max_seq: int
    # host-side cell state per lane
    lengths: list[int]            # tokens currently stored per lane
    seq_ids: list[Optional[int]]  # sequence occupying each lane (None = free)
    # per-layer cache sizes; SWA layers get small RING caches (the iSWA
    # two-cache design, llama-kv-cache-iswa.cpp — here generalized per layer)
    sizes: list[int] = dataclasses.field(default_factory=list)
    # seq_id -> retention timestamp: lanes kept alive as prompt caches but
    # evictable LRU when a new sequence needs a lane (server prompt-cache)
    retained: dict = dataclasses.field(default_factory=dict)
    # lane -> np.ndarray [max_seq] slot->position map; None = identity
    # (positions == slots, the fast default). Only llama_memory_seq_div
    # (self-extend) makes this non-trivial.
    slot_pos: dict = dataclasses.field(default_factory=dict)
    # lane -> int M-RoPE text-position delta (qwen2vl): after an image
    # chunk, text positions resume at base + max(gh, gw), which trails the
    # slot index — positions = slot + delta for all future text tokens
    # (HF Qwen2VL get_rope_index / mtmd M-RoPE position tracking)
    mrope_delta: dict = dataclasses.field(default_factory=dict)

    @property
    def n_lanes(self) -> int:
        k0 = self.k[0][0] if isinstance(self.k[0], tuple) else self.k[0]
        return k0.shape[0]

    @property
    def quantized(self) -> bool:
        return isinstance(self.k[0], tuple)

    @classmethod
    def create(
        cls,
        cfg: ModelConfig,
        n_lanes: int,
        max_seq: int,
        dtype=jnp.bfloat16,
        quant: str = "none",      # "none" | "q8" | "q4" (values + f32 scales)
        max_chunk: int = 512,     # largest ubatch; bounds SWA ring size
        tp: int = 1,              # tensor-parallel degree sharding the
                                  # kv-head axis (head-pair q4 packing
                                  # must keep Hkv/2 divisible by tp)
    ) -> "KVCache":
        # SWA layers only need window + max_chunk slots: within one ubatch a
        # later token may overwrite a ring slot, so the ring must be at least
        # window + T - 1 long for every attended slot to survive the batch
        sizes = []
        for li in range(cfg.n_layers):
            if cfg.is_swa(li):
                ring = -(-(cfg.swa_window + max_chunk) // 128) * 128
                sizes.append(min(max_seq, ring))
            else:
                sizes.append(max_seq)

        def make(li, dim):
            # MLA (deepseek2): ONE kv head of [rope | c_kv] (dim = rope+r)
            # for K and the bare c_kv (dim = r) for V; else per-kv-head
            # [head_dim] K and V (cfg.kv_cache_heads/kv_k_dim/kv_v_dim)
            shape = (n_lanes, cfg.kv_cache_heads, sizes[li], dim)
            sshape = (n_lanes, cfg.kv_cache_heads, 1, sizes[li])
            if quant == "q8":
                return (jnp.zeros(shape, jnp.int8),
                        jnp.ones(sshape, jnp.float32))
            if quant == "q4":
                # packed nibbles: head-pair layout (full-lane kernel
                # tiles) for even head counts, halves fallback otherwise
                # — see runtime/kv_codec.py. Under TP the head axis is
                # sharded, so the Hkv/2 packed planes must still divide
                # by tp or device_put/shard_map would reject the array.
                if (cfg.kv_cache_heads % 2 == 0 and not cfg.is_mla
                        and (cfg.kv_cache_heads // 2) % max(tp, 1) == 0):
                    return (jnp.zeros((n_lanes, cfg.kv_cache_heads // 2,
                                       sizes[li], dim), jnp.uint8),
                            jnp.ones(sshape, jnp.float32))
                return (jnp.zeros(shape[:-1] + (dim // 2,),
                                  jnp.uint8),
                        jnp.ones(sshape, jnp.float32))
            return jnp.zeros(shape, dtype)

        k = [make(li, cfg.kv_k_dim) for li in range(cfg.n_layers)]
        v = [make(li, cfg.kv_v_dim) for li in range(cfg.n_layers)]
        return cls(k=k, v=v, max_seq=max_seq,
                   lengths=[0] * n_lanes, seq_ids=[None] * n_lanes,
                   sizes=sizes)

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
        if lane is None and self.retained:
            # evict the least-recently-retained prompt cache
            victim = min(self.retained, key=self.retained.get)
            self.seq_rm(victim)
            lane = self.find_free_lane()
        if lane is None:
            raise RuntimeError("KV cache: no free lane")
        self.seq_ids[lane] = seq_id
        self.lengths[lane] = 0
        self.slot_pos.pop(lane, None)
        self.mrope_delta.pop(lane, None)
        return lane

    def mark_retained(self, seq_id: int) -> None:
        import time

        if seq_id in self.seq_ids:
            self.retained[seq_id] = time.monotonic()

    def unmark_retained(self, seq_id: int) -> None:
        self.retained.pop(seq_id, None)

    def has_seq(self, seq_id: int) -> bool:
        return seq_id in self.seq_ids

    def seq_rm(self, seq_id: int, p0: int = 0) -> None:
        """Remove positions >= p0 of a sequence (llama_memory_seq_rm semantics
        for suffix removal; p0=0 frees the lane)."""
        lane = self.lane_of(seq_id)
        if p0 == 0:
            self.seq_ids[lane] = None
            self.lengths[lane] = 0
            self.retained.pop(seq_id, None)
            self.slot_pos.pop(lane, None)
            self.mrope_delta.pop(lane, None)
        else:
            self.lengths[lane] = min(self.lengths[lane], p0)

    def seq_cp(self, src_seq: int, dst_seq: int) -> None:
        """Fork a sequence into a fresh lane (prompt-sharing / speculative)."""
        src = self.lane_of(src_seq)
        dst = self.seq_new(dst_seq)
        n = self.lengths[src]

        def cp(c):
            # whole-lane copy: correct for both linear and ring (SWA) layers
            if isinstance(c, tuple):
                arr, sc = c
                arr = arr.at[dst].set(arr[src])
                sc = sc.at[dst].set(sc[src])
                return (arr, sc)
            return c.at[dst].set(c[src])

        for li in range(len(self.k)):
            self.k[li] = cp(self.k[li])
            self.v[li] = cp(self.v[li])
        self.lengths[dst] = n
        if src in self.slot_pos:
            self.slot_pos[dst] = self.slot_pos[src].copy()
        if src in self.mrope_delta:
            self.mrope_delta[dst] = self.mrope_delta[src]

    def seq_keep(self, seq_id: int) -> None:
        for s in list(self.seq_ids):
            if s is not None and s != seq_id:
                self.seq_rm(s)

    def lengths_array(self) -> jnp.ndarray:
        return jnp.asarray(self.lengths, jnp.int32)

    def seq_shift(self, cfg, seq_id: int, n_keep: int, n_discard: int) -> None:
        """Context shift (llama_memory_seq_add + build_rope_shift analog,
        server-context.cpp:1988-2044): drop cells [n_keep, n_keep+n_discard),
        slide the tail down, and re-rotate the cached K by -n_discard
        positions (RoPE is additive in position, so a single delta rotation
        corrects the moved keys — llama-kv-cache.h:262).
        """
        from rrs_tpu.models.llama import rope_params
        from rrs_tpu.ops.basic import apply_rope

        if cfg.any_swa:
            # same restriction as the reference: context shift is unsupported
            # with an iSWA cache (server rejects it; llama-kv-cache-iswa)
            raise RuntimeError("context shift is not supported for SWA models")
        lane = self.lane_of(seq_id)
        n = self.lengths[lane]
        n_discard = min(n_discard, n - n_keep)
        if n_discard <= 0:
            return
        if cfg.is_mla:
            # MLA rows are [rope | c_kv]: only the leading qk_rope_dim dims
            # are position-dependent (the reference's "rope must go first"
            # cache convention, deepseek2.cpp:126)
            import dataclasses as _dc

            from rrs_tpu.models.llama import mla_rope_params

            rp = _dc.replace(mla_rope_params(cfg), head_dim=cfg.kv_k_dim,
                             rot_dim=cfg.qk_rope_dim)
        else:
            rp = rope_params(cfg)
        delta = jnp.full((1, 1), -n_discard, jnp.int32)

        import functools

        # no donate_argnums: donated executables compile ~16x slower and
        # stall their first dispatch through the axon relay (PERF.md round-2
        # note); the transient double-buffer during a rare shift is cheap
        @jax.jit
        def shift(ks, vs):
            def rope_shift_k(lk):
                """[H, S, D] -> rolled + rope(-delta) on the moved tail."""
                tail = jnp.roll(lk, -n_discard, axis=1)
                rk = apply_rope(
                    tail.transpose(1, 0, 2)[None],     # [1, S, H, D]
                    delta, rp,
                )[0].transpose(1, 0, 2)
                keep = jnp.arange(lk.shape[1])[None, :, None] < n_keep
                return jnp.where(keep, lk, rk)

            out_k, out_v = [], []
            for k, v in zip(ks, vs):
                if isinstance(k, tuple):
                    # quantized: dequant the lane, shift+rope, requant
                    from rrs_tpu.runtime import kv_codec

                    arr, sc = k
                    hp = arr.dtype == jnp.uint8 \
                        and kv_codec.is_head_pair(arr, sc)
                    # sc[lane]: [H, 1, S] -> per-(head, slot) scale column
                    scl = sc[lane][:, 0, :][:, :, None]
                    if hp:
                        lk = kv_codec.unpack_hp(arr[lane]).astype(
                            jnp.float32) * scl
                    elif arr.dtype == jnp.uint8:
                        lk = kv_codec.unpack4(arr[lane]).astype(
                            jnp.float32) * scl
                    else:
                        lk = arr[lane].astype(jnp.float32) * scl
                    new_k = rope_shift_k(lk)
                    q, s_new = kv_codec.quantize_rows(
                        new_k, kv_codec.kv_qmax(arr))
                    if hp:
                        q = kv_codec.pack_hp(q)
                    elif arr.dtype == jnp.uint8:
                        q = kv_codec.pack4(q)
                    out_k.append((arr.at[lane].set(q),
                                  sc.at[lane, :, 0, :].set(s_new)))
                    varr, vsc = v
                    lv = varr[lane]
                    out_v.append((
                        varr.at[lane].set(jnp.where(
                            jnp.arange(lv.shape[1])[None, :, None] < n_keep,
                            lv, jnp.roll(lv, -n_discard, axis=1))),
                        vsc.at[lane, :, 0, :].set(jnp.where(
                            jnp.arange(vsc.shape[3])[None, :] < n_keep,
                            vsc[lane, :, 0, :],
                            jnp.roll(vsc[lane, :, 0, :], -n_discard, axis=1))),
                    ))
                    continue
                lk = k[lane]                       # [H, S, D]
                lv = v[lane]
                tail_v = jnp.roll(lv, -n_discard, axis=1)
                new_k = rope_shift_k(lk).astype(k.dtype)
                keep = jnp.arange(lk.shape[1])[None, :, None] < n_keep
                new_v = jnp.where(keep, lv, tail_v).astype(v.dtype)
                out_k.append(k.at[lane].set(new_k))
                out_v.append(v.at[lane].set(new_v))
            return out_k, out_v

        self.k, self.v = shift(self.k, self.v)
        self.lengths[lane] = n - n_discard
    def positions_row(self, lane: int, start: int, t: int):
        """Rope positions for t new tokens written at slots
        [start, start+t) — identity unless seq_div remapped the lane or
        an M-RoPE image chunk (mrope_begin_image) introduced a delta."""
        import numpy as np

        sp = self.slot_pos.get(lane)
        if sp is None:
            return np.arange(start, start + t, dtype=np.int32) \
                + self.mrope_delta.get(lane, 0)
        return sp[start:start + t].copy()

    def pos_offset(self, lane: int) -> int:
        """position - slot for the lane's NEXT token (0 unless seq_div
        compressed the cached positions or an M-RoPE image chunk trailed
        them; constant for all future slots)."""
        sp = self.slot_pos.get(lane)
        if sp is None:
            return self.mrope_delta.get(lane, 0)
        n = self.lengths[lane]
        return int(sp[min(n, self.max_seq - 1)]) - n

    def mrope_begin_image(self, lane: int, gh: int, gw: int):
        """Qwen2-VL M-RoPE positions for an image chunk of gh x gw MERGED
        grid tokens about to be appended to this lane (HF Qwen2VL
        get_rope_index / the mtmd helper's M-RoPE position tracking;
        clip-impl.h:212 PROJECTOR_TYPE_QWEN2VL): channel t is frozen at
        the chunk's base position while h/w walk the merged grid rows/
        cols; subsequent text resumes at base + max(gh, gw). Returns the
        chunk's [gh*gw, 3] (t, h, w) rope positions and records the
        lane's future text-position delta."""
        import numpy as np

        base = self.lengths[lane] + self.mrope_delta.get(lane, 0)
        r = np.arange(gh * gw, dtype=np.int32)
        rows = np.stack([np.full(gh * gw, base, np.int32),
                         base + r // gw, base + r % gw], axis=1)
        self.mrope_delta[lane] = \
            base + max(gh, gw) - (self.lengths[lane] + gh * gw)
        return rows

    def seq_div(self, cfg, seq_id: int, p0: int, p1: int, d: int) -> None:
        """llama_memory_seq_div (llama.h:740; the main.cpp self-extend /
        grouped-attention loop): divide the POSITIONS of this sequence's
        cached cells whose position lies in [p0, p1) by d. Cells stay in
        their slots — floor division is monotone, so the slot-ordered
        causal mask stays valid — and the cached K is re-rotated by each
        slot's position delta (RoPE is additive in position, the
        build_rope_shift trick). Future tokens continue at
        max(new positions) + 1; the slot->position map rides
        ``slot_pos``/``pos_offset`` into the runtime's rope positions."""
        import numpy as np

        from rrs_tpu.models.llama import rope_params
        from rrs_tpu.ops.basic import apply_rope

        if d <= 1:
            return
        if cfg.any_swa:
            raise RuntimeError("seq_div is not supported for SWA models")
        lane = self.lane_of(seq_id)
        n = self.lengths[lane]
        if n == 0:
            return
        pos = self.slot_pos.get(lane)
        pos = (np.arange(self.max_seq, dtype=np.int32) if pos is None
               else pos.copy())
        if p0 < 0:
            p0 = 0
        if p1 < 0:
            p1 = np.iinfo(np.int32).max
        sel = (pos[:n] >= p0) & (pos[:n] < p1)
        if not sel.any():
            return
        new_prefix = pos[:n].copy()
        new_prefix[sel] //= d
        delta_np = np.zeros((self.max_seq,), np.int32)
        delta_np[:n] = new_prefix - pos[:n]
        pos[:n] = new_prefix
        nxt = int(new_prefix.max()) + 1
        pos[n:] = nxt + np.arange(self.max_seq - n, dtype=np.int32)
        self.slot_pos[lane] = pos
        if not delta_np.any():
            return

        if cfg.is_mla:
            import dataclasses as _dc

            from rrs_tpu.models.llama import mla_rope_params

            rp = _dc.replace(mla_rope_params(cfg), head_dim=cfg.kv_k_dim,
                             rot_dim=cfg.qk_rope_dim)
        else:
            rp = rope_params(cfg)
        delta = jnp.asarray(delta_np)[None, :]          # [1, S]

        @jax.jit
        def div_rotate(ks):
            out_k = []
            for k in ks:
                if isinstance(k, tuple):
                    from rrs_tpu.runtime import kv_codec

                    arr, sc = k
                    hp = arr.dtype == jnp.uint8 \
                        and kv_codec.is_head_pair(arr, sc)
                    scl = sc[lane][:, 0, :][:, :, None]
                    if hp:
                        lk = kv_codec.unpack_hp(arr[lane]).astype(
                            jnp.float32) * scl
                    elif arr.dtype == jnp.uint8:
                        lk = kv_codec.unpack4(arr[lane]).astype(
                            jnp.float32) * scl
                    else:
                        lk = arr[lane].astype(jnp.float32) * scl
                    rk = apply_rope(
                        lk.transpose(1, 0, 2)[None], delta, rp,
                    )[0].transpose(1, 0, 2)
                    q, s_new = kv_codec.quantize_rows(
                        rk, kv_codec.kv_qmax(arr))
                    if hp:
                        q = kv_codec.pack_hp(q)
                    elif arr.dtype == jnp.uint8:
                        q = kv_codec.pack4(q)
                    out_k.append((arr.at[lane].set(q),
                                  sc.at[lane, :, 0, :].set(s_new)))
                    continue
                rk = apply_rope(
                    k[lane].astype(jnp.float32).transpose(1, 0, 2)[None],
                    delta, rp,
                )[0].transpose(1, 0, 2).astype(k.dtype)
                out_k.append(k.at[lane].set(rk))
            return out_k

        self.k = div_rotate(self.k)
