"""Session state save/restore (llama_state_* analog, llama.h:765-888).

Two granularities, mirroring the reference:
  * full-context state  (llama_state_get/set_data): every lane's K/V + cell
    metadata -> one file
  * per-sequence state  (llama_state_seq_get/set_data): one sequence's K/V
    prefix -> file; restorable into any free lane of a compatible context

Format: npz container with a header JSON (magic/version/config fingerprint),
the analog of the session-file magic+version check (llama.h:40-48).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

STATE_MAGIC = "rrs_tpu-state"
STATE_VERSION = 1


def _fingerprint(cfg) -> dict:
    return {
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
        "n_kv_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
    }


def _check_header(meta: dict, cfg):
    if meta.get("magic") != STATE_MAGIC:
        raise ValueError("not an rrs_tpu state file")
    if meta.get("version") != STATE_VERSION:
        raise ValueError(f"unsupported state version {meta.get('version')}")
    if meta.get("fingerprint") != _fingerprint(cfg):
        raise ValueError(
            f"state/model mismatch: {meta.get('fingerprint')} vs {_fingerprint(cfg)}"
        )


def _np_dequant(arr: np.ndarray, sc: np.ndarray) -> np.ndarray:
    """numpy mirror of runtime/kv_codec.dequantize (arr [..., H?, S, D or
    D/2], sc [..., H, S]); handles both q4 layouts (head-pair detected by
    the halved head plane count)."""
    if arr.dtype == np.uint8:
        a32 = arr.astype(np.int32)
        if arr.ndim >= 3 and arr.shape[-3] * 2 == sc.shape[-2]:  # head-pair
            st = np.stack([(a32 & 15) - 8, (a32 >> 4) - 8], axis=-3)
            arr = st.reshape(st.shape[:-4] + (st.shape[-4] * 2,)
                             + st.shape[-2:])
        else:
            arr = np.concatenate([(a32 << 28) >> 28, (a32 << 24) >> 28],
                                 axis=-1)
    return arr.astype(np.float32) * sc[..., None]


def _np_requant(data: np.ndarray, u8: bool, hp: bool = False):
    """f32 [..., H, S, D] -> (stored values, scales [...])."""
    qmax = 7.0 if u8 else 127.0
    sc = np.maximum(np.abs(data).max(-1) / qmax, 1e-10)
    q = np.clip(np.rint(data / sc[..., None]), -qmax, qmax).astype(np.int8)
    if u8 and hp:
        b = (q.astype(np.int32) + 8).astype(np.uint8)
        q = b[..., 0::2, :, :] | (b[..., 1::2, :, :] << 4)
    elif u8:
        d = q.shape[-1]
        q = ((q[..., : d // 2].astype(np.uint8) & 0xF)
             | ((q[..., d // 2:].astype(np.uint8) & 0xF) << 4))
    return q, sc.astype(np.float32)


def save_state(ctx, path: str | Path) -> int:
    """Serialize the full context (all lanes). Returns bytes written."""
    import jax

    meta = {
        "magic": STATE_MAGIC,
        "version": STATE_VERSION,
        "fingerprint": _fingerprint(ctx.cfg),
        "lengths": ctx.kv.lengths,
        "seq_ids": ctx.kv.seq_ids,
        "max_seq": ctx.kv.max_seq,
    }
    arrays = {"__meta__": np.frombuffer(json.dumps(meta).encode(), np.uint8)}
    max_len = max(ctx.kv.lengths, default=0)

    def deq(c):
        # per-layer clamp: iSWA ring layers are shorter than max_len
        if isinstance(c, tuple):
            arr, sc = c
            nl = min(max_len, arr.shape[2])
            return _np_dequant(np.asarray(arr[:, :, :nl]),
                               np.asarray(sc[:, :, 0, :nl]))
        nl = min(max_len, c.shape[2])
        return np.asarray(c[:, :, :nl]).astype(np.float32)

    for li in range(len(ctx.kv.k)):
        # only the live prefix of each lane needs saving (dequantized)
        arrays[f"k{li}"] = deq(ctx.kv.k[li])
        arrays[f"v{li}"] = deq(ctx.kv.v[li])
    path = Path(path)
    np.savez_compressed(path, **arrays)
    return path.stat().st_size


def load_state(ctx, path: str | Path) -> None:
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        _check_header(meta, ctx.cfg)
        ctx.kv.lengths = list(meta["lengths"])
        ctx.kv.seq_ids = list(meta["seq_ids"])
        # seq ids live on after a restore: keep minting UNIQUE ones, or a
        # later new_sequence() would collide with a restored lane and
        # lane_of() would resolve to the wrong lane
        live = [sid for sid in ctx.kv.seq_ids if sid is not None]
        if live and hasattr(ctx, "_next_seq_id"):
            ctx._next_seq_id = max(ctx._next_seq_id, max(live) + 1)

        def req(c, data):
            # per-layer n: iSWA ring layers are saved (and restored) at
            # their own (smaller) length, not layer 0's
            n = data.shape[2]
            if isinstance(c, tuple):
                arr, sc = c
                n = min(n, arr.shape[2])
                q, s = _np_requant(data[:, :, :n], arr.dtype == jnp.uint8,
                                   hp=arr.shape[1] * 2 == sc.shape[1])
                arr = arr.at[:, :, :n].set(jnp.asarray(q, arr.dtype))
                sc = sc.at[:, :, 0, :n].set(jnp.asarray(s, jnp.float32))
                return (arr, sc)
            n = min(n, c.shape[2])
            return c.at[:, :, :n].set(jnp.asarray(data[:, :, :n], c.dtype))

        for li in range(len(ctx.kv.k)):
            ctx.kv.k[li] = req(ctx.kv.k[li], z[f"k{li}"])
            ctx.kv.v[li] = req(ctx.kv.v[li], z[f"v{li}"])


def save_sequence(ctx, seq_id: int, path: str | Path, tokens=None) -> int:
    """Serialize one sequence's KV prefix (+ optional token history)."""
    lane = ctx.kv.lane_of(seq_id)
    n = ctx.kv.lengths[lane]
    meta = {
        "magic": STATE_MAGIC,
        "version": STATE_VERSION,
        "fingerprint": _fingerprint(ctx.cfg),
        "n_tokens": n,
        "tokens": [int(t) for t in tokens] if tokens is not None else None,
    }
    arrays = {"__meta__": np.frombuffer(json.dumps(meta).encode(), np.uint8)}

    def deq_lane(c):
        # iSWA ring layers are smaller than the sequence: save the whole
        # ring (numpy slicing clamps, but be explicit)
        if isinstance(c, tuple):
            arr, sc = c
            nl = min(n, arr.shape[2])
            return _np_dequant(np.asarray(arr[lane, :, :nl]),
                               np.asarray(sc[lane, :, 0, :nl]))
        nl = min(n, c.shape[2])
        return np.asarray(c[lane, :, :nl]).astype(np.float32)

    for li in range(len(ctx.kv.k)):
        arrays[f"k{li}"] = deq_lane(ctx.kv.k[li])
        arrays[f"v{li}"] = deq_lane(ctx.kv.v[li])
    path = Path(path)
    np.savez_compressed(path, **arrays)
    return path.stat().st_size


def load_sequence(ctx, path: str | Path):
    """Restore a saved sequence into a fresh lane. Returns (seq_id, tokens)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        _check_header(meta, ctx.cfg)
        n = int(meta["n_tokens"])
        if n > ctx.kv.max_seq:
            raise ValueError(f"sequence length {n} exceeds context {ctx.kv.max_seq}")
        seq_id = ctx.new_sequence()
        lane = ctx.kv.lane_of(seq_id)

        def req_lane(c, data):
            nl = data.shape[1]
            if isinstance(c, tuple):
                arr, sc = c
                q, s = _np_requant(data, arr.dtype == jnp.uint8,
                                   hp=arr.shape[1] * 2 == sc.shape[1])
                arr = arr.at[lane, :, :nl].set(jnp.asarray(q, arr.dtype))
                sc = sc.at[lane, :, 0, :nl].set(jnp.asarray(s, jnp.float32))
                return (arr, sc)
            return c.at[lane, :, :nl].set(jnp.asarray(data, c.dtype))

        for li in range(len(ctx.kv.k)):
            ctx.kv.k[li] = req_lane(ctx.kv.k[li], z[f"k{li}"])
            ctx.kv.v[li] = req_lane(ctx.kv.v[li], z[f"v{li}"])
        ctx.kv.lengths[lane] = n
        return seq_id, meta.get("tokens")
