"""Long-context decode/prefill benchmark (VERDICT r1 item 7).

Measures on the real chip:
  * decode tok/s at S in {2048, 8192}, bf16 KV and q8 KV (steady-state:
    cache pre-filled, positions near the end)
  * prefill pp2048 tok/s

Methodology per PERF.md: device-side scans (>=256 steps), no donation,
median of 3 varied-input reps, value readback.
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models import llama as lm
from rrs_tpu.formats.tcq4 import quantize_activations_rrs  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _readback(x):
    """Scalar value readback: forces execution completion (block_until_ready
    ACKs early through the relay) WITHOUT transferring the tensor — a
    [1,1024,V] logits tensor is 622MB and takes ~20s through the tunnel."""
    return float(jnp.sum(x.astype(jnp.float32)))


def _timed(fn, args, n_work, label, reps=3):
    out = fn(*args)
    _ = _readback(out[0])
    times = []
    for r in range(reps):
        a = list(args)
        a[1] = a[1] + r + 1          # vary an input (relay caches identical)
        t0 = time.time()
        out = fn(*a)
        _ = _readback(out[0])
        times.append(time.time() - t0)
    med = statistics.median(times)
    log(f"{label}: {n_work / med:.1f} tok/s (median of {reps}, "
        f"{med:.3f}s)")
    return n_work / med


def main():
    cfg = PRESETS["qwen3-4b"]
    w = lm.fabricated_tcq4_weights(cfg, seed=0)
    jax.block_until_ready(w.embed)
    log(f"weights ready on {jax.devices()[0]}")
    results = {}

    n_steps = 256
    for s in (2048, 8192):
        for quant in ("bf16", "q8", "q4"):
            # PRODUCT cache layouts (KVCache.create): q4 gets the
            # head-pair pack — the round-4 bench built the legacy halves
            # layout here and kept "measuring" the old q4 tax
            from rrs_tpu.runtime.kv_cache import KVCache

            kv = KVCache.create(cfg, 1, s, jnp.bfloat16,
                                quant={"bf16": "none", "q8": "q8",
                                       "q4": "q4"}[quant])
            ks, vs = kv.k, kv.v
            first = jnp.zeros((1,), jnp.int32)
            # steady state near the end of the window
            pos0 = jnp.full((1,), s - n_steps - 2, jnp.int32)

            fn = jax.jit(lambda w, f, p, k, v: lm.decode_scan(
                cfg, w, f, p, k, v, n_steps))
            t0 = time.time()
            tps = _timed(fn, [w, first, pos0, ks, vs], n_steps,
                         f"decode S={s} kv={quant}")
            results[f"tg{n_steps}_S{s}_{quant}"] = round(tps, 1)
            log(f"  (incl compile {time.time() - t0:.0f}s)")

    # prefill pp2048 (bf16 KV): two chunked 1024-token dispatches — the
    # product path (PREFILL_BUCKETS caps forwards at 1024; larger T makes
    # XLA place >16MB custom-call outputs in scoped VMEM and fail)
    s = 2048 + 128
    shape = (1, cfg.n_kv_heads, s, cfg.head_dim)
    ks = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vs = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    toks = jnp.zeros((1, 1024), jnp.int32)
    pos1 = jnp.arange(1024, dtype=jnp.int32)[None, :]
    pos2 = pos1 + 1024
    step = jax.jit(lambda w, t, p, k, v: lm.forward(cfg, w, t, p, k, v, p, p))

    def two_chunks(w, t, k, v):
        lo, k, v = step(w, t, pos1, k, v)
        return step(w, t + 1, pos2, k, v)

    tps = _timed(two_chunks, [w, toks, ks, vs], 2048,
                 "prefill pp2048 (2x1024 chunks)")
    results["pp2048"] = round(tps, 1)

    print(json.dumps({"metric": "qwen3_4b_tcq4_longctx", **results}))


if __name__ == "__main__":
    main()
