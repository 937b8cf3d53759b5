"""pp/tg throughput sweeps (tools/llama-bench/llama-bench.cpp analog).

Measures prefill (pp) tokens/s and device-side greedy decode (tg) tokens/s,
printing a markdown table or JSON lines.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run(args):
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model

    if args.model:
        from rrs_tpu.models.loader import load_model

        cfg, weights, _ = load_model(args.model)
        name = args.model
    else:
        cfg = PRESETS[args.preset]
        weights = llama_model.fabricated_tcq4_weights(cfg, seed=0)
        name = f"{args.preset} (fabricated TCQ4)"

    rows = []
    max_pp = max(args.pp) if args.pp else 512
    max_tg = max(args.tg) if args.tg else 128
    s = max_pp + max_tg + 8
    shape = (1, cfg.n_kv_heads, s, cfg.head_dim)

    for pp in args.pp:
        tokens = jnp.zeros((1, pp), jnp.int32)
        kc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
        vc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
        pos = jnp.arange(pp, dtype=jnp.int32)[None, :]

        fn = jax.jit(lambda w, t, kc, vc: llama_model.forward(
            cfg, w, t, pos, kc, vc, pos, pos))
        out = fn(weights, tokens, kc, vc)
        jax.block_until_ready(out[0])
        t0 = time.time()
        # varied inputs: the axon relay caches identical executions
        out = fn(weights, tokens + 1, kc, vc)
        jax.block_until_ready(out[0])
        dt = time.time() - t0
        rows.append({"test": f"pp{pp}", "t/s": round(pp / dt, 2)})

    for tg in args.tg:
        kc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
        vc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
        first = jnp.zeros((1,), jnp.int32)
        pos0 = jnp.zeros((1,), jnp.int32)
        fn = jax.jit(lambda w, f, p, k, v: llama_model.decode_scan(
            cfg, w, f, p, k, v, tg))
        out = fn(weights, first, pos0, kc, vc)
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = fn(weights, first + 1, pos0, kc, vc)
        jax.block_until_ready(out[0])
        dt = time.time() - t0
        rows.append({"test": f"tg{tg}", "t/s": round(tg / dt, 2)})

    if args.json:
        for r in rows:
            print(json.dumps({"model": name, **r}))
    else:
        print(f"| model | test | t/s |")
        print(f"|---|---|---|")
        for r in rows:
            print(f"| {name} | {r['test']} | {r['t/s']} |")
