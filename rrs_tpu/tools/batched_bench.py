"""Parallel-decode throughput grid (tools/batched-bench analog).

Produces the PP/TG/B table: for each (prompt_len, gen_len, n_parallel)
combination, measures prefill throughput, batched decode throughput and
total time, using the device-side scan decode over B lanes.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run_batched_bench(cfg, weights, pp_list, tg_list, pl_list, as_json=False):
    from rrs_tpu.models import llama as llama_model

    rows = []
    for n_pl in pl_list:
        for pp in pp_list:
            for tg in tg_list:
                s = pp + tg + 8
                shape = (n_pl, cfg.n_kv_heads, s, cfg.head_dim)
                kc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
                vc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
                tokens = jnp.zeros((n_pl, pp), jnp.int32)
                pos = jnp.arange(pp, dtype=jnp.int32)[None, :].repeat(n_pl, 0)

                # timed calls use DIFFERENT input values than warmup: the
                # axon relay caches identical (executable, inputs) runs
                # (see PERF.md methodology)
                def _prefill(w, t, kc, vc):
                    # slice the last-position logits INSIDE jit: the full
                    # [B, T, V] tensor is GBs at B=16 (HBM OOM otherwise)
                    logits, nk, nv = llama_model.forward(
                        cfg, w, t, pos, kc, vc, pos, pos)
                    return logits[:, -1, :], nk, nv

                prefill = jax.jit(_prefill)
                out = prefill(weights, tokens, kc, vc)
                jax.block_until_ready(out[0])
                t0 = time.time()
                logits, kc, vc = prefill(weights, tokens + 1, kc, vc)
                _ = float(logits.sum())
                t_pp = time.time() - t0

                first = jnp.zeros((n_pl,), jnp.int32)
                pos0 = jnp.full((n_pl,), pp, jnp.int32)
                scan = jax.jit(lambda w, f, p, k, v: llama_model.decode_scan(
                    cfg, w, f, p, k, v, tg))
                toks, _, _, _ = scan(weights, first, pos0, kc, vc)
                _ = int(toks.sum())
                t0 = time.time()
                toks, _, _, _ = scan(weights, first + 1, pos0, kc, vc)
                _ = int(toks.sum())
                t_tg = time.time() - t0

                row = {
                    "PP": pp, "TG": tg, "B": n_pl,
                    "S_PP t/s": round(n_pl * pp / t_pp, 2),
                    "S_TG t/s": round(n_pl * tg / t_tg, 2),
                    "T s": round(t_pp + t_tg, 3),
                }
                rows.append(row)
                if as_json:
                    print(json.dumps(row), flush=True)
                else:
                    print(row, flush=True)
    return rows
