"""Headline benchmark: Qwen3-4B TCQ4 W4A4 single-chip decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": tok/s, "unit": "tok/s", "vs_baseline": value/68}

Baseline 68 tok/s = the reference's TCQ4 decode on RTX 3090 (README.md:44,
BASELINE.md). Decode runs as a device-side lax.scan (greedy), so the number
measures the model, not host dispatch.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_TOKS = 68.0  # reference TCQ4 decode t/s, RTX 3090 (README.md:44)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model

    cfg = PRESETS["qwen3-4b"]
    log(f"building fabricated TCQ4 weights for {cfg.arch} "
        f"({cfg.n_layers}L, E={cfg.n_embd}, FF={cfg.n_ff})")
    t0 = time.time()
    weights = llama_model.fabricated_tcq4_weights(cfg, seed=0)
    jax.block_until_ready(weights.embed)
    log(f"weights ready in {time.time() - t0:.1f}s on {jax.devices()[0]}")

    # long scan: the tunnel adds a 150-450 ms fixed cost per dispatch
    # (PERF.md methodology), so short windows under-report; 768 steps keeps
    # it <0.6 ms/step. S=384 matches the baseline context (writes clip at
    # s-1 after overflow — identical per-step cost, steady-state attention)
    b, s = 1, 384
    n_steps = 768
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    k_caches = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    v_caches = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    first = jnp.zeros((b,), jnp.int32)
    pos0 = jnp.zeros((b,), jnp.int32)

    # weights must be jit ARGUMENTS (closing over them bakes GBs of
    # constants into the HLO); one compiled scan reused for warmup + timing
    scan = jax.jit(
        lambda w, f, p, k, v: llama_model.decode_scan(cfg, w, f, p, k, v, n_steps),
        donate_argnums=(3, 4),
    )

    t0 = time.time()
    toks, last, ks, vs = scan(weights, first, pos0, k_caches, v_caches)
    _ = int(toks.sum())        # value readback: block_until_ready can ack
    log(f"compile+warmup ({n_steps} steps) in {time.time() - t0:.1f}s")

    t0 = time.time()
    toks, last, ks, vs = scan(weights, last, pos0 + n_steps, ks, vs)
    _ = int(toks.sum())        # early under relayed transports
    dt = time.time() - t0
    tps = n_steps / dt
    log(f"{n_steps} decode steps in {dt:.3f}s -> {tps:.1f} tok/s")

    print(json.dumps({
        "metric": "qwen3_4b_tcq4_decode_1chip",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_TOKS, 3),
    }))


if __name__ == "__main__":
    main()
