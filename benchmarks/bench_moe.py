"""Quantized-MoE decode bench (gpt-oss-20B-like shapes: 24 layers, 32
experts top-4, E=F=2816, W4A4 TCQ4 experts ~10.5 GB packed + TCQ4
attention) on one TPU chip.

Timing follows PERF.md rules: a single 512-step device-side decode scan
with value readback; the per-step expert dispatch goes through the
scalar-prefetch expert-gather kernel (tcq4_matmul_experts_rows).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_moe.py
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as lm
    from rrs_tpu.models.linear import Q8Linear, TCQ4Linear, _pad_n
    from rrs_tpu.models.moe import MoEWeights

    cfg = ModelConfig(
        arch="qwen3moe", n_layers=24, n_embd=2816, n_heads=64, n_kv_heads=8,
        head_dim=64, n_ff=0, vocab_size=151936, context_length=8192,
        n_experts=32, n_experts_used=4, n_ff_exp=2816, norm_topk_prob=True)
    rng = np.random.default_rng(0)
    e, f, n_exp = cfg.n_embd, cfg.n_ff_exp, cfg.n_experts

    def qpack(ne, k, n):
        qs = rng.integers(0, 256, (ne, k // 2, n), dtype=np.uint8)
        eff = rng.random((ne, k // 32, n), dtype=np.float32) * 0.01 + 1e-3
        return jnp.asarray(qs), jnp.asarray(eff, jnp.bfloat16)

    def qlin(k, n):
        qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
        eff = rng.random((k // 32, n), dtype=np.float32) * 0.01 + 1e-3
        return TCQ4Linear(qs=jnp.asarray(qs),
                          eff=jnp.asarray(eff, jnp.bfloat16),
                          gather=None, bias=None)

    layers = []
    for li in range(cfg.n_layers):
        gq, ge = qpack(n_exp, e, f)
        uq, ue = qpack(n_exp, e, f)
        dq, de = qpack(n_exp, f, e)
        moe = MoEWeights(
            router=jnp.asarray(rng.standard_normal((e, n_exp)) * 0.05,
                               jnp.bfloat16),
            gate=None, up=None, down=None,
            gate_qs=gq, gate_eff=ge, up_qs=uq, up_eff=ue,
            down_qs=dq, down_eff=de)
        layers.append(lm.LayerWeights(
            attn_norm=jnp.ones((e,), jnp.bfloat16),
            wq=None, wk=None, wv=None,
            wqkv=qlin(e, cfg.n_q_dim + 2 * cfg.n_kv_dim),
            wo=qlin(cfg.n_q_dim, e),
            q_norm=None, k_norm=None,
            ffn_norm=jnp.ones((e,), jnp.bfloat16),
            w_gate=None, w_up=None, w_down=None, moe=moe))
        log(f"layer {li} built")
    embed = jnp.asarray(
        rng.standard_normal((cfg.vocab_size, e)).astype(np.float32) * 0.02,
        jnp.bfloat16)
    # lm_head at Q8_0 — the quantizer's output.weight policy; fabricated
    # codes, realistic traffic (bf16 dense here would add ~1.7 ms/step)
    lm_q = jnp.asarray(_pad_n(
        rng.integers(-127, 128, (e, cfg.vocab_size), dtype=np.int8)))
    lm_s = jnp.asarray(_pad_n(
        rng.random((e // 32, cfg.vocab_size), dtype=np.float32) * 1e-3))
    w = lm.ModelWeights(embed=embed, layers=layers,
                        final_norm=jnp.ones((e,), jnp.bfloat16),
                        lm_head=Q8Linear(q=lm_q, scale=lm_s,
                                         n_logical=cfg.vocab_size))
    jax.block_until_ready(w.embed)
    log("weights ready")

    b, s = 1, 384
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)

    def fresh():
        return ([jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)],
                [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)])

    first = jnp.zeros((b,), jnp.int32)
    pos0 = jnp.zeros((b,), jnp.int32)
    n_steps = 512
    # no donate_argnums (relay artifact, PERF.md round-2 note); median of 3
    # varied-input reps
    scan = jax.jit(
        lambda wt, fi, p, k, v: lm.decode_scan(cfg, wt, fi, p, k, v, n_steps))
    k0, v0 = fresh()
    r = scan(w, first, pos0, k0, v0)
    int(np.asarray(r[0]).sum())
    log("compiled")
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        r = scan(w, first + 1 + rep, pos0 + rep, k0, v0)
        int(np.asarray(r[0]).sum())
        times.append(time.perf_counter() - t0)
        log(f"rep {rep}: {n_steps} MoE decode steps in {times[-1]:.2f}s")
    import statistics
    dt = statistics.median(times)
    print(json.dumps({
        "metric": "moe_20b_tcq4_decode_1chip",
        "value": round(n_steps / dt, 1),
        "unit": "tok/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
