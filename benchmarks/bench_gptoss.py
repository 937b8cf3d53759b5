"""gpt-oss-20B MXFP4 bench on one TPU chip — the DGX-Spark baseline rows
(reference benches/dgx-spark/dgx-spark.md: pp2048 3714 tok/s, B=32 PP512
TG 628 tok/s aggregate).

REAL 20B shapes from PRESETS["gpt-oss-20b"] (24L, E=2880, 64/8 heads x64,
32 experts top-4, F=2880, vocab 201088, alternating SWA-128, sinks,
swiglu_oai, qkv/out/router/expert biases). Expert stacks are MXFP4 in the
packed device layout of ops/mxfp4_matmul.py (~9.8 GB — the model only fits
the 16 GB chip because dequant happens in VMEM inside the kernels);
attention is Q8_0 and lm_head Q8_0 per the reference GGUF's type policy.
Fabricated codes — identical compute/memory traffic to real checkpoints.

Timing per PERF.md rules: device-side scans / single large dispatches,
no donation, median of 3 varied-input reps, value readback.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_gptoss.py
"""
import json
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _readback(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _timed(fn, args, n_work, label, vary_idx=1, reps=3):
    t0 = time.time()
    out = fn(*args)
    _ = _readback(out[0] if isinstance(out, tuple) else out)
    log(f"{label}: compile+warmup {time.time() - t0:.0f}s")
    times = []
    for r in range(reps):
        a = list(args)
        a[vary_idx] = a[vary_idx] + r + 1
        t0 = time.time()
        out = fn(*a)
        _ = _readback(out[0] if isinstance(out, tuple) else out)
        times.append(time.time() - t0)
    med = statistics.median(times)
    log(f"{label}: {n_work / med:.1f} tok/s (median of {reps}: "
        f"{['%.2f' % t for t in times]})")
    return n_work / med


def build_weights(cfg, rng):
    from rrs_tpu.models import llama as lm
    from rrs_tpu.models.linear import Q8Linear, _pad_n
    from rrs_tpu.models.moe import MoEWeights

    e, f, n_exp = cfg.n_embd, cfg.n_ff_exp, cfg.n_experts
    n_pad = (f + 127) // 128 * 128                 # 2880 -> 2944

    def mxstack(k, n):
        npad = (n + 127) // 128 * 128
        qs = rng.integers(0, 256, (n_exp, k // 2, npad), dtype=np.uint8)
        # power-of-two-ish block scales; value range irrelevant for perf
        sc = (2.0 ** rng.integers(-9, -5, (n_exp, k // 32, npad))
              ).astype(np.float32)
        return jnp.asarray(qs), jnp.asarray(sc, jnp.bfloat16)

    def q8lin(k, n, bias=False):
        q = rng.integers(-127, 128, (k, n), dtype=np.int8)
        s = rng.random((k // 32, n), dtype=np.float32) * 1e-3
        b = (jnp.asarray(rng.standard_normal((n,)).astype(np.float32) * 1e-2)
             if bias else None)
        return Q8Linear(q=jnp.asarray(_pad_n(q)), scale=jnp.asarray(_pad_n(s)),
                        bias=b, n_logical=n)

    layers = []
    for li in range(cfg.n_layers):
        gq, ge = mxstack(e, f)
        uq, ue = mxstack(e, f)
        dq, de = mxstack(f, e)
        moe = MoEWeights(
            router=jnp.asarray(rng.standard_normal((e, n_exp)) * 0.05,
                               jnp.bfloat16),
            gate=None, up=None, down=None,
            gate_qs=gq, gate_eff=ge, up_qs=uq, up_eff=ue,
            down_qs=dq, down_eff=de, quant_kind="mxfp4",
            router_bias=jnp.zeros((n_exp,), jnp.float32),
            gate_b=jnp.asarray(rng.standard_normal((n_exp, f)) * 1e-2,
                               jnp.float32),
            up_b=jnp.asarray(rng.standard_normal((n_exp, f)) * 1e-2,
                             jnp.float32),
            down_b=jnp.asarray(rng.standard_normal((n_exp, e)) * 1e-2,
                               jnp.float32))
        layers.append(lm.LayerWeights(
            attn_norm=jnp.ones((e,), jnp.bfloat16),
            wq=None, wk=None, wv=None,
            wqkv=q8lin(e, cfg.n_q_dim + 2 * cfg.n_kv_dim, bias=True),
            wo=q8lin(cfg.n_q_dim, e, bias=True),
            q_norm=None, k_norm=None,
            attn_sinks=jnp.asarray(rng.standard_normal((cfg.n_heads,)),
                                   jnp.float32),
            ffn_norm=jnp.ones((e,), jnp.bfloat16),
            w_gate=None, w_up=None, w_down=None, moe=moe))
        log(f"layer {li} built")
    embed = jnp.asarray(
        rng.standard_normal((cfg.vocab_size, e)).astype(np.float32) * 0.02,
        jnp.bfloat16)
    return lm.ModelWeights(embed=embed, layers=layers,
                           final_norm=jnp.ones((e,), jnp.bfloat16),
                           lm_head=q8lin(e, cfg.vocab_size))


def main():
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as lm

    cfg = PRESETS["gpt-oss-20b"]
    rng = np.random.default_rng(0)
    w = build_weights(cfg, rng)
    jax.block_until_ready(w.embed)
    log(f"weights ready on {jax.devices()[0]}")
    results = {}

    # --- batched decode, B=32, caches at PP512 (DGX row: TG 628 tok/s) ---
    b, pp, tg = 32, 512, 64
    s = pp + tg + 16
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    ks = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vs = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    first = jnp.zeros((b,), jnp.int32)
    pos0 = jnp.full((b,), pp, jnp.int32)
    fn = jax.jit(lambda wt, fi, p, k, v: lm.decode_scan(
        cfg, wt, fi, p, k, v, tg))
    tps = _timed(fn, [w, first, pos0, ks, vs], tg * b,
                 f"decode B={b} TG{tg} @PP{pp}")
    results[f"tg{tg}_b{b}"] = round(tps, 1)

    # --- single-stream decode, B=1 ---
    b = 1
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    ks = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vs = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    n_steps = 256
    fn1 = jax.jit(lambda wt, fi, p, k, v: lm.decode_scan(
        cfg, wt, fi, p, k, v, n_steps))
    tps = _timed(fn1, [w, jnp.zeros((b,), jnp.int32),
                       jnp.full((b,), pp, jnp.int32), ks, vs], n_steps,
                 f"decode B=1 TG{n_steps} @PP{pp}")
    results["tg_b1"] = round(tps, 1)

    # --- prefill pp2048, 2x1024 chunks (DGX row: 3714 tok/s) ---
    s2 = 2048 + 128
    shape = (1, cfg.n_kv_heads, s2, cfg.head_dim)
    ks = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vs = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    toks = jnp.zeros((1, 1024), jnp.int32)
    pos1 = jnp.arange(1024, dtype=jnp.int32)[None, :]
    pos2 = pos1 + 1024
    step = jax.jit(lambda wt, t, p, k, v: lm.forward(
        cfg, wt, t, p, k, v, p, p))

    def two_chunks(wt, t, k, v):
        lo, k, v = step(wt, t, pos1, k, v)
        return step(wt, t + 1, pos2, k, v)

    tps = _timed(two_chunks, [w, toks, ks, vs], 2048,
                 "prefill pp2048 (2x1024)")
    results["pp2048"] = round(tps, 1)

    print(json.dumps({
        "metric": "gptoss20b_mxfp4_1chip",
        **results,
        "baseline_dgx_spark": {"tg64_b32": 628, "pp2048": 3714},
    }))


if __name__ == "__main__":
    main()
