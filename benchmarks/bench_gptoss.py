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
import functools
import json
import statistics
import sys
import time

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


def build_weights(cfg):
    """Fabricate 20B-shape weights ON DEVICE (jax.random under jit): a
    host-side build would push ~10 GB through the axon tunnel (~40 min);
    device-side generation is seconds per stack."""
    from rrs_tpu.models import llama as lm
    from rrs_tpu.models.linear import Q8Linear
    from rrs_tpu.models.moe import MoEWeights

    e, f, n_exp = cfg.n_embd, cfg.n_ff_exp, cfg.n_experts

    key_it = iter(jax.random.split(jax.random.PRNGKey(0), 4096))

    @functools.partial(jax.jit, static_argnums=(1,))
    def _u8(key, shape):
        return jax.random.randint(key, shape, 0, 256, jnp.int32
                                  ).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def _pow2(key, lo, hi, shape):
        return (2.0 ** jax.random.randint(key, shape, lo, hi, jnp.int32)
                ).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(1,))
    def _sexp(key, shape):
        return jax.random.randint(key, shape, 118, 123, jnp.int32
                                  ).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnums=(1,))
    def _i8(key, shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int32
                                  ).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _f32(key, scl, shape):
        return jax.random.normal(key, shape, jnp.float32) * scl

    def mxstack(k, n):
        npad = (n + 127) // 128 * 128
        # scales in the uint8 f32-exponent-field form (2^-9..2^-5)
        return (_u8(next(key_it), (n_exp, k // 2, npad)),
                _sexp(next(key_it), (n_exp, k // 32, npad)))

    def q8lin(k, n, bias=False):
        npad = (n + 127) // 128 * 128
        kpad = -(-k // 256) * 256                  # 2880 -> 3072 zero-pad
        q = _i8(next(key_it), (kpad, npad))
        s = (_pow2(next(key_it), -11, -9, (kpad // 32, npad))
             .astype(jnp.float32))
        b = _f32(next(key_it), 1e-2, (n,)) if bias else None
        return Q8Linear(q=q, scale=s, bias=b, n_logical=n,
                        k_logical=k if kpad != k else 0)

    layers = []
    for li in range(cfg.n_layers):
        gq, ge = mxstack(e, f)
        uq, ue = mxstack(e, f)
        dq, de = mxstack(f, e)
        moe = MoEWeights(
            router=_f32(next(key_it), 0.05, (e, n_exp)).astype(jnp.bfloat16),
            gate=None, up=None, down=None,
            gate_qs=gq, gate_eff=ge, up_qs=uq, up_eff=ue,
            down_qs=dq, down_eff=de, quant_kind="mxfp4",
            router_bias=jnp.zeros((n_exp,), jnp.float32),
            gate_b=_f32(next(key_it), 1e-2, (n_exp, f)),
            up_b=_f32(next(key_it), 1e-2, (n_exp, f)),
            down_b=_f32(next(key_it), 1e-2, (n_exp, e)))
        layers.append(lm.LayerWeights(
            attn_norm=jnp.ones((e,), jnp.bfloat16),
            wq=None, wk=None, wv=None,
            wqkv=q8lin(e, cfg.n_q_dim + 2 * cfg.n_kv_dim, bias=True),
            wo=q8lin(cfg.n_q_dim, e, bias=True),
            q_norm=None, k_norm=None,
            attn_sinks=_f32(next(key_it), 1.0, (cfg.n_heads,)),
            ffn_norm=jnp.ones((e,), jnp.bfloat16),
            w_gate=None, w_up=None, w_down=None, moe=moe))
        log(f"layer {li} built")
    # Q8-packed embedding table (the loader's policy for Q8_0 GGUF tables):
    # halves the 201k-vocab table's HBM vs bf16
    embed = (_i8(next(key_it), (cfg.vocab_size, e)),
             _pow2(next(key_it), -11, -9,
                   (cfg.vocab_size, e // 32)).astype(jnp.float32))
    return lm.ModelWeights(embed=embed, layers=layers,
                           final_norm=jnp.ones((e,), jnp.bfloat16),
                           lm_head=q8lin(e, cfg.vocab_size))


def main():
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as lm

    cfg = PRESETS["gpt-oss-20b"]
    w = build_weights(cfg)
    jax.block_until_ready(w.embed)
    log(f"weights ready on {jax.devices()[0]}")
    results = {}

    def caches(b, s, chunk=1, kv="bf16"):
        """Per-layer caches with iSWA rings: SWA layers only need
        window+chunk slots (runtime/kv_cache.py sizing rule) — at 20B
        shapes this is the difference between fitting 16 GB HBM or not.
        kv="q8" uses the quantized-KV tuple form (needed at B=32: bf16
        head_dim-64 caches pad 2x to the 128-lane tile)."""
        ring = -(-(cfg.swa_window + chunk) // 128) * 128
        sizes = [ring if cfg.is_swa(li) else s
                 for li in range(cfg.n_layers)]

        def one(sl):
            if kv == "q8":
                return (jnp.zeros((b, cfg.n_kv_heads, sl, cfg.head_dim),
                                  jnp.int8),
                        jnp.ones((b, cfg.n_kv_heads, 1, sl), jnp.float32))
            return jnp.zeros((b, cfg.n_kv_heads, sl, cfg.head_dim),
                             jnp.bfloat16)

        return [one(sl) for sl in sizes], [one(sl) for sl in sizes]

    # --- batched decode, B=32, caches at PP512 (DGX row: TG 628 tok/s) ---
    b, pp, tg = 32, 512, 64
    s = pp + tg + 16
    ks, vs = caches(b, s, kv="q8")
    first = jax.random.randint(jax.random.PRNGKey(3), (b,), 0,
                               cfg.vocab_size, jnp.int32)
    pos0 = jnp.full((b,), pp, jnp.int32)
    # return ONLY the tokens: materializing the final caches as outputs
    # costs another ~0.9 GB of HBM the 20B model doesn't have
    fn = jax.jit(lambda wt, fi, p, k, v: lm.decode_scan(
        cfg, wt, fi, p, k, v, tg)[0])
    tps = _timed(fn, [w, first, pos0, ks, vs], tg * b,
                 f"decode B={b} TG{tg} @PP{pp}")
    results[f"tg{tg}_b{b}"] = round(tps, 1)

    # --- single-stream decode, B=1 ---
    b = 1
    ks, vs = caches(b, s)
    n_steps = 256
    fn1 = jax.jit(lambda wt, fi, p, k, v: lm.decode_scan(
        cfg, wt, fi, p, k, v, n_steps)[0])
    tps = _timed(fn1, [w, jnp.zeros((b,), jnp.int32),
                       jnp.full((b,), pp, jnp.int32), ks, vs], n_steps,
                 f"decode B=1 TG{n_steps} @PP{pp}")
    results["tg_b1"] = round(tps, 1)

    # --- prefill pp2048, 2x1024 chunks (DGX row: 3714 tok/s) ---
    # RANDOM token ids: identical tokens would route every slot to the
    # same top-4 experts, overflowing the MoE capacity path into its
    # dense fallback — unrepresentative of real text
    ks, vs = caches(1, 2048 + 128, chunk=1024)
    toks = jax.random.randint(jax.random.PRNGKey(7), (1, 1024), 0,
                              cfg.vocab_size, jnp.int32)
    pos1 = jnp.arange(1024, dtype=jnp.int32)[None, :]
    pos2 = pos1 + 1024
    # last-position logits only (the serving prefill policy): a full
    # [1, 1024, 201k] f32 logits output is 772 MB of HBM
    last = jnp.asarray([1023], jnp.int32)
    step = jax.jit(lambda wt, t, p, k, v: lm.forward(
        cfg, wt, t, p, k, v, p, p, last_idx=last))

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
