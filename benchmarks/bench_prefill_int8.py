"""Prefill GEMM shootout (round 5, VERDICT #6): route prefill through the
int8 MXU (v5e 394 TOPS) instead of dequant-to-bf16 (197 TFLOPS ceiling,
~29% achieved in round 4's pp2048).

Contenders at prefill shapes (Qwen3-4B gateup K=2560 N=19456, attn-out
K=9728 N=2560 the two big streams):
  dequant   — production tcq4_matmul (bf16 MXU), bm sweep
  pb        — paired-bias bf16 kernel, bm sweep
  i8p       — int8-superblock requant kernel (this round), bm sweep
  bf16-dot  — jnp.dot on pre-dequantized bf16 weights (MXU bf16 ceiling)
  int8-dot  — jnp.dot int8xint8->int32 (MXU int8 ceiling)

Timing: 64-iteration device scan per variant with varying activations and
a value readback (PERF.md rules).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_prefill_int8.py
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops import tcq4_matmul as mm


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(fn, xs, ops, reps=3):
    """ops are jit ARGUMENTS (closure-captured device arrays get baked
    into the HLO as constants and blow the relay's request-size limit)."""
    def run_impl(ops_):
        def body(c, x):
            return c + fn(x, ops_).astype(jnp.float32)[0, :128].sum(), None
        return jax.lax.scan(body, 0.0, xs)[0]

    run = jax.jit(run_impl)
    float(run(ops))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(ops))
        best = min(best, time.perf_counter() - t0)
    return best / xs.shape[0]


def main():
    rng = np.random.default_rng(0)
    results = {}
    for label, (m, k, n) in (
        ("gateup_m1024", (1024, 2560, 19456)),
        ("down_m1024", (1024, 9728, 2560)),
        ("gateup_m512", (512, 2560, 19456)),
    ):
        qs = jnp.asarray(rng.integers(0, 256, (k // 2, n), dtype=np.uint8))
        eff = jnp.asarray((rng.random((k // 32, n)) * 0.02 + 1e-3)
                          .astype(np.float32))
        # device-generated activation variants (a host [64, M, K] upload
        # blows the relay's request-size limit); NV = 8 buffers, varied
        # per step by the scan index so the relay can't cache dispatches
        NV = 8
        keyz = jax.random.PRNGKey(0)
        a_q = jax.random.randint(keyz, (NV, m, k), -7, 8, dtype=jnp.int8)
        a_s = (jax.random.uniform(keyz, (NV, m, k // 256)) * 0.5 + 0.1
               ).astype(jnp.float32)
        a_f = (a_q.astype(jnp.float32)
               * jnp.repeat(a_s, 256, axis=-1) / 7.0)
        a_bf = a_f.astype(jnp.bfloat16)
        steps = jnp.arange(64, dtype=jnp.int32) % NV

        row = {}
        for bm in (128, 256, 512):
            row[f"dequant_bm{bm}"] = scan_time(
                lambda i, ops, bm=bm: mm.tcq4_matmul(
                    ops[0][i], ops[1], ops[2], bm=bm),
                steps, (a_f, qs, eff))
        qs_gi = mm.pack_gi_jnp(qs)
        eff_bf = eff.astype(jnp.bfloat16)
        for bm in (128, 256):
            def pbf(i, ops, bm=bm):
                ag, a24 = mm.pb_prepare(ops[0][i])
                return mm.tcq4_matmul_pb(ag, a24, ops[1], ops[2], bm=bm)
            row[f"pb_bm{bm}"] = scan_time(pbf, steps, (a_f, qs_gi, eff_bf))
        qs_sbi, f8, e2 = mm.pack_i8p(qs, eff)
        for bm in (128, 256, 512):
            row[f"i8p_bm{bm}"] = scan_time(
                lambda i, ops, bm=bm: mm.tcq4_matmul_i8p(
                    mm.prep_a_sbi(ops[0][i]), ops[1][i],
                    ops[2], ops[3], ops[4], bm=bm),
                steps, (a_q, a_s, qs_sbi, f8, e2))
        # on-the-fly sbi repack (qs stays in decode layout; pack per call)
        row["i8p_fly_bm512"] = scan_time(
            lambda i, ops: mm.tcq4_matmul_i8p(
                mm.prep_a_sbi(ops[0][i]), ops[1][i],
                *mm.pack_i8p(ops[2], ops[3]), bm=512),
            steps, (a_q, a_s, qs, eff))
        wb = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        row["bf16_dot"] = scan_time(
            lambda i, ops: jax.lax.dot_general(
                ops[0][i], ops[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), steps, (a_bf, wb))
        w8 = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        row["int8_dot"] = scan_time(
            lambda i, ops: jax.lax.dot_general(
                ops[0][i], ops[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32), steps, (a_q, w8))
        gf = 2 * m * k * n / 1e9
        for kk, v in sorted(row.items(), key=lambda kv: kv[1]):
            log(f"{label:14s} {kk:14s} {v*1e6:8.1f} us  "
                f"{gf/v:7.0f} GFLOP/s")
        results[label] = {kk: round(v * 1e6, 1) for kk, v in row.items()}
    print(json.dumps({"metric": "prefill_gemm_us", **results}))


if __name__ == "__main__":
    main()
