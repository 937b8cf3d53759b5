"""Decode-matmul attribution microbench: is tcq4_matmul decode time
per-call overhead (dispatch/pipeline-fill) or in-kernel dequant ALU?

Three measurements on the real chip (PERF.md timing rules: long device
scans, varied inputs, value readback):

  1. chain-16: a scan whose body chains 16 dependent K=2560,N=2560
     matmuls (square so output feeds input) — models the per-layer
     many-small-calls pattern.
  2. wide-1: ONE matmul with N=16*2560 (identical total weight bytes,
     one call) — if per-call overhead dominates, this is much faster.
  3. f32-dot variant of each: skips the explicit bf16 casts before the
     MXU dot (the MXU truncates internally on the default-precision
     path) — if dequant ALU dominates, dropping the two VPU casts
     per element should show up directly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_dispatch.py
"""
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops.tcq4_matmul import tcq4_matmul

K = 2560
CALLS = 16
STEPS = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(n):
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (K // 2, n), dtype=np.uint8))
    eff = jnp.asarray(rng.random((K // 32, n), np.float32) * 0.01,
                      jnp.bfloat16)
    return qs, eff


def timed(fn, x, label, work_bytes):
    t0 = time.time()
    jax.block_until_ready(fn(x))
    log(f"{label}: compile {time.time() - t0:.0f}s")
    ts = []
    for r in range(3):
        xx = x + (r + 1) * 0.001
        t0 = time.time()
        out = fn(xx)
        s = float(jnp.sum(out))
        ts.append(time.time() - t0)
    med = statistics.median(ts)
    per_step = med / STEPS
    log(f"{label}: {per_step * 1e6:.1f} us/step, "
        f"{work_bytes / per_step / 1e9:.0f} GB/s "
        f"({['%.3f' % t for t in ts]}) sum={s:.3e}")
    return per_step


def main():
    qs_sq, eff_sq = build(K)
    qs_w, eff_w = build(K * CALLS)
    bytes_per_mat = qs_sq.size + eff_sq.size * 2
    total = bytes_per_mat * CALLS

    @jax.jit
    def chain(x0):
        def body(x, _):
            for _ in range(CALLS):
                y = tcq4_matmul(x, qs_sq, eff_sq)
                x = y * 1e-3
            return x, ()
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x

    @jax.jit
    def wide(x0):
        def body(x, _):
            y = tcq4_matmul(x, qs_w, eff_w)
            return y[:, :K] * 1e-3, ()
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x

    x0 = jnp.asarray(np.random.default_rng(1).random((1, K), np.float32))
    t_chain = timed(chain, x0, f"chain-{CALLS} (16 calls/step)", total)
    t_wide = timed(wide, x0, "wide-1 (1 call/step, same bytes)", total)
    over = (t_chain - t_wide) / (CALLS - 1) * 1e6
    log(f"implied per-call overhead: {over:.1f} us")

    # f32-dot variant: fast=False uses HIGHEST (slow); instead test via
    # the fast kernel with pre-bf16 input removed — approximate by feeding
    # bf16 activations (removes the a-cast only; w-cast needs a kernel
    # variant, measured separately if this moves the needle)
    @jax.jit
    def chain_bf16a(x0):
        def body(x, _):
            for _ in range(CALLS):
                y = tcq4_matmul(x.astype(jnp.bfloat16), qs_sq, eff_sq)
                x = y * 1e-3
            return x, ()
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x

    timed(chain_bf16a, x0, "chain-16 bf16-activations", total)


if __name__ == "__main__":
    main()
