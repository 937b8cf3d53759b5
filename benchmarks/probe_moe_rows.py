"""Probe the failing MoE expert-rows regression (round 5): raw numbers
for rows vs dense streaming at the test's decode shape, plus variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_moe_rows.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops.tcq4_matmul import (tcq4_matmul_all_experts,
                                     tcq4_matmul_experts,
                                     tcq4_matmul_experts_rows)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(fn, steps=128, reps=3):
    xs = jnp.arange(steps, dtype=jnp.int32)

    def body(c, x):
        return c + fn(x).astype(jnp.float32).sum(), None

    run = jax.jit(lambda: jax.lax.scan(body, 0.0, xs)[0])
    float(run())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    rng = np.random.default_rng(1)
    for E, K, N in ((32, 1024, 1024), (128, 2048, 768)):
        qs = jnp.asarray(rng.integers(0, 256, (E, K // 2, N),
                                      dtype=np.uint8))
        eff = jnp.asarray((rng.random((E, K // 32, N)) * 0.02)
                          .astype(np.float32), jnp.bfloat16)
        acts = jnp.asarray(rng.standard_normal((128, 4, K)) * 0.3,
                           jnp.float32)
        ids = jnp.asarray(rng.integers(0, E, (128, 4)), jnp.int32)

        t_rows = scan_time(lambda i: tcq4_matmul_experts_rows(
            acts[i % 128], qs, eff, ids[i % 128]))
        t_dense = scan_time(lambda i: tcq4_matmul_all_experts(
            acts[i % 128], qs, eff))
        t_sel = scan_time(lambda i: tcq4_matmul_experts(
            acts[i % 128, :1], qs, eff, ids[i % 128]))
        for bn in (256, 512):
            if N % bn == 0:
                t = scan_time(lambda i, bn=bn: tcq4_matmul_experts_rows(
                    acts[i % 128], qs, eff, ids[i % 128], bn=bn))
                log(f"E={E} rows bn={bn}: {t*1e6:9.1f} us")
        log(f"E={E} K={K} N={N}: rows {t_rows*1e6:9.1f} us | "
            f"dense {t_dense*1e6:9.1f} us | sel(tiles) {t_sel*1e6:9.1f} us "
            f"| ratio dense/rows {t_dense/t_rows:.2f}")




def variants():
    rng = np.random.default_rng(1)
    E, K, N = 32, 1024, 1024
    qs = jnp.asarray(rng.integers(0, 256, (E, K // 2, N), dtype=np.uint8))
    eff = jnp.asarray((rng.random((E, K // 32, N)) * 0.02)
                      .astype(np.float32), jnp.bfloat16)
    acts = jnp.asarray(rng.standard_normal((128, 4, K)) * 0.3, jnp.float32)
    ids = jnp.asarray(rng.integers(0, E, (128, 4)), jnp.int32)

    def gathered(i):
        sel = ids[i % 128]
        qs_sel = jnp.take(qs, sel, axis=0)          # [4, K/2, N] XLA gather
        eff_sel = jnp.take(eff, sel, axis=0)
        a = acts[i % 128][:, None, :]               # [4, 1, K] per-expert
        return tcq4_matmul_all_experts(a, qs_sel, eff_sel)

    t = scan_time(gathered)
    log(f"gather+static-kernel: {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()
    variants()
