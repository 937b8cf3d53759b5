"""gx2 (fused-quant group-expanded) kernel geometry sweep at the four
Qwen3-4B decode shapes — the round-4 sweep tuned gx; gx2's prologue
changed the VPU/DMA balance, and smaller bn gives the grid more steps to
overlap the weight unpack with DMA.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_gx2_geometry.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops import tcq4_matmul as mm

M = 1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(fn, ops, steps=256, reps=3):
    xs = jnp.arange(steps, dtype=jnp.int32)

    def run_impl(ops_):
        def body(c, x):
            return c + fn(x, ops_).astype(jnp.float32).sum(), None
        return jax.lax.scan(body, 0.0, xs)[0]

    run = jax.jit(run_impl)
    float(run(ops))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(ops))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    rng = np.random.default_rng(0)
    shapes = {
        "qkv": (2560, 5120), "o": (4096, 2560),
        "gateup": (2560, 19456), "down": (9728, 2560),
    }
    results = {}
    for label, (k, n) in shapes.items():
        qs = jnp.asarray(rng.integers(0, 256, (k // 2, n), dtype=np.uint8))
        eff = jnp.asarray((rng.random((k // 32, n)) * 0.02 + 1e-3)
                          .astype(np.float32), jnp.bfloat16)
        NV = 8
        rot = jax.random.normal(jax.random.PRNGKey(1), (NV, M, k),
                                jnp.float32)
        row = {}
        bks = ([512, 1024] if k > 4096 else
               [1280, 2560] if k == 2560 else [512, 1024, 2048, 4096])
        for bk in bks:
            if k % bk:
                continue
            for bn in (0, 512, 1024):
                if bn and n % bn:
                    continue
                try:
                    t = scan_time(
                        lambda i, ops, bk=bk, bn=bn: mm.tcq4_matmul_gx2(
                            ops[0][i % NV], ops[1], ops[2], bk=bk, bn=bn),
                        (rot, qs, eff))
                except Exception as e:                    # noqa: BLE001
                    log(f"{label} bk={bk} bn={bn}: FAIL {str(e)[:60]}")
                    continue
                row[f"bk{bk}_bn{bn or 'auto'}"] = round(t * 1e6, 2)
        base = scan_time(
            lambda i, ops: mm.tcq4_matmul_gx2(ops[0][i % NV], ops[1],
                                              ops[2]),
            (rot, qs, eff))
        row["default"] = round(base * 1e6, 2)
        for kk, v in sorted(row.items(), key=lambda kv: kv[1])[:6]:
            log(f"{label:7s} {kk:16s} {v:8.2f} us")
        results[label] = row
    print(json.dumps({"metric": "gx2_geometry_us", **results}))


if __name__ == "__main__":
    main()
