"""Paired-bias (pb) TCQ4 kernel vs the production route, at Qwen3-4B
decode shapes (and a prefill spot-check).

Per-matrix decode timing follows PERF.md rules: 512-step device-side
scans chaining the output back into the input, varied inputs, value
readback; per-call numbers derive from the scan wall time.

Shapes (Qwen3-4B, fused):
  qkv    K=2560  N=4096   (gx today)
  o      K=4096  N=2560   (gx today, bk=1024)
  gateup K=2560  N=19456  (gx today)
  down   K=9728  N=2560   (dequant kernel today — the fat-K overhang)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_pb.py
"""
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops import tcq4_matmul as mm
from rrs_tpu.formats.tcq4 import TILE_K

STEPS = 512
SHAPES = [
    ("qkv", 2560, 4096),
    ("o", 4096, 2560),
    ("gateup", 2560, 19456),
    ("down", 9728, 2560),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fabricate(k, n, seed):
    kj = jax.random.key(seed)
    k1, k2 = jax.random.split(kj)
    qs = jax.random.randint(k1, (k // 2, n), 0, 256, jnp.int32
                            ).astype(jnp.uint8)
    eff = (jax.random.uniform(k2, (k // 32, n), jnp.float32) * 0.01
           ).astype(jnp.bfloat16)
    return qs, eff


def timed_scan(step_fn, x0, label, work_bytes, steps=STEPS):
    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c

    t0 = time.time()
    jax.block_until_ready(run(x0))
    log(f"  {label}: compile {time.time() - t0:.0f}s")
    ts = []
    for r in range(3):
        xx = x0 + (r + 1) * 1e-3
        t0 = time.time()
        out = run(xx)
        s = float(jnp.sum(out))
        ts.append(time.time() - t0)
    med = statistics.median(ts)
    per = med / steps
    # device-side cross-check: the wall number carries ~50 us/step of XLA
    # glue at these tiny shapes; the profiler's largest-jit duration is
    # the trustworthy per-kernel signal (PERF.md methodology)
    dev_per = float("nan")
    try:
        sys.path.insert(0, "/root/repo")
        from bench import device_scan_ms
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                out = run(x0 + 0.5)
                float(jnp.sum(out))
            dev_per = device_scan_ms(td) / steps * 1e3  # us
    except Exception as e:                               # noqa: BLE001
        log(f"  (profiler unavailable: {e})")
    log(f"  {label}: {per * 1e6:.1f} us/call wall "
        f"({work_bytes / per / 1e9:.0f} GB/s), device {dev_per:.1f} us "
        f"({work_bytes / max(dev_per, 1e-9) / 1e3:.0f} GB/s)  (sum={s:.3e})")
    return dev_per if dev_per == dev_per else per


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2] if len(sys.argv) > 2 else None
    for name, k, n in SHAPES:
        if only and name != only:
            continue
        qs, eff = fabricate(k, n, hash(name) % 1000)
        qs_gi = mm.pack_gi_jnp(qs)
        g = k // 32
        wbytes = qs.size + eff.size * 2
        log(f"{name}: K={k} N={n} ({wbytes / 1e6:.1f} MB/call) M={m}")

        x0 = jax.random.uniform(jax.random.key(0), (m, k), jnp.float32)

        # current production route (chain output back to keep values varied)
        def route_step(x, qs=qs, eff=eff, k=k, n=n):
            from rrs_tpu.formats.tcq4 import (quantize_activations_rrs,
                                              dequantize_activations_rrs)
            a_q, a_s = quantize_activations_rrs(x)
            if mm.gx_viable(m, k, n):
                y = mm.tcq4_matmul_gx(a_q, a_s, qs, eff)
            else:
                a = dequantize_activations_rrs(a_q, a_s)
                y = mm.tcq4_matmul(a, qs, eff)
            return jnp.tanh(y[:, :k]) if n >= k else jnp.pad(
                jnp.tanh(y), ((0, 0), (0, k - n)))

        def pb_step(x, qs_gi=qs_gi, eff=eff, k=k, n=n):
            from rrs_tpu.formats.tcq4 import (quantize_activations_rrs,
                                              dequantize_activations_rrs)
            a_q, a_s = quantize_activations_rrs(x)
            a = dequantize_activations_rrs(a_q, a_s)
            a_gi, ag24 = mm.pb_prepare(a)
            y = mm.tcq4_matmul_pb(a_gi, ag24, qs_gi, eff)
            return jnp.tanh(y[:, :k]) if n >= k else jnp.pad(
                jnp.tanh(y), ((0, 0), (0, k - n)))

        t_cur = timed_scan(route_step, x0, "route (gx/dequant)", wbytes)
        t_pb = timed_scan(pb_step, x0, "pb paired-bias", wbytes)
        log(f"  -> pb is {t_cur / t_pb:.2f}x")


if __name__ == "__main__":
    main()
