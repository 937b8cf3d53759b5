"""Block-geometry sweep for the decode matmul kernels (round 4).

Hypothesis: the per-shape overhang vs the DMA floor is block GEOMETRY,
not VPU arithmetic — the qs arrays are uint8, so a BlockSpec lane dim of
bn means bn-BYTE DMA bursts. Shapes picked with bn=640-1280 (down, o)
burst 640-1280 bytes/row, while the 718 GB/s "floor" was measured on
2 KB-burst gateup blocks. Full-N blocks (bn = N, fully contiguous rows)
with small bk give both contiguous DMA and a deep pipeline (many grid
steps to hide the first fetch + VPU work).

Sweeps (kernel, bn, bk) per decode shape at M=1 and prints device
us/call via the profiler (wall numbers through the relay are noise).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_geometry.py [shape]
"""
import statistics
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops import tcq4_matmul as mm

STEPS = 512

# shape -> list of (kernel, bn, bk); (kernel, 0, 0) = production pick
CONFIGS = {
    # K, N, [(kern, bn, bk), ...]
    "qkv": (2560, 4096, [
        ("gx", 0, 0),            # current: bn=2048 bk=1280
        ("gx", 2048, 256),
        ("gx", 2048, 512),
        ("gx", 4096, 256),
    ]),
    "o": (4096, 2560, [
        ("gx", 0, 0),            # current: bn=1280 bk=1024
        ("gx", 2560, 256),
        ("gx", 2560, 512),
        ("dequant", 2560, 512),
    ]),
    "gateup": (2560, 19456, [
        ("gx", 0, 0),            # current: bn=1024 bk=1280
        ("gx", 2432, 512),
        ("gx", 2432, 1280),
        ("gx", 4864, 256),
    ]),
    "down": (9728, 2560, [
        ("dequant", 0, 0),       # current: bn=640 bk=4864
        ("dequant", 2560, 512),
        ("dequant", 2560, 256),
        ("gx", 2560, 256),
        ("gx", 2560, 512),
    ]),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    from bench import device_scan_ms
    from rrs_tpu.formats.tcq4 import (quantize_activations_rrs,
                                      dequantize_activations_rrs)

    for name, (k, n, configs) in CONFIGS.items():
        if only and name != only:
            continue
        kj = jax.random.key(hash(name) % 97)
        k1, k2 = jax.random.split(kj)
        qs = jax.random.randint(k1, (k // 2, n), 0, 256, jnp.int32
                                ).astype(jnp.uint8)
        eff = (jax.random.uniform(k2, (k // 32, n)) * 0.01
               ).astype(jnp.bfloat16)
        wbytes = qs.size + eff.size * 2
        log(f"{name}: K={k} N={n} ({wbytes / 1e6:.1f} MB/call)  "
            f"floor@718GB/s={wbytes / 718e9 * 1e6:.1f} us")

        for kern, bn, bk in configs:
            def step(x, kern=kern, bn=bn, bk=bk):
                a_q, a_s = quantize_activations_rrs(x)
                if kern == "gx":
                    y = mm.tcq4_matmul_gx(a_q, a_s, qs, eff, bn=bn, bk=bk)
                else:
                    a = dequantize_activations_rrs(a_q, a_s)
                    y = mm.tcq4_matmul(a, qs, eff, bn=bn, bk=bk)
                return jnp.tanh(y[:, :k]) if n >= k else jnp.pad(
                    jnp.tanh(y), ((0, 0), (0, k - n)))

            @jax.jit
            def run(x):
                def body(c, _):
                    return step(c), ()
                c, _ = jax.lax.scan(body, x, None, length=STEPS)
                return c

            x0 = jax.random.uniform(jax.random.key(0), (1, k), jnp.float32)
            label = f"{kern} bn={bn or 'auto'} bk={bk or 'auto'}"
            try:
                t0 = time.time()
                jax.block_until_ready(run(x0))
                ct = time.time() - t0
                with tempfile.TemporaryDirectory() as td:
                    with jax.profiler.trace(td):
                        float(jnp.sum(run(x0 + 0.5)))
                    dev = device_scan_ms(td) / STEPS * 1e3
                log(f"  {label}: device {dev:.1f} us "
                    f"({wbytes / max(dev, 1e-9) / 1e3:.0f} GB/s) "
                    f"[compile {ct:.0f}s]")
            except Exception as e:                           # noqa: BLE001
                log(f"  {label}: FAILED {type(e).__name__}: "
                    f"{str(e).splitlines()[-1][:140]}")


if __name__ == "__main__":
    main()
