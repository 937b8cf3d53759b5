"""TCQ4 decode-matmul anatomy: split kernel time into streaming, dequant
ALU, and dot at real model shapes (Qwen3-4B gateup: K=2560, N=19456).

Variants, all [1, K] x [K, N] per step over a 256-step scan:
  stream   — kernel only sums the packed qs bytes (streaming ceiling)
  dequant  — full unpack + scale multiply, reduce-sum instead of dot
  full     — the production tcq4_matmul
  bn=...   — production kernel at different N-block sizes

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_tcq4_anatomy.py
"""
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops.tcq4_matmul import tcq4_matmul, _unpack_w4, GROUPS
from rrs_tpu.formats.tcq4 import TILE_K, GROUP_SIZE

K, N = 2560, 19456
STEPS = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _stream_kernel(qs_ref, out_ref, *, bn):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[...] += qs_ref[...].astype(jnp.int32).astype(jnp.float32).sum(
        axis=0, keepdims=True)[:, :128]


def _dequant_kernel(qs_ref, eff_ref, out_ref, *, bn, bk):
    acc = jnp.zeros((1, 128), jnp.float32)
    for sb in range(bk // TILE_K):
        w_q = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        acc += w32.sum(axis=0, keepdims=True)[:, :128]
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[...] += acc


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
    log(f"{label}: {med / STEPS * 1e6:.1f} us/step, "
        f"{work_bytes / (med / STEPS) / 1e9:.0f} GB/s  sum={s:.3e}")


def main():
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
    eff = jnp.asarray(rng.random((K // 32, N), np.float32) * 0.01,
                      jnp.bfloat16)
    wbytes = qs.size + eff.size * 2
    x0 = jnp.asarray(rng.random((1, K), np.float32))

    @jax.jit
    def stream(x):
        def body(c, _):
            out = pl.pallas_call(
                functools.partial(_stream_kernel, bn=2432),
                grid=(N // 2432,),
                in_specs=[pl.BlockSpec((K // 2, 2432), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(qs)
            return c + out.sum() * 1e-20, ()
        c, _ = jax.lax.scan(body, x.sum(), None, length=STEPS)
        return c

    @jax.jit
    def dequant(x):
        def body(c, _):
            out = pl.pallas_call(
                functools.partial(_dequant_kernel, bn=2432, bk=K),
                grid=(N // 2432,),
                in_specs=[
                    pl.BlockSpec((K // 2, 2432), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K // 32, 2432), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(qs, eff)
            return c + out.sum() * 1e-20, ()
        c, _ = jax.lax.scan(body, x.sum(), None, length=STEPS)
        return c

    def full_fn(bn):
        @jax.jit
        def full(x):
            def body(c, _):
                y = tcq4_matmul(c, qs, eff, bn=bn)
                return y[:, :K] * 1e-3 + c * 1e-6, ()
            cc, _ = jax.lax.scan(body, x, None, length=STEPS)
            return cc
        return full

    timed(stream, x0, "stream-only (qs bytes)", qs.size)
    timed(dequant, x0, "dequant-only (unpack+scale)", wbytes)
    for bn in (512, 1024, 2432):
        timed(full_fn(bn), x0, f"full matmul bn={bn}", wbytes)


if __name__ == "__main__":
    main()
