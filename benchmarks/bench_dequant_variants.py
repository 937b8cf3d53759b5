"""Dequant-kernel variant shootout at the fat-K decode shapes (round 4).

The production dequant kernel runs ~470-500 GB/s vs ~718 GB/s pure DMA
(bench_pb round-4 numbers); the overhang is VPU dequant. Variants probe
which part costs:

  prod    — production tcq4_matmul (per-sb unpack+concat+f32 mul+dot)
  twodot  — skip the lo/hi concat: two dots per superblock against
            separately scaled lo/hi halves (lo rows are groups 0-3 of the
            sb, hi rows groups 4-7)
  onedot  — dequant the WHOLE K-chunk into one array, ONE dot per grid
            step (38 -> 1 dot setups on the down shape)
  stream  — byte-sum of qs+eff blocks (the DMA floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_dequant_variants.py
"""
import functools
import statistics
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops.tcq4_matmul import (GROUPS, _pick_bk, _pick_bn, _unpack_w4,
                                     tcq4_matmul)
from rrs_tpu.formats.tcq4 import TILE_K, GROUP_SIZE

STEPS = 512
SHAPES = [("down", 9728, 2560), ("gateup", 2560, 19456), ("o", 4096, 2560)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel_twodot(a_ref, qs_ref, eff_ref, out_ref, *, bm, bn, bk):
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):
        q32 = qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :
                     ].astype(jnp.int32)
        lo = ((q32 << 28) >> 28).astype(jnp.float32)        # [128, bn]
        hi = ((q32 << 24) >> 28).astype(jnp.float32)
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w_lo = (lo.reshape(4, GROUP_SIZE, bn) * e[:4, None, :]
                ).reshape(TILE_K // 2, bn)
        w_hi = (hi.reshape(4, GROUP_SIZE, bn) * e[4:, None, :]
                ).reshape(TILE_K // 2, bn)
        a_lo = a_ref[:, sb * TILE_K: sb * TILE_K + TILE_K // 2]
        a_hi = a_ref[:, sb * TILE_K + TILE_K // 2: (sb + 1) * TILE_K]
        acc += jax.lax.dot_general(
            a_lo, w_lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            a_hi, w_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


def _kernel_onedot(a_ref, qs_ref, eff_ref, out_ref, *, bm, bn, bk):
    parts = []
    for sb in range(bk // TILE_K):
        w_q = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        parts.append((w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
                      * e[:, None, :]).reshape(TILE_K, bn))
    w = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    acc = jax.lax.dot_general(
        a_ref[...], w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


def _kernel_stream(qs_ref, eff_ref, out_ref, *, bn):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[...] += (qs_ref[...].astype(jnp.int32).astype(jnp.float32)
                     .sum(0, keepdims=True)
                     + eff_ref[...].astype(jnp.float32)
                     .sum(0, keepdims=True))


def variant_fn(name, m, k, n, qs, eff):
    bn = _pick_bn(n)
    bk = _pick_bk(k, bn)
    if name == "stream":
        def step(x):
            out = pl.pallas_call(
                functools.partial(_kernel_stream, bn=bn),
                grid=(n // bn, k // bk),
                in_specs=[
                    pl.BlockSpec((bk // 2, bn), lambda i, s: (s, i)),
                    pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, s: (s, i)),
                ],
                out_specs=pl.BlockSpec((1, bn), lambda i, s: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, bn), jnp.float32),
            )(qs, eff)
            return x + out.sum() * 1e-20
        return step, True
    if name == "prod":
        def step(x):
            y = tcq4_matmul(x, qs, eff)
            return jnp.tanh(y[:, :k]) if n >= k else jnp.pad(
                jnp.tanh(y), ((0, 0), (0, k - n)))
        return step, False
    kern = {"twodot": _kernel_twodot, "onedot": _kernel_onedot}[name]

    def step(x):
        grid = (n // bn, 1, k // bk)
        y = pl.pallas_call(
            functools.partial(kern, bm=m, bn=bn, bk=bk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, bk), lambda i, j, s: (j, s)),
                pl.BlockSpec((bk // 2, bn), lambda i, j, s: (s, i)),
                pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j, s: (s, i)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i, j, s: (j, i)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, qs, eff)
        return jnp.tanh(y[:, :k]) if n >= k else jnp.pad(
            jnp.tanh(y), ((0, 0), (0, k - n)))
    return step, False


def timed(step_fn, x0, label, work_bytes, scalar_carry):
    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=STEPS)
        return c

    jax.block_until_ready(run(x0))
    dev = float("nan")
    try:
        from bench import device_scan_ms
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                float(jnp.sum(run(x0 + 0.5)))
            dev = device_scan_ms(td) / STEPS * 1e3
    except Exception as e:                                   # noqa: BLE001
        log(f"  profiler failed: {e}")
    log(f"  {label}: device {dev:.1f} us "
        f"({work_bytes / max(dev, 1e-9) / 1e3:.0f} GB/s)")
    return dev


def main():
    for name, k, n in SHAPES:
        key = jax.random.key(hash(name) % 97)
        k1, k2 = jax.random.split(key)
        qs = jax.random.randint(k1, (k // 2, n), 0, 256, jnp.int32
                                ).astype(jnp.uint8)
        eff = (jax.random.uniform(k2, (k // 32, n)) * 0.01
               ).astype(jnp.bfloat16)
        wbytes = qs.size + eff.size * 2
        log(f"{name}: K={k} N={n} ({wbytes / 1e6:.1f} MB/call)")
        for v in ("stream", "prod", "twodot", "onedot"):
            try:
                step, scalar = variant_fn(v, 1, k, n, qs, eff)
                x0 = (jnp.zeros(()) if scalar
                      else jax.random.uniform(jax.random.key(0), (1, k)))
                timed(step, x0, v, wbytes, scalar)
            except Exception as e:                           # noqa: BLE001
                log(f"  {v}: FAILED {type(e).__name__}: "
                    f"{str(e).splitlines()[-1][:150]}")


if __name__ == "__main__":
    main()
