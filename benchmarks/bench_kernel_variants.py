"""Microbench: TCQ4 decode-kernel variants, weight-streaming GB/s on real TPU.

The default decode kernel (ops/tcq4_matmul.py::tcq4_matmul) dequantizes
weights to bf16 in VMEM: per weight element that is ~5 VPU ops (2x
sign-extending shift pairs, f32 convert, 3D group-scale multiply, bf16
convert), and the measured 470 GB/s (vs 819 GB/s v5e HBM peak) suggests the
kernel is VPU-bound, not DMA-bound.

Variants measured here (all M=1 decode shape, full-K blocks):

  stream    upper bound: sum the packed qs blocks (1 op/element).
  current   tcq4_matmul (bf16 dequant dot).
  blockdiag ONE int8 MXU dot per K-block: activations expanded to a
            block-diagonal [G, K] int8 matrix (G = K/32 groups), weights
            unpacked to BIASED uint4 (AND/shift only, no sign extension),
            dot -> per-group int32 partials [G, bn]; the -8 bias, group
            scale eff, and activation scale are applied in a [G, bn]
            epilogue (0.1 ops/element). The reference's IMMA epilogue
            (tcq4_k32.cu:11) restructured so the MXU does the group dots
            in one pass.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_kernel_variants.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrs_tpu.formats.tcq4 import TILE_K, GROUP_SIZE
from rrs_tpu.ops.tcq4_matmul import (
    tcq4_matmul, tcq4_matmul_ref, _pick_bn, _unpack_w4)

GROUPS = TILE_K // GROUP_SIZE


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# streaming upper bound
# ---------------------------------------------------------------------------

def _kernel_stream(qs_ref, out_ref, *, bn):
    out_ref[...] = jnp.sum(qs_ref[...].astype(jnp.int32), axis=0,
                           keepdims=True).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("bn",))
def stream_only(qs, *, bn=0):
    k2, n = qs.shape
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // k2 // 128 * 128))
    out = pl.pallas_call(
        functools.partial(_kernel_stream, bn=bn),
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((k2, bn), lambda i: (0, i))],
        out_specs=pl.BlockSpec((1, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(qs)
    return out


# ---------------------------------------------------------------------------
# block-diagonal int8 variant
# ---------------------------------------------------------------------------

def _kernel_bd(aexp_ref, sa_ref, asc_ref, qs_ref, eff_ref, out_ref, *, bn, k):
    # aexp: [G, k] int8 block-diagonal expanded activations (packed order)
    # sa:   [G, 128] f32 broadcast per-group sums (precomputed outside)
    # asc:  [G, 128] f32 broadcast per-group a_scale/7
    # qs:   [k//2, bn] uint8; eff: [G, bn] f32 PACKED-group-order scales
    kh = k // 2
    q = qs_ref[...].astype(jnp.int32)       # i8 shifts don't legalize; i32 do
    lo = ((q & 15) ^ 8).astype(jnp.int8)    # two's-complement s4 -> s4+8
    hi = (((q >> 4) & 15) ^ 8).astype(jnp.int8)
    w_u = jnp.concatenate([lo, hi], axis=0)  # [k, bn] packed-k order
    p = jax.lax.dot_general(
        aexp_ref[...], w_u,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)    # [G, bn] per-group dots
    pf = p.astype(jnp.float32) - sa_ref[:, :1] * 8.0
    contrib = pf * eff_ref[...].astype(jnp.float32) * asc_ref[:, :1]
    out_ref[...] = jnp.sum(contrib, axis=0, keepdims=True)


def _packed_perm(k: int):
    """Permutation p with a_packed[j] = a[p[j]] matching concat(lo, hi) of
    the K-major qs layout: j<k/2 -> k_orig = (j//128)*256 + j%128, else +128."""
    j = np.arange(k)
    half = k // 2
    sb = np.where(j < half, j // 128, (j - half) // 128)
    r = np.where(j < half, j % 128, (j - half) % 128)
    off = np.where(j < half, 0, 128)
    return sb * 256 + off + r


@functools.partial(jax.jit, static_argnames=("bn",))
def tcq4_matmul_bd(a_q, a_scale, qs, eff, *, bn=0):
    """M=1 decode: block-diagonal int8 path. a_q int8 [1,K], a_scale [1,K//256]."""
    m, k = a_q.shape
    assert m == 1
    k2, n = qs.shape
    G = k // GROUP_SIZE
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // k2 // 128 * 128))
    perm = _packed_perm(k)
    a_p = a_q[0, perm]                                   # packed order
    gid = jnp.arange(k, dtype=jnp.int32) // GROUP_SIZE   # packed group ids
    aexp = jnp.where(gid[None, :] == jnp.arange(G, dtype=jnp.int32)[:, None],
                     a_p[None, :], 0).astype(jnp.int8)   # [G, k]
    sa = jnp.sum(a_p.reshape(G, GROUP_SIZE).astype(jnp.float32), axis=1)
    sb_of_g = jnp.asarray(perm.reshape(G, GROUP_SIZE)[:, 0] // TILE_K)
    asc = a_scale[0, sb_of_g] / 7.0                      # [G]
    # group scales in packed order: eff row of packed group g is the true
    # group perm[g*32]//32
    eff_p = eff[perm[::GROUP_SIZE] // GROUP_SIZE, :]     # [G, bn-wide N]
    sa_b = jnp.broadcast_to(sa[:, None], (G, 128))
    asc_b = jnp.broadcast_to(asc[:, None], (G, 128))
    out = pl.pallas_call(
        functools.partial(_kernel_bd, bn=bn, k=k),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((G, k), lambda i: (0, 0)),
            pl.BlockSpec((G, 128), lambda i: (0, 0)),
            pl.BlockSpec((G, 128), lambda i: (0, 0)),
            pl.BlockSpec((k2, bn), lambda i: (0, i)),
            pl.BlockSpec((G, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(aexp, sa_b, asc_b, qs, eff_p)
    return out


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def bench_variant(name, fn, qs, eff, k, n, steps=512):
    """Time `fn(a_f32_or_q, ...)` in a device-side scan with varying inputs."""
    bytes_per = qs.nbytes + eff.nbytes

    def body(carry, i):
        a = (jnp.sin(jnp.arange(k, dtype=jnp.float32) * (i + 1.0))
             )[None, :]  # varied per step
        y = fn(a)
        return carry + jnp.sum(y), None

    scan = jax.jit(lambda: jax.lax.scan(
        body, jnp.float32(0.0), jnp.arange(steps, dtype=jnp.float32))[0])
    t0 = time.time()
    v = float(np.asarray(scan()))
    log(f"  {name}: compile+warmup {time.time() - t0:.1f}s (v={v:.3e})")
    times = []
    for _ in range(3):
        t0 = time.time()
        v = float(np.asarray(scan()))
        times.append(time.time() - t0)
    dt = min(times)
    gbps = bytes_per * steps / dt / 1e9
    log(f"  {name}: {dt / steps * 1e3:.3f} ms/call  {gbps:.0f} GB/s  "
        f"(reps {['%.3f' % t for t in times]})")
    return gbps


def main():
    rng = np.random.default_rng(0)
    shapes = [(2560, 9728), (9728, 2560), (2560, 4096)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in sys.argv[1:]]
    for (k, n) in shapes:
        log(f"=== K={k} N={n} ===")
        qs = jnp.asarray(rng.integers(0, 256, (k // 2, n), dtype=np.uint8))
        eff = jnp.asarray(
            rng.uniform(0.001, 0.02, (k // GROUP_SIZE, n)).astype(np.float32))

        def run_current(a, qs=qs, eff=eff):
            return tcq4_matmul(a, qs, eff)

        def run_stream(a, qs=qs):
            return stream_only(qs) + jnp.sum(a) * 0.0

        def run_bd(a, qs=qs, eff=eff, k=k):
            xb = a.reshape(1, k // TILE_K, TILE_K)
            amax = jnp.maximum(jnp.max(jnp.abs(xb), -1), 1e-10)
            q = jnp.clip(jnp.rint(xb * (7.0 / amax)[..., None]), -7, 7
                         ).astype(jnp.int8).reshape(1, k)
            return tcq4_matmul_bd(q, amax, qs, eff)

        # correctness vs oracle first
        a = rng.standard_normal((1, k)).astype(np.float32)
        xb = a.reshape(1, k // TILE_K, TILE_K)
        amax = np.maximum(np.abs(xb).max(-1), 1e-10)
        a_q = np.clip(np.rint(xb * (7.0 / amax)[..., None]), -7, 7
                      ).astype(np.int8).reshape(1, k)
        want = tcq4_matmul_ref(a_q, amax, np.asarray(qs), np.asarray(eff))
        got_bd = np.asarray(tcq4_matmul_bd(
            jnp.asarray(a_q), jnp.asarray(amax), qs, eff))
        err = np.abs(got_bd - want).max() / (np.abs(want).max() + 1e-9)
        log(f"  blockdiag rel err vs oracle: {err:.2e}")
        assert err < 2e-5, err

        bench_variant("stream-bound", run_stream, qs, eff, k, n)
        bench_variant("current bf16", run_current, qs, eff, k, n)
        bench_variant("blockdiag i8", run_bd, qs, eff, k, n)


if __name__ == "__main__":
    main()
