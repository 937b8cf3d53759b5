"""q4 KV flash-attention kernel variants at long context (the VERDICT-r3
"q4-KV tax" hunt). Decode shape: B=1, Hkv=8, G=4 (32 q heads), D=128,
S=8192 — the bench_longctx geometry where q4 ran 140.3 tok/s vs bf16
154.2 / q8 158.0.

Variants:
  bf16      — dense bf16 cache (ops/flash_attention.flash_attention)
  q8        — int8 + epilogue scales (flash_attention_q8)
  q4        — current packed-nibble halves layout (flash_attention_q4):
              [BS, 64] u8 tile -> 4 sign-extending shifts at HALF lane
              width + a lane concat + cvt
  q4hp      — PROTOTYPE head-pair layout: u8 [B, Hkv/2, S, D] (head 2j in
              the low nibble, 2j+1 high, biased +8) -> FULL-lane 2-op
              nibble extract; adjacent grid heads revisit the same block
              so HBM traffic stays at 4 bits/element; +8 bias folded into
              the score/PV epilogues.

Timing: 256-step device scan per variant with per-step varying q and a
value readback (PERF.md rules), plus jax.profiler device times.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_kvq4.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from rrs_tpu.ops import flash_attention as fa

B, HKV, G, D, S = 1, 8, 4, 128, 8192
H = HKV * G
SCALE = 1.0 / np.sqrt(D)
NEG_INF = fa.NEG_INF


# --------------------------------------------------------------------------
# q4hp prototype kernel
# --------------------------------------------------------------------------

def _kernel_q4hp(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
                 acc_ref, m_ref, l_ref, *, tq, g, d, bs, s_total, scale):
    h = pl.program_id(1)
    shift = (h & 1) * 4
    ksc = ks_ref[0, 0, 0, :]
    vsc = vs_ref[0, 0, 0, :]
    # FULL-lane nibble extract: u = (p >> shift) & 15 = (v + 8)
    kp = k_ref[0, 0, :, :].astype(jnp.int32)
    vp = v_ref[0, 0, :, :].astype(jnp.int32)
    k = ((kp >> shift) & 15).astype(jnp.float32)       # [BS, D]
    v = ((vp >> shift) & 15).astype(jnp.float32)
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    qsum = q.sum(axis=-1, keepdims=True)               # [TQG, 1]

    si = pl.program_id(3)

    @pl.when(si == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = (scores - 8.0 * qsum) * scale * ksc[None, :]
    pos = pos_ref[0, 0, :]
    kv_slot = si * bs + jax.lax.broadcasted_iota(jnp.int32, (tq, bs), 1)
    mask = (kv_slot <= pos[:, None]) & (pos[:, None] >= 0)
    mask = jnp.broadcast_to(mask[:, None, :], (tq, g, bs)).reshape(tq * g, bs)
    scores = jnp.where(mask, scores, NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    e = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_ref[...] = l_ref[...] * corr + e.sum(axis=-1, keepdims=True)
    e_v = e * vsc[None, :]
    pv = jax.lax.dot_general(
        e_v, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # v_dec = v_true/vsc + 8  =>  e_v @ v_dec = e @ v_true + 8 * rowsum(e_v)
    pv = pv - 8.0 * e_v.sum(axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + pv
    m_ref[...] = m_new

    @pl.when(si == pl.num_programs(3) - 1)
    def _():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        out_ref[0, 0, :, :, :] = out.reshape(tq, g, d).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_q4hp(q, k_q, k_s, v_q, v_s, positions, scale, interpret=False):
    """q [B,T,H,D]; k_q/v_q uint8 [B, Hkv//2, S, D] head-pair packed
    (head 2j low nibble, 2j+1 high, values biased +8); k_s/v_s f32
    [B, Hkv, 1, S]."""
    hkv = k_s.shape[1]
    s = k_q.shape[2]
    q5, pos3, b, t, t_pad, g, d, tq = fa._common(q, positions, hkv, s, 0)
    bs = fa._pick_bs(s)
    grid = (b, hkv, t_pad // tq, s // bs)
    spec_kv = pl.BlockSpec((1, 1, bs, d),
                           lambda b, h, i, si: (b, h // 2, si, 0),
                           memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 1, 1, bs), lambda b, h, i, si: (b, h, 0, si),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, tq), lambda b, h, i, si: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i, si: (b, h, i, 0, 0),
                     memory_space=pltpu.VMEM),
        spec_kv, spec_sc, spec_kv, spec_sc,
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_q4hp, tq=tq, g=g, d=d, bs=bs, s_total=s,
                          scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, g, d),
                               lambda b, h, i, si: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        scratch_shapes=fa._scratch(tq, g, d),
        interpret=interpret,
    )(pos3, q5, k_q, k_s, v_q, v_s)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, q.shape[2], d)[:, :t]


def pack_hp(kq4):
    """int8 [-7..7] [B, Hkv, S, D] -> biased head-pair u8 [B, Hkv/2, S, D]
    (numpy mirror of kv_codec.pack_hp)."""
    b = (kq4.astype(np.int32) + 8).astype(np.uint8)
    return (b[:, 0::2] | (b[:, 1::2] << 4))


def main():
    rng = np.random.default_rng(0)
    kf = rng.standard_normal((B, HKV, S, D)).astype(np.float32)
    vf = rng.standard_normal((B, HKV, S, D)).astype(np.float32)

    from rrs_tpu.runtime.kv_codec import pack4, quantize_rows

    k8, ks = quantize_rows(jnp.asarray(kf), 127.0)
    v8, vs = quantize_rows(jnp.asarray(vf), 127.0)
    k4, ks4 = quantize_rows(jnp.asarray(kf), 7.0)
    v4, vs4 = quantize_rows(jnp.asarray(vf), 7.0)
    k4 = np.asarray(k4)
    v4 = np.asarray(v4)
    ks4 = jnp.asarray(np.asarray(ks4)[:, :, None, :])   # [B,H,1,S]
    vs4 = jnp.asarray(np.asarray(vs4)[:, :, None, :])
    ks8 = jnp.asarray(np.asarray(ks)[:, :, None, :])
    vs8 = jnp.asarray(np.asarray(vs)[:, :, None, :])

    kp = jnp.asarray(pack4(jnp.asarray(k4)))            # halves layout
    vp = jnp.asarray(pack4(jnp.asarray(v4)))
    khp = jnp.asarray(pack_hp(k4))                      # head-pair layout
    vhp = jnp.asarray(pack_hp(v4))
    kbf = jnp.asarray(kf, jnp.bfloat16)
    vbf = jnp.asarray(vf, jnp.bfloat16)

    qs = jnp.asarray(rng.standard_normal((256, B, 1, H, D)), jnp.bfloat16)
    pos = jnp.full((B, 1), S - 2, jnp.int32)

    def scan_over(fn):
        def body(c, qq):
            o = fn(qq)
            return c + o.astype(jnp.float32).sum(), None
        return jax.jit(lambda: jax.lax.scan(body, 0.0, qs)[0])

    variants = {
        "bf16": scan_over(lambda qq: fa.flash_attention(
            qq, kbf, vbf, pos, SCALE)),
        "q8": scan_over(lambda qq: fa.flash_attention_q8(
            qq, k8, ks8, v8, vs8, pos, SCALE)),
        "q4": scan_over(lambda qq: fa.flash_attention_q4(
            qq, kp, ks4, vp, vs4, pos, SCALE)),
        "q4hp": scan_over(lambda qq: fa.flash_attention_q4hp(
            qq, khp, ks4, vhp, vs4, pos, SCALE)),
    }

    # correctness: q4hp vs the q4 oracle semantics on one step
    from rrs_tpu.runtime import kv_codec
    q1 = np.asarray(qs[0], np.float32)
    ref = fa.attention_ref(jnp.asarray(q1), kv_codec.dequantize(k4 * 1, jnp.asarray(np.asarray(ks4))),
                           kv_codec.dequantize(v4 * 1, jnp.asarray(np.asarray(vs4))),
                           pos, SCALE)
    got = fa.flash_attention_q4hp(jnp.asarray(q1), khp, ks4, vhp, vs4,
                                  pos, SCALE)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    print(f"q4hp max|err| vs dequant oracle: {err:.2e}", file=sys.stderr)
    assert err < 2e-2, err

    for name, fn in variants.items():
        fn()  # compile+warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            val = float(fn())
            reps.append(time.perf_counter() - t0)
        per_call = min(reps) / 256 * 1e6
        print(f"{name:6s}: {per_call:8.1f} us/step (256-scan, min of 3; "
              f"sum={val:.3e})", file=sys.stderr)


if __name__ == "__main__":
    main()
