"""Pallas TCQ4 matmul vs the integer oracle (test-backend-ops / test-imma-micro analog)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from rrs_tpu.formats.fwht import fwht_np
from rrs_tpu.formats.tcq4 import (
    TILE_K,
    dequantize_activations_rrs,
    quantize_activations_rrs,
    quantize_tcq4,
)
from rrs_tpu.ops.tcq4_matmul import tcq4_matmul, tcq4_matmul_ref


def _make_case(m, n, k, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.08).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    t = quantize_tcq4(w)
    x_rot = fwht_np(x.reshape(m, k // TILE_K, TILE_K)).reshape(m, k).astype(np.float32)
    a_q, a_s = quantize_activations_rrs(jnp.asarray(x_rot))
    a = dequantize_activations_rrs(a_q, a_s)
    from rrs_tpu.formats.tcq4 import effective_scales
    wargs = (jnp.asarray(t.qs), jnp.asarray(effective_scales(t)))
    return a, (a_q, a_s), wargs, w, x


@pytest.mark.parametrize("m,n,k", [(1, 128, 256), (8, 256, 512), (3, 128, 768)])
def test_kernel_matches_integer_oracle(m, n, k):
    a, (a_q, a_s), wargs, _, _ = _make_case(m, n, k, seed=m + n)
    ref = np.asarray(tcq4_matmul_ref(a_q, a_s, *wargs))
    got = np.asarray(tcq4_matmul(a, *wargs, bn=128, interpret=True, fast=False))
    assert got.shape == (m, n)
    # scales fold into operands => ~1ulp-per-product f32 noise vs the int path
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_full_pipeline_approximates_fp32():
    m, n, k = 4, 256, 512
    a, _, wargs, w, x = _make_case(m, n, k, seed=7)
    got = np.asarray(tcq4_matmul(a, *wargs, bn=128, interpret=True, fast=False))
    ref = x @ w.T
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel


def test_m_padding():
    # non-multiple-of-8 M exercises the pad/slice path
    a, (a_q, a_s), wargs, _, _ = _make_case(5, 128, 256, seed=11)
    ref = np.asarray(tcq4_matmul_ref(a_q, a_s, *wargs))
    got = np.asarray(tcq4_matmul(a, *wargs, bn=128, interpret=True, fast=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fast_mode_close_to_exact():
    m, n, k = 4, 256, 512
    a, (a_q, a_s), wargs, _, _ = _make_case(m, n, k, seed=13)
    exact = np.asarray(tcq4_matmul(a, *wargs, bn=128, interpret=True, fast=False))
    fast = np.asarray(tcq4_matmul(a, *wargs, bn=128, interpret=True, fast=True))
    rel = np.linalg.norm(fast - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel   # bf16 operand rounding only


def test_a8_kernel_matches_ref():
    """The int8 decode kernel reproduces the integer oracle exactly
    (same epilogue summation order, f32)."""
    import jax.numpy as jnp
    from rrs_tpu.ops.tcq4_matmul import tcq4_matmul_a8, tcq4_matmul_ref

    rng = np.random.default_rng(11)
    m, k, n = 3, 512, 256
    a_q = rng.integers(-7, 8, (m, k)).astype(np.int8)
    a_s = (rng.random((m, k // 256), dtype=np.float32) + 0.1)
    qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
    eff = (rng.random((k // 32, n), dtype=np.float32) * 0.02 + 1e-3)
    ref = np.asarray(tcq4_matmul_ref(a_q, a_s, qs, eff))
    got = np.asarray(tcq4_matmul_a8(
        jnp.asarray(a_q), jnp.asarray(a_s), jnp.asarray(qs), jnp.asarray(eff),
        bn=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_a8_kernel_multi_kblock():
    """bk < K exercises the a_scale program-id offset."""
    import jax.numpy as jnp
    from rrs_tpu.ops.tcq4_matmul import tcq4_matmul_a8, tcq4_matmul_ref

    rng = np.random.default_rng(12)
    m, k, n = 1, 1024, 128
    a_q = rng.integers(-7, 8, (m, k)).astype(np.int8)
    a_s = (rng.random((m, k // 256), dtype=np.float32) + 0.1)
    qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
    eff = (rng.random((k // 32, n), dtype=np.float32) * 0.02 + 1e-3)
    ref = np.asarray(tcq4_matmul_ref(a_q, a_s, qs, eff))
    got = np.asarray(tcq4_matmul_a8(
        jnp.asarray(a_q), jnp.asarray(a_s), jnp.asarray(qs), jnp.asarray(eff),
        bn=128, bk=512, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fused_kernel_matches_pipeline():
    """tcq4_matmul_fused == rotate + quantize + tcq4_matmul (fast mode) up
    to bf16 dot rounding; rotation numerics differ (in-kernel f32 dot vs the
    HIGH-precision einsum) by less than the int4 quantization step."""
    import jax.numpy as jnp
    from rrs_tpu.formats.fwht import RRS_BLOCK, hadamard_matrix
    from rrs_tpu.formats.tcq4 import (dequantize_activations_rrs,
                                      quantize_activations_rrs)
    from rrs_tpu.models.linear import rotate_activations
    from rrs_tpu.ops.tcq4_matmul import tcq4_matmul, tcq4_matmul_fused

    rng = np.random.default_rng(21)
    m, k, n = 3, 512, 128
    x = rng.standard_normal((m, k)).astype(np.float32)
    qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
    eff = (rng.random((k // 32, n), dtype=np.float32) * 0.02 + 1e-3)
    had = jnp.asarray(hadamard_matrix(RRS_BLOCK), jnp.float32)

    fused = np.asarray(tcq4_matmul_fused(
        jnp.asarray(x), had, jnp.asarray(qs), jnp.asarray(eff),
        bn=128, interpret=True))

    rot = rotate_activations(jnp.asarray(x), None,
                             precision=jax.lax.Precision.HIGHEST)
    a_q, a_s = quantize_activations_rrs(rot)
    a = dequantize_activations_rrs(a_q, a_s)
    want = np.asarray(tcq4_matmul(a, jnp.asarray(qs), jnp.asarray(eff),
                                  bn=128, interpret=True))
    np.testing.assert_allclose(fused, want, rtol=2e-2, atol=2e-2)


def test_expert_kernels_match_single_expert():
    """tcq4_matmul_experts / _rows (the ggml_mul_mat_id analogs) equal the
    single-expert kernel applied per selected expert."""
    from rrs_tpu.ops.tcq4_matmul import (tcq4_matmul, tcq4_matmul_experts,
                                         tcq4_matmul_experts_rows)

    rng = np.random.default_rng(5)
    n_exp, k, n = 5, 512, 256
    qs = jnp.asarray(rng.integers(0, 256, (n_exp, k // 2, n), dtype=np.uint8))
    eff = jnp.asarray(rng.random((n_exp, k // 32, n), dtype=np.float32) * 0.01)
    ids = jnp.asarray([3, 0, 3, 4], jnp.int32)

    # shared activations: out[e] = a @ w[ids[e]]
    a = jnp.asarray(rng.standard_normal((2, k)), jnp.float32)
    out = tcq4_matmul_experts(a, qs, eff, ids, interpret=True)
    assert out.shape == (4, 2, n)
    for i, e in enumerate(np.asarray(ids)):
        ref = tcq4_matmul(a, qs[e], eff[e], interpret=True)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)

    # per-row activations: out[i] = a[i] @ w[ids[i]]
    ar = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    outr = tcq4_matmul_experts_rows(ar, qs, eff, ids, interpret=True)
    assert outr.shape == (4, n)
    for i, e in enumerate(np.asarray(ids)):
        ref = tcq4_matmul(ar[i:i + 1], qs[e], eff[e], interpret=True)
        np.testing.assert_allclose(np.asarray(outr[i]), np.asarray(ref[0]),
                                   rtol=2e-2, atol=2e-2)


def test_tcq4_matmul_gx_integer_exact():
    """Group-expanded int8 decode kernel (round 3): must reproduce the
    integer oracle to f32-epilogue rounding at decode shapes, for M=1
    and small batched M."""
    import numpy as np
    import jax.numpy as jnp
    from rrs_tpu.formats.tcq4 import quantize_tcq4, effective_scales
    from rrs_tpu.ops.tcq4_matmul import (
        tcq4_matmul_gx, tcq4_matmul_ref, gx_viable)

    rng = np.random.default_rng(5)
    k, n = 512, 256
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    t = quantize_tcq4(w)
    eff32 = effective_scales(t).astype(np.float32)
    for m in (1, 4):
        assert gx_viable(m, k)
        # exercise the K-chunk grid too (k=512 -> 2 chunks of 256)
        a_q = rng.integers(-7, 8, (m, k)).astype(np.int8)
        a_s = (rng.random((m, k // 256)) + 0.5).astype(np.float32)
        got = np.asarray(tcq4_matmul_gx(
            jnp.asarray(a_q), jnp.asarray(a_s), jnp.asarray(t.qs),
            jnp.asarray(eff32, jnp.bfloat16), bk=256, interpret=True))
        # oracle uses f32 eff; kernel upcasts bf16 eff -> compare with
        # bf16-rounded eff for exactness
        effb = np.asarray(jnp.asarray(eff32, jnp.bfloat16), np.float32)
        ref = tcq4_matmul_ref(a_q, a_s, np.asarray(t.qs), effb)
        rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
        assert rel.max() < 1e-5, (m, rel.max())

    # fat-K route (down-shaped, round 4): auto-pick must take bk=512 +
    # full-N blocks and stay integer-exact
    k, n = 5120, 128
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    t = quantize_tcq4(w)
    eff32 = effective_scales(t).astype(np.float32)
    assert gx_viable(1, k, n)
    a_q = rng.integers(-7, 8, (1, k)).astype(np.int8)
    a_s = (rng.random((1, k // 256)) + 0.5).astype(np.float32)
    got = np.asarray(tcq4_matmul_gx(
        jnp.asarray(a_q), jnp.asarray(a_s), jnp.asarray(t.qs),
        jnp.asarray(eff32, jnp.bfloat16), interpret=True))
    effb = np.asarray(jnp.asarray(eff32, jnp.bfloat16), np.float32)
    ref = tcq4_matmul_ref(a_q, a_s, np.asarray(t.qs), effb)
    rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
    assert rel.max() < 1e-5, rel.max()


def test_gx_viable_gate():
    from rrs_tpu.ops.tcq4_matmul import gx_viable

    assert gx_viable(1, 2560) and gx_viable(4, 2560)
    assert gx_viable(1, 2560, 6144) and gx_viable(1, 2560, 19456)
    assert gx_viable(1, 9728, 2560)       # fat-K wins with full-N blocks (r4)
    assert gx_viable(1, 4096, 2560)       # o-shape: moderate K wins
    assert not gx_viable(8, 9728)         # a_exp VMEM blowup
    assert not gx_viable(32, 2560)        # MXU cost exceeds the DMA floor


def test_tcq4_matmul_pb_matches_oracle():
    """Paired-bias decode kernel (round 4): gi repack + biased bf16 bit
    construction + bias-cancel dot must track the integer oracle within
    the bf16 product-rounding bound (2^-9 * 31e per weight), across
    decode and prefill M and multiple K-chunks."""
    from rrs_tpu.formats.tcq4 import (quantize_tcq4, effective_scales,
                                      unpack_nibbles)
    from rrs_tpu.ops.tcq4_matmul import (
        tcq4_matmul_pb, tcq4_matmul_ref, pack_gi_np, pack_gi_jnp,
        pb_prepare)

    rng = np.random.default_rng(11)
    k, n = 1024, 256
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    t = quantize_tcq4(w)
    eff32 = effective_scales(t).astype(np.float32)
    qs_gi = pack_gi_np(t.qs)
    # device repack must agree byte-for-byte with the host repack
    np.testing.assert_array_equal(
        np.asarray(pack_gi_jnp(jnp.asarray(t.qs))), qs_gi)
    # gi layout must be a pure permutation: unpacking through the k_new
    # map recovers the original codes
    g = k // 32
    lo = (qs_gi.astype(np.int8) << 4) >> 4
    hi = qs_gi.astype(np.int8) >> 4
    codes_new = np.stack([lo, hi], 1).reshape(k, n)      # k_new order
    # k_new = j * G + g  <->  k_orig = g * 32 + j
    j = np.arange(k) // g
    gg = np.arange(k) % g
    np.testing.assert_array_equal(codes_new[np.argsort(gg * 32 + j)],
                                  unpack_nibbles(t.qs))

    for m in (1, 4, 16):
        a_q = rng.integers(-7, 8, (m, k)).astype(np.int8)
        a_s = (rng.random((m, k // 256)) + 0.5).astype(np.float32)
        from rrs_tpu.formats.tcq4 import dequantize_activations_rrs
        a = dequantize_activations_rrs(jnp.asarray(a_q), jnp.asarray(a_s))
        a_gi, ag24 = pb_prepare(a)
        got = np.asarray(tcq4_matmul_pb(
            a_gi, ag24, jnp.asarray(qs_gi),
            jnp.asarray(eff32, jnp.bfloat16), bn=128, bk=2 * g,
            interpret=True))
        effb = np.asarray(jnp.asarray(eff32, jnp.bfloat16), np.float32)
        ref = tcq4_matmul_ref(a_q, a_s, np.asarray(t.qs), effb)
        denom = np.abs(ref).max() + 1e-9
        rel = np.abs(got - ref) / denom
        # bf16 rounding of (q+24)*e products + bf16 a. The m>1 bound is
        # looser: the interpret-mode bf16 GEMM at bm>1 rounds differently
        # from the bm=1 path (verified not to be cross-row contamination —
        # identical batched rows produce identical outputs).
        assert rel.max() < (3e-3 if m == 1 else 2e-2), (m, rel.max())


def test_i8p_prefill_kernel_matches_dequant_path():
    """The int8-superblock prefill kernel (round 5) reproduces the
    dequant path within its documented requant tolerance: the in-kernel
    w8 = (w4*f + 4) >> 3 encoding adds <= 4/127*emax per element (an
    8-bit/256-block layer under the format's own e/2 step)."""
    import numpy as np
    import jax.numpy as jnp
    from rrs_tpu.formats.fwht import fwht_np
    from rrs_tpu.formats.tcq4 import (effective_scales, quantize_tcq4,
                                      quantize_activations_rrs)
    from rrs_tpu.ops.tcq4_matmul import (pack_i8p, prep_a_sbi, tcq4_matmul,
                                         tcq4_matmul_i8p)

    rng = np.random.default_rng(3)
    M, K, N = 48, 512, 256
    w = (rng.standard_normal((N, K)) * 0.05).astype(np.float32)
    t = quantize_tcq4(w, use_native=False)
    qs = jnp.asarray(np.ascontiguousarray(t.qs))
    eff = jnp.asarray(np.ascontiguousarray(effective_scales(t)))
    x = (rng.standard_normal((M, K)) * 0.3).astype(np.float32)
    xr = fwht_np(x.reshape(M, K // 256, 256), axis=-1).reshape(M, K)
    a_q, a_s = quantize_activations_rrs(jnp.asarray(xr, jnp.float32))

    a_deq = (jnp.asarray(a_q, jnp.float32)
             * jnp.repeat(jnp.asarray(a_s), 256, 1) / 7.0)
    ref = np.asarray(tcq4_matmul(a_deq, qs, eff, interpret=True))
    qs_sbi, f8, e2 = pack_i8p(qs, eff)
    got = np.asarray(tcq4_matmul_i8p(prep_a_sbi(a_q), a_s, qs_sbi, f8, e2,
                                     interpret=True))
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.9999
    # elementwise: requant bound ~ sum_k |a_k| * 4/127 * emax
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).max() < 0.06 * max(denom, 1e-6) + 0.02


def test_pack_i8p_roundtrip_codes():
    """qs_sbi holds exactly the original int4 codes at the documented
    sb-local interleave (row j*8+g <- logical g*32+j)."""
    import numpy as np
    import jax.numpy as jnp
    from rrs_tpu.ops.tcq4_matmul import pack_i8p

    rng = np.random.default_rng(0)
    K, N = 512, 128
    qs = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)
    eff = (rng.random((K // 32, N)) * 0.1 + 0.01).astype(np.float32)
    qs_sbi, f8, e2 = pack_i8p(jnp.asarray(qs), jnp.asarray(eff))
    qs_sbi = np.asarray(qs_sbi)

    def codes(q):     # [K/2, N] bytes -> [K, N] int4 codes, sb layout
        sb = q.reshape(K // 256, 128, N)
        return np.concatenate([sb & 15, sb >> 4], axis=1).reshape(K, N)

    c0 = codes(qs)
    c1 = codes(qs_sbi)
    for s in range(K // 256):
        blk0 = c0[s * 256:(s + 1) * 256]
        blk1 = c1[s * 256:(s + 1) * 256]
        for g in range(8):
            for j in range(0, 32, 7):
                assert (blk1[j * 8 + g] == blk0[g * 32 + j]).all()
    # f8/e2 reconstruct eff within int8 rounding
    e3 = eff.reshape(-1, 8, N)
    rec = (np.asarray(f8, np.float32).reshape(-1, 8, N) / 127.0
           * (np.asarray(e2)[:, None, :] * 127.0 / 8.0))
    np.testing.assert_allclose(rec, e3, atol=np.abs(e3).max() / 120)


def test_i8p_routed_prefill_matches_dequant_route(monkeypatch):
    """With RRS_PREFILL_I8=1, TCQ4Linear carries the sbi pack and
    linear_apply routes prefill-sized M through tcq4_matmul_i8p
    (interpret-safe check via the route function directly)."""
    import numpy as np
    import jax.numpy as jnp

    monkeypatch.setenv("RRS_PREFILL_I8", "1")
    from rrs_tpu.formats.tcq4 import quantize_tcq4, TCQ4Tensor
    from rrs_tpu.models.linear import TCQ4Linear

    rng = np.random.default_rng(5)
    w = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
    t = quantize_tcq4(w, use_native=False)
    lin = TCQ4Linear.from_tensor(t)
    assert lin.i8p is not None and len(lin.i8p) == 3
    qs_sbi, f8, e2 = lin.i8p
    assert qs_sbi.shape == lin.qs.shape
    assert f8.shape == (512 // 32, 256) and e2.shape == (512 // 256, 256)

    from rrs_tpu.ops.tcq4_matmul import (prep_a_sbi, tcq4_matmul,
                                         tcq4_matmul_i8p)
    from rrs_tpu.formats.tcq4 import quantize_activations_rrs

    rot = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
    a_q, a_s = quantize_activations_rrs(rot)
    eff32 = lin.eff.astype(jnp.float32)
    ref = np.asarray(tcq4_matmul(
        jnp.asarray(a_q, jnp.float32)
        * jnp.repeat(jnp.asarray(a_s), 256, 1) / 7.0,
        lin.qs, eff32, interpret=True))
    got = np.asarray(tcq4_matmul_i8p(prep_a_sbi(a_q), a_s, qs_sbi, f8,
                                     e2.astype(jnp.float32),
                                     interpret=True))
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_gx3_fused_rotation_matches_gx2():
    """gx3 (rotation fused in-kernel, RRS_GX3 flag) is exact vs
    HIGHEST-precision XLA rotation + gx2."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rrs_tpu.formats.fwht import hadamard_matrix
    from rrs_tpu.models.linear import rotate_activations
    from rrs_tpu.ops.tcq4_matmul import tcq4_matmul_gx2, tcq4_matmul_gx3

    rng = np.random.default_rng(2)
    K, N = 512, 256
    qs = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
    eff = jnp.asarray((rng.random((K // 32, N)) * 0.02).astype(np.float32))
    for m in (1, 8):
        x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32))
        rot = rotate_activations(x, None,
                                 precision=jax.lax.Precision.HIGHEST)
        want = np.asarray(tcq4_matmul_gx2(rot, qs, eff, interpret=True))
        had = jnp.asarray(hadamard_matrix(256), jnp.float32)
        got = np.asarray(tcq4_matmul_gx3(x, had, qs, eff, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)
