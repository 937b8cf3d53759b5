"""Flash-attention kernel vs jnp oracle (FLASH_ATTN_EXT coverage of
test-backend-ops; mask/GQA/softcap variants)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rrs_tpu.ops.flash_attention import attention_ref, flash_attention


def _case(b, t, h, hkv, d, s, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize(
    "b,t,h,hkv,d,s",
    [
        (1, 1, 8, 2, 64, 128),     # decode, GQA x4
        (2, 4, 4, 4, 128, 64),     # MHA small prefill
        (1, 16, 8, 4, 64, 128),    # chunked prefill
    ],
)
def test_matches_oracle(b, t, h, hkv, d, s):
    q, k, v = _case(b, t, h, hkv, d, s, seed=t + h)
    rng = np.random.default_rng(1)
    pos = jnp.asarray(
        rng.integers(0, s - 1, (b, t)).astype(np.int32)
    )
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(attention_ref(q, k, v, pos, scale))
    got = np.asarray(flash_attention(q, k, v, pos, scale, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_padded_rows_zero():
    q, k, v = _case(2, 2, 4, 2, 64, 32, seed=5)
    pos = jnp.asarray(np.array([[3, 4], [-1, -1]], np.int32))
    scale = 0.125
    got = np.asarray(flash_attention(q, k, v, pos, scale, interpret=True))
    ref = np.asarray(attention_ref(q, k, v, pos, scale))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    assert np.all(got[1] == 0.0)


def test_softcap():
    q, k, v = _case(1, 2, 4, 2, 64, 32, seed=6)
    pos = jnp.asarray(np.array([[10, 11]], np.int32))
    ref = np.asarray(attention_ref(q, k, v, pos, 0.125, softcap=30.0))
    got = np.asarray(flash_attention(q, k, v, pos, 0.125, softcap=30.0, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_causal_equivalence_with_full_recompute():
    """Prefill with cache == full causal attention on the same tokens."""
    b, t, h, hkv, d = 1, 8, 4, 2, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    kv = rng.standard_normal((b, hkv, t, d)).astype(np.float32)
    k = jnp.asarray(kv)
    v = jnp.asarray(rng.standard_normal((b, hkv, t, d)).astype(np.float32))
    pos = jnp.asarray(np.arange(t, dtype=np.int32)[None, :])
    out = np.asarray(flash_attention(q, k, v, pos, 0.125, interpret=True))
    # manual causal reference
    ref = np.asarray(attention_ref(q, k, v, pos, 0.125))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_q8_variant_matches_dequant_ref():
    from rrs_tpu.ops.flash_attention import flash_attention_q8

    b, t, h, hkv, d, s = 1, 2, 4, 2, 64, 32
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    kf = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    vf = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-10) / 127.0
    vs = np.maximum(np.abs(vf).max(-1), 1e-10) / 127.0
    kq = np.clip(np.rint(kf / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.rint(vf / vs[..., None]), -127, 127).astype(np.int8)
    pos = jnp.asarray(np.array([[5, 6]], np.int32))
    scale = 0.125

    kd = kq.astype(np.float32) * ks[..., None]
    vd = vq.astype(np.float32) * vs[..., None]
    ref = np.asarray(attention_ref(q, jnp.asarray(kd), jnp.asarray(vd), pos, scale))
    got = np.asarray(flash_attention_q8(
        q, jnp.asarray(kq), jnp.asarray(ks[:, :, None, :]),
        jnp.asarray(vq), jnp.asarray(vs[:, :, None, :]),
        pos, scale, interpret=True,
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_q4hp_variant_matches_dequant_ref():
    """Head-pair packed-int4 kernel (full-lane decode + biased nibbles,
    kv_bias epilogue) vs the dequantized oracle — with softcap, a
    sliding window and sinks in the mix."""
    from rrs_tpu.ops.flash_attention import flash_attention_q4hp
    from rrs_tpu.runtime import kv_codec

    b, t, h, hkv, d, s = 1, 2, 8, 4, 64, 128
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    kf = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    kq, ks = kv_codec.quantize_rows(kf, 7.0)
    vq, vs = kv_codec.quantize_rows(vf, 7.0)
    khp, vhp = kv_codec.pack_hp(kq), kv_codec.pack_hp(vq)
    ks4 = jnp.asarray(np.asarray(ks)[:, :, None, :])
    vs4 = jnp.asarray(np.asarray(vs)[:, :, None, :])
    pos = jnp.asarray(np.array([[64, 65]], np.int32))
    scale = 0.125
    kd = kv_codec.dequantize(khp, ks4)
    vd = kv_codec.dequantize(vhp, vs4)
    sinks = np.linspace(-1.0, 1.0, h).astype(np.float32)
    for kw in ({}, {"softcap": 5.0}, {"window": 32},
               {"sinks": jnp.asarray(sinks)}):
        ref = np.asarray(attention_ref(q, kd, vd, pos, scale, **kw))
        got = np.asarray(flash_attention_q4hp(
            q, khp, ks4, vhp, vs4, pos, scale, interpret=True, **kw))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=str(kw))


def test_flash_s_tiling_matches_ref():
    """Online-softmax S-tiling (S=512, bs divides into multiple tiles) must
    match the naive oracle, including windowed rows whose early tiles are
    fully masked."""
    import jax.numpy as jnp

    from rrs_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    b, t, h, hkv, s, d = 1, 4, 4, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    pos = jnp.asarray([[300, 301, 302, 303]], jnp.int32)
    for window in (0, 32):
        out = fa.flash_attention(q, k, v, pos, 0.125, window=window,
                                 interpret=True)
        ref = fa.attention_ref(q, k, v, pos, 0.125, window=window)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"w={window}")


def test_attention_sinks():
    """Per-head sink logits join the softmax denominator only (soft_max_ext
    src[4]; gpt-oss): large sinks shrink outputs toward zero, and the flash
    kernel matches the oracle."""
    import jax.numpy as jnp

    from rrs_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(11)
    b, t, h, hkv, s, d = 1, 4, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    pos = jnp.asarray([[60, 61, 62, 63]], jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(h), jnp.float32)

    out = fa.flash_attention(q, k, v, pos, 0.125, sinks=sinks, interpret=True)
    ref = fa.attention_ref(q, k, v, pos, 0.125, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # a huge sink should absorb (almost) all attention mass
    big = jnp.full((h,), 40.0, jnp.float32)
    out_big = fa.attention_ref(q, k, v, pos, 0.125, sinks=big)
    assert np.abs(np.asarray(out_big)).max() < 1e-3
    # no sinks != sinks
    base = fa.attention_ref(q, k, v, pos, 0.125)
    assert np.abs(np.asarray(base) - np.asarray(ref)).max() > 1e-4


def test_attention_sinks_q8_kv():
    """Sinks + int8-quantized KV (the gpt-oss + -ctk q8 combination,
    previously rejected in models/llama.py)."""
    import jax.numpy as jnp

    from rrs_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(12)
    b, t, h, hkv, s, d = 1, 4, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    pos = jnp.asarray([[60, 61, 62, 63]], jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(h), jnp.float32)

    # per-slot symmetric int8 quantization of K/V
    def q8(x):
        sc = jnp.abs(x).max(-1, keepdims=True) / 127.0
        sc = jnp.maximum(sc, 1e-10)
        return (jnp.round(x / sc).astype(jnp.int8),
                sc[..., 0][:, :, None, :])          # [B, Hkv, 1, S]

    kq, ks = q8(k)
    vq, vs = q8(v)
    out = fa.flash_attention_q8(q, kq, ks, vq, vs, pos, 0.125, sinks=sinks,
                                interpret=True)
    ref = fa.attention_ref(q, k, v, pos, 0.125, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_alibi_matches_manual_softmax():
    """ALiBi (round 4): the kernel's in-epilogue slope bias must match a
    hand-rolled softmax with ggml_get_alibi_slope slopes and the
    -(q_pos - kv_pos) mask values the reference feeds when use_alibi
    (llama-kv-cache.cpp:1317). Non-power-of-2 head count exercises the
    m1 branch."""
    import jax
    from rrs_tpu.ops.flash_attention import alibi_slopes_np

    b, t, h, hkv, d, s = 1, 3, 6, 3, 64, 128
    max_bias = 8.0
    q, k, v = _case(b, t, h, hkv, d, s, seed=9)
    pos = jnp.asarray(np.array([[5, 40, 99]], np.int32))
    scale = 1.0 / np.sqrt(d)

    slopes = alibi_slopes_np(h, max_bias)
    # h=6, nhl2=4: heads 0-3 use m0^(h+1), heads 4-5 use m1^(2(h-4)+1)
    nhl2 = 4
    m0, m1 = 2.0 ** (-max_bias / nhl2), 2.0 ** (-max_bias / 2 / nhl2)
    np.testing.assert_allclose(slopes[:4], [m0, m0**2, m0**3, m0**4],
                               rtol=1e-6)
    np.testing.assert_allclose(slopes[4:], [m1, m1**3], rtol=1e-6)

    qf = np.asarray(q, np.float64)
    kf = np.asarray(k, np.float64)
    vf = np.asarray(v, np.float64)
    g = h // hkv
    want = np.zeros((b, t, h, d))
    for ti in range(t):
        p = int(pos[0, ti])
        for hh in range(h):
            kv = kf[0, hh // g]
            sc = (qf[0, ti, hh] @ kv.T) * scale
            dist = np.arange(s) - p
            sc = sc + slopes[hh] * dist
            sc[np.arange(s) > p] = -np.inf
            e = np.exp(sc - sc.max())
            want[0, ti, hh] = (e / e.sum()) @ vf[0, hh // g]

    ref = np.asarray(attention_ref(q, k, v, pos, scale, alibi=max_bias))
    got = np.asarray(flash_attention(q, k, v, pos, scale, alibi=max_bias,
                                     interpret=True))
    np.testing.assert_allclose(ref, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_alibi_q8_kv():
    """ALiBi composes with the quantized-KV kernels."""
    from rrs_tpu.runtime import kv_codec
    from rrs_tpu.ops.flash_attention import flash_attention_q8

    b, t, h, hkv, d, s = 1, 2, 4, 2, 64, 128
    q, k, v = _case(b, t, h, hkv, d, s, seed=10)
    pos = jnp.asarray(np.array([[30, 90]], np.int32))
    scale = 1.0 / np.sqrt(d)
    kq, ksr = kv_codec.quantize_rows(k, 127.0)
    vq, vsr = kv_codec.quantize_rows(v, 127.0)
    ks = ksr[:, :, None, :]                    # [B, H, 1, S]
    vs = vsr[:, :, None, :]
    kd, vd = kv_codec.dequantize(kq, ks), kv_codec.dequantize(vq, vs)
    ref = np.asarray(attention_ref(q, kd, vd, pos, scale, alibi=4.0))
    got = np.asarray(flash_attention_q8(q, kq, ks, vq, vs, pos, scale,
                                        alibi=4.0, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
