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
