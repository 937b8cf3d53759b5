"""Q8_0 matmul kernel vs oracle + Q8Linear round-trip."""

import numpy as np
import jax.numpy as jnp

from rrs_tpu.formats.kquants import quantize_q8_0
from rrs_tpu.models.linear import Q8Linear, linear_apply
from rrs_tpu.ops.q8_matmul import q8_matmul, q8_matmul_ref


def test_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    m, k, n = 4, 512, 256
    w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    lin = Q8Linear.quantize(w)
    ref = np.asarray(q8_matmul_ref(x, lin.q, lin.scale))
    got = np.asarray(q8_matmul(x, lin.q, lin.scale, bn=128, interpret=True))
    # kernel uses bf16 operands vs the oracle's f32 HIGHEST
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-2)


def test_quantize_accuracy():
    rng = np.random.default_rng(1)
    n, k, m = 128, 256, 3
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    x = (rng.standard_normal((m, k))).astype(np.float32)
    lin = Q8Linear.quantize(w)
    got = np.asarray(linear_apply(lin, jnp.asarray(x)))
    ref = x @ w.T
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.01, rel    # 8-bit error


def test_gguf_payload_roundtrip():
    rng = np.random.default_rng(2)
    n, k = 16, 256
    w = (rng.standard_normal((n, k)) * 0.07).astype(np.float32)
    raw = quantize_q8_0(w)
    lin = Q8Linear.from_q8_gguf(raw, (n, k))
    from rrs_tpu.formats.kquants import dequantize_q8_0
    deq = dequantize_q8_0(raw, n * k).reshape(n, k)
    q = np.asarray(lin.q)[:, :n]          # N axis is tile-padded
    s = np.asarray(lin.scale)[:, :n]
    got = q.T.astype(np.float32) * np.repeat(s.T, 32, axis=1)
    np.testing.assert_allclose(got, deq, rtol=1e-6)


def test_k_padding_non_256_aligned():
    """K not 256-aligned (gpt-oss E=2880 pattern): from_q8_gguf zero-pads K
    to the kernel's 256-multiple and linear_apply pads the activations."""
    rng = np.random.default_rng(3)
    n, k, m = 48, 160, 5                   # kpad = 256
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    raw = quantize_q8_0(w)
    lin = Q8Linear.from_q8_gguf(raw, (n, k))
    assert lin.q.shape[0] == 256 and lin.k_logical == k
    assert lin.shape == (k, n)
    x = rng.standard_normal((m, k)).astype(np.float32)
    got = np.asarray(linear_apply(lin, jnp.asarray(x)))
    ref = x @ w.T
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.01, rel
    assert got.shape == (m, n)
