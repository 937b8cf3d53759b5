"""TCQ4 codec golden tests — against the documented formulas, not the reference binary.

Invariants from SURVEY.md §2.1 (ggml-quants.c:1530-1640, tcq4_k32.cu:8-11).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rrs_tpu.formats.fwht import fwht_np
from rrs_tpu.formats import tcq4
from rrs_tpu.formats.tcq4 import (
    TILE_K,
    GROUP_SIZE,
    dequantize_tcq4,
    dequantize_activations_rrs,
    pack_nibbles,
    quantize_activations_rrs,
    quantize_tcq4,
    unpack_nibbles,
)


def test_nibble_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(512, 16)).astype(np.int8)
    packed = pack_nibbles(q)
    assert packed.shape == (256, 16)
    np.testing.assert_array_equal(unpack_nibbles(packed), q)


def _reference_quantize_one_row_group(w8: np.ndarray):
    """Scalar straight-from-the-formula quantizer for an [8, 256] block."""
    rot = np.stack([fwht_np(r) for r in w8]).astype(np.float32)
    q = np.zeros((8, 256), np.int8)
    eff_scale = np.zeros((8, 8), np.float32)
    for c in range(8):
        scales = np.zeros(8, np.float32)
        for g in range(8):
            grp = rot[c, g * 32 : (g + 1) * 32]
            s = np.abs(grp).max() / 7.0
            if s < 1e-10:
                s = 1.0
            scales[g] = s
            for j in range(32):
                q[c, g * 32 + j] = int(
                    np.clip(tcq4.round_half_away(grp[j] / s), -8, 7)
                )
        S = scales.max() if scales.max() > 0 else 1.0
        S16 = np.float32(np.float16(S))
        for g in range(8):
            sc = np.clip(tcq4.round_half_away(scales[g] / S * 127.0), -127, 127)
            eff_scale[c, g] = S16 * sc / 127.0
    return q, eff_scale


def test_quantize_matches_scalar_reference():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((8, 256)) * 0.05).astype(np.float32)
    t = quantize_tcq4(w)
    q_ref, eff_ref = _reference_quantize_one_row_group(w)

    q_got = unpack_nibbles(t.qs)            # [K, N]
    np.testing.assert_array_equal(q_got, q_ref.T)

    S = t.S.astype(np.float32)              # [1, 8]
    sc = t.sc.astype(np.float32)            # [8, 8] = [K//32, N]
    eff_got = (np.repeat(S, 8, axis=0) * sc / 127.0).T  # [N, G]
    np.testing.assert_allclose(eff_got, eff_ref, rtol=1e-6)


def test_dequantize_rotated_formula():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((16, 512)).astype(np.float32)
    t = quantize_tcq4(w)
    deq = dequantize_tcq4(t)                # [K, N] rotated domain
    assert deq.shape == (512, 16)
    q = unpack_nibbles(t.qs).astype(np.float32)
    S = np.repeat(t.S.astype(np.float32), 8, axis=0)
    sc = t.sc.astype(np.float32)
    expected = q.reshape(16, 32, 16) * (S * sc / 127.0).reshape(16, 1, 16)
    np.testing.assert_allclose(deq, expected.reshape(512, 16), rtol=1e-6)


def test_roundtrip_error_bounded():
    # int4 symmetric absmax quantization: error per element <= scale/2 + fp16 S noise.
    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 1024)).astype(np.float32)
    t = quantize_tcq4(w)
    deq = dequantize_tcq4(t, rotated=False)  # back to original domain
    err = np.abs(deq.T - w)
    rel = np.linalg.norm(deq.T - w) / np.linalg.norm(w)
    assert rel < 0.12, rel                    # ~4-bit quantization noise
    assert err.max() < 0.5, err.max()


def test_unrotated_dequant_inverts_perm():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((8, 256)).astype(np.float32)
    perm = rng.permutation(256).astype(np.int32)
    t = quantize_tcq4(w, perm=perm)
    deq = dequantize_tcq4(t, rotated=False).T   # [N, K] original domain
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.12, rel


def test_scale_floor():
    w = np.zeros((8, 256), np.float32)
    t = quantize_tcq4(w)
    # all-zero input: scales floor to 1.0, S=1, sc=127, q=0
    np.testing.assert_array_equal(unpack_nibbles(t.qs), 0)
    np.testing.assert_array_equal(t.sc, 127)
    np.testing.assert_allclose(t.S.astype(np.float32), 1.0)


def test_activation_quant_formula():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 512)).astype(np.float32)
    q, s = quantize_activations_rrs(jnp.asarray(x))
    q = np.asarray(q)
    s = np.asarray(s)
    assert q.shape == (3, 512) and s.shape == (3, 2)
    xb = x.reshape(3, 2, 256)
    amax = np.abs(xb).max(-1)
    np.testing.assert_allclose(s, amax, rtol=1e-6)
    expected = np.clip(np.rint(xb * (7.0 / amax)[..., None]), -7, 7)
    np.testing.assert_array_equal(q.reshape(3, 2, 256), expected)
    # dequant inverse
    deq = np.asarray(dequantize_activations_rrs(jnp.asarray(q), jnp.asarray(s)))
    np.testing.assert_allclose(
        deq, xb.reshape(3, 512), atol=(amax.max() / 7.0) * 0.5 + 1e-6
    )


def test_activation_scale_floor():
    x = np.zeros((1, 256), np.float32)
    q, s = quantize_activations_rrs(jnp.asarray(x))
    assert float(np.asarray(s)[0, 0]) == 1.0
    np.testing.assert_array_equal(np.asarray(q), 0)


def test_w4a4_matmul_end_to_end_accuracy():
    """W·x ≈ dequant(Wq)·dequant(rot(x)q) — the full RRS pipeline numerically."""
    rng = np.random.default_rng(6)
    n, k, m = 64, 512, 4
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)

    t = quantize_tcq4(w)
    w_rot = dequantize_tcq4(t)                      # [K, N] rotated
    x_rot = fwht_np(x.reshape(m, k // TILE_K, TILE_K)).reshape(m, k).astype(np.float32)
    q, s = quantize_activations_rrs(jnp.asarray(x_rot))
    a = np.asarray(dequantize_activations_rrs(q, s))

    got = a @ w_rot
    ref = x @ w.T
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel   # combined W4+A4 quantization noise
