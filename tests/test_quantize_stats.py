"""Q4_K quantizer + quantize-stats tool (test-quantize-fns/-stats analog)."""

import sys

import numpy as np
import pytest


def test_q4_k_roundtrip_layout_matches_gguf_py():
    """Bytes we emit must decode identically under gguf-py's independent
    Q4_K decoder (layout cross-check) with sane error."""
    sys.path.insert(0, "/root/reference/gguf-py")
    gguf = pytest.importorskip("gguf.quants")
    from rrs_tpu.formats.kquants import dequantize_q4_k, quantize_q4_k

    rng = np.random.default_rng(1)
    x = (rng.standard_normal(256 * 32) * 0.3).astype(np.float32)
    raw = np.frombuffer(quantize_q4_k(x).tobytes(), np.uint8)
    mine = dequantize_q4_k(raw, x.size)
    theirs = gguf.Q4_K.dequantize_blocks(raw.reshape(-1, 144)).reshape(-1)
    np.testing.assert_array_equal(mine, theirs)
    rel = np.sqrt(np.mean((x - mine) ** 2)) / np.sqrt(np.mean(x * x))
    # 4-bit asymmetric over 32-wide blocks on Gaussian data: ~0.073
    assert rel < 0.085, rel


def test_q4_k_edge_blocks():
    from rrs_tpu.formats.kquants import dequantize_q4_k, quantize_q4_k

    # constant, zero, single-outlier and positive-only blocks
    x = np.zeros(256 * 4, np.float32)
    x[256:512] = 1.5
    x[512] = 100.0
    x[768:1024] = np.abs(np.random.default_rng(0).standard_normal(256))
    raw = np.frombuffer(quantize_q4_k(x).tobytes(), np.uint8)
    y = dequantize_q4_k(raw, x.size)
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y[:256], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[256:512], 1.5, rtol=0.05)
    assert abs(y[512] - 100.0) / 100.0 < 0.05


def test_quantize_stats_ordering():
    """W4A4 TCQ4 must be noisier than weight-only Q4_K, which must be
    noisier than Q8_0 — the ordering that explains the reference's PPL
    ladder (Q4_K 13.33 < TCQ4 13.88/14.07, README.md:43-45)."""
    from rrs_tpu.tools.quantize_stats import tensor_stats

    rng = np.random.default_rng(3)
    w = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
    x = rng.standard_normal((32, 512)).astype(np.float32)
    s = tensor_stats(w, x)
    assert s["q8_0"]["rmse_dot"] < s["q4_k"]["rmse_dot"] < s["tcq4"]["rmse_dot"]
    # iid-Gaussian data is W4A4's worst case: ~sqrt(eps_a^2+eps_w^2) ~ 0.19
    # per-term relative noise independent of K
    assert s["tcq4"]["rmse_dot"] < 0.2
    for fmt in s:
        assert np.isfinite(list(s[fmt].values())).all()
