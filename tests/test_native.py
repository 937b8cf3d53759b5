"""Native C++ codecs vs the NumPy reference implementations."""

import numpy as np
import pytest

from rrs_tpu import native
from rrs_tpu.formats import kquants
from rrs_tpu.formats.fwht import fwht_np
from rrs_tpu.formats.tcq4 import quantize_tcq4, effective_scales, unpack_nibbles
from rrs_tpu.formats.tile_codec import encode_tcq4_gguf

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable (no g++?)"
)


def test_fwht_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 256)).astype(np.float32)
    ref = fwht_np(x).astype(np.float32)
    got = native.fwht_rows(x.copy())
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tcq4_quantize_matches_python():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((16, 512)) * 0.07).astype(np.float32)
    t = quantize_tcq4(w)
    qs, sc, S = native.tcq4_quantize(w)
    # scale codes and super-scales must agree exactly
    np.testing.assert_array_equal(sc, t.sc)
    np.testing.assert_array_equal(S.view(np.uint16), t.S.view(np.uint16))
    # int4 codes: C float FWHT vs f64 numpy FWHT can flip values at exact
    # rounding boundaries; require >99.9% exact agreement
    a, b = unpack_nibbles(qs), unpack_nibbles(t.qs)
    agree = (a == b).mean()
    assert agree > 0.999, agree
    np.testing.assert_array_equal(np.abs(a.astype(int) - b.astype(int)) <= 1, True)


def test_tcq4_decode_tiles_matches_python():
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((16, 512)) * 0.07).astype(np.float32)
    t = quantize_tcq4(w)
    blob = np.frombuffer(encode_tcq4_gguf(t), np.uint8)
    qs, eff = native.tcq4_decode_tiles(blob, 16, 512)
    np.testing.assert_array_equal(qs, t.qs)
    np.testing.assert_allclose(eff, effective_scales(t), rtol=1e-6)


@pytest.mark.parametrize("kind,qfn", [
    ("q8_0", None),
    ("q4_k", None),
    ("q6_k", None),
])
def test_dequant_matches_numpy(kind, qfn):
    rng = np.random.default_rng(3)
    sizes = {"q8_0": 34, "q4_k": 144, "q6_k": 210}
    nb = 4
    raw = rng.integers(0, 255, nb * sizes[kind]).astype(np.uint8)
    n = nb * (32 if kind == "q8_0" else 256)
    ref = getattr(kquants, f"dequantize_{kind}")(raw, n)
    got = native.dequant(raw, kind, n)
    # random fp16 scales can be inf/nan; compare with equal_nan
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6, equal_nan=True)


def test_native_bpe_matches_python():
    """The C++ BPE merge engine must produce identical ids to the Python
    path on random byte-encoder fragments."""
    import os
    import numpy as np
    from rrs_tpu import native
    from rrs_tpu.models.vocab import Vocab, _byte_encoder

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    # toy byte-level vocab: all single byte-encoder chars + some merges
    enc = _byte_encoder()
    chars = sorted(set(enc.values()))
    merges = []
    toks = list(chars)
    rng = np.random.default_rng(0)
    for _ in range(200):
        a, b = rng.choice(len(toks), 2)
        merged = toks[a] + toks[b]
        if merged in toks or len(merged) > 6:
            continue
        merges.append(f"{toks[a]} {toks[b]}")
        toks.append(merged)

    v_native = Vocab(model="gpt2", tokens=toks, scores=None,
                     token_types=[1] * len(toks), merges=merges, pre="gpt-2")
    v_python = Vocab(model="gpt2", tokens=toks, scores=None,
                     token_types=[1] * len(toks), merges=merges, pre="gpt-2")
    v_python._bpe_native = None      # force the Python path

    texts = ["hello world", "a" * 50, "the quick brown fox!",
             "ünïcödé tēxt 日本語", "x y z " * 10]
    for t in texts:
        got = v_native.encode(t, add_special=False)
        want = v_python.encode(t, add_special=False)
        assert got == want, (t, got, want)
        assert v_native._bpe_native is not None
