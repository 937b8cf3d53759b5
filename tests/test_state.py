"""Session state save/restore tests (test-state-restore analog)."""

import numpy as np
import pytest

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime import state


@pytest.fixture(scope="module")
def model():
    cfg = PRESETS["tiny"]
    return cfg, random_weights(cfg, seed=0)


def test_sequence_roundtrip_continues_identically(model, tmp_path):
    cfg, w = model
    toks = [1, 2, 3, 4, 5]

    ctx1 = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    s1 = ctx1.new_sequence()
    ctx1.prefill(s1, toks)
    state.save_sequence(ctx1, s1, tmp_path / "seq.npz", tokens=toks)
    ref = ctx1.decode({s1: 7})[s1]

    ctx2 = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    s2, saved_toks = state.load_sequence(ctx2, tmp_path / "seq.npz")
    assert saved_toks == toks
    got = ctx2.decode({s2: 7})[s2]
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)
    np.testing.assert_array_equal(got.argmax(), ref.argmax())


def test_full_state_roundtrip(model, tmp_path):
    cfg, w = model
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=32)
    a = ctx.new_sequence()
    b = ctx.new_sequence()
    ctx.prefill(a, [1, 2, 3])
    ctx.prefill(b, [9, 8])
    state.save_state(ctx, tmp_path / "full.npz")
    ref = ctx.decode({a: 4, b: 7})

    ctx2 = InferenceContext(cfg, w, n_lanes=2, max_seq=32)
    state.load_state(ctx2, tmp_path / "full.npz")
    assert ctx2.kv.lengths == [3, 2]
    got = ctx2.decode({0: 4, 1: 7})
    for sid in (0, 1):
        np.testing.assert_allclose(got[sid], ref[sid], rtol=1e-2, atol=1e-2)


def test_mismatched_model_rejected(model, tmp_path):
    cfg, w = model
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    s = ctx.new_sequence()
    ctx.prefill(s, [1, 2])
    state.save_sequence(ctx, s, tmp_path / "seq.npz")

    import dataclasses
    cfg2 = dataclasses.replace(cfg, n_layers=1)
    w2 = random_weights(cfg2, seed=0)
    ctx2 = InferenceContext(cfg2, w2, n_lanes=1, max_seq=32)
    with pytest.raises(ValueError, match="mismatch"):
        state.load_sequence(ctx2, tmp_path / "seq.npz")


def test_seq_state_roundtrip_swa_rings(tmp_path):
    """Per-sequence save/restore on an iSWA model (ring layers smaller than
    the sequence) must round-trip without shape errors."""
    import numpy as np

    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.llama import random_weights
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.runtime.state import load_sequence, save_sequence

    cfg = ModelConfig(
        arch="gemma3", n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=128, context_length=512,
        swa_window=8, swa_pattern=2, qk_norm=True)
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=2048)
    assert min(ctx.kv.sizes) < 2048         # a ring layer exists
    seq = ctx.new_sequence()
    toks = list(np.random.default_rng(0).integers(0, 128, 40))
    ctx.prefill(seq, toks)

    p = tmp_path / "seq.npz"
    save_sequence(ctx, seq, p, tokens=toks)
    seq2, toks2 = load_sequence(ctx, p)
    assert toks2 == toks
    lane2 = ctx.kv.lane_of(seq2)
    assert ctx.kv.lengths[lane2] == 40
