"""Quantized (int8) KV cache tests — the type_k/type_v option analog."""

import numpy as np
import pytest

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext


@pytest.fixture(scope="module")
def model():
    cfg = PRESETS["tiny"]
    return cfg, random_weights(cfg, seed=0)


def test_q8_kv_close_to_bf16(model):
    cfg, w = model
    toks = [1, 2, 3, 4, 5]
    ctx_f = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sf = ctx_f.new_sequence()
    lf = ctx_f.prefill(sf, toks)

    ctx_q = InferenceContext(cfg, w, n_lanes=1, max_seq=32, kv_quant="q8")
    sq = ctx_q.new_sequence()
    lq = ctx_q.prefill(sq, toks)

    # int8 KV noise is small; rankings should agree
    np.testing.assert_allclose(lq, lf, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(lq.argmax(-1), lf.argmax(-1))

    # decode continues fine
    df = ctx_f.decode({sf: 7})[sf]
    dq = ctx_q.decode({sq: 7})[sq]
    assert df.argmax() == dq.argmax()


def test_q8_kv_generate_and_shift(model):
    cfg, w = model
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=16, kv_quant="q8")
    out = ctx.generate([1, 2, 3], 5)
    assert len(out) == 5
    s = ctx.new_sequence()
    ctx.prefill(s, [1, 2, 3, 4, 5, 6, 7, 8])
    ctx.kv.seq_shift(cfg, s, 1, 4)
    assert ctx.kv.lengths[ctx.kv.lane_of(s)] == 4
    ctx.decode({s: 2})
