"""Context-shift tests: cache shift + RoPE re-rotation must preserve attention.

The invariant (llama-kv-cache rope-shift): after discarding old cells and
sliding the rest down with a -delta RoPE correction, decoding continues as if
the remaining tokens had been at the shifted positions all along.
"""

import dataclasses

import numpy as np

from rrs_tpu.models.config import PRESETS, ModelConfig
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext


def test_shift_matches_reprefill_single_layer():
    """For a 1-layer model, layer-0 K/V depend only on their own token, so a
    shift must reproduce a fresh prefill of the suffix exactly (for deeper
    models the shifted cache intentionally keeps stale context, as in the
    reference)."""
    cfg = dataclasses.replace(PRESETS["tiny"], n_layers=1)
    w = random_weights(cfg, seed=0)
    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    n_keep, n_discard = 0, 4

    # context A: prefill all, then shift out the first 4 tokens
    ctx_a = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sa = ctx_a.new_sequence()
    ctx_a.prefill(sa, toks)
    ctx_a.kv.seq_shift(cfg, sa, n_keep, n_discard)
    assert ctx_a.kv.lengths[0] == len(toks) - n_discard
    la = ctx_a.decode({sa: 7})[sa]

    # context B: prefill only the surviving suffix at positions 0..3
    ctx_b = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sb = ctx_b.new_sequence()
    ctx_b.prefill(sb, toks[n_discard:])
    lb = ctx_b.decode({sb: 7})[sb]

    np.testing.assert_allclose(la, lb, rtol=5e-2, atol=5e-2)
    assert la.argmax() == lb.argmax()


def test_engine_survives_overflow():
    from rrs_tpu.runtime.sampler import SamplerParams
    from rrs_tpu.serving.engine import Engine, GenRequest
    import queue

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=24)
    eng = Engine(ctx)
    eng.start()
    try:
        q = queue.Queue()
        req = GenRequest(
            prompt_tokens=[1, 2, 3],
            max_tokens=40,              # forces a shift at max_seq=24
            params=SamplerParams(temperature=0.0),
            on_token=lambda t, p, fin, r: q.put((t, fin, r)),
        )
        eng.submit(req)
        toks = []
        while True:
            t, fin, reason = q.get(timeout=300)
            if fin:
                break
            toks.append(t)
        assert len(toks) == 40          # generation crossed the shift boundary
    finally:
        eng.stop()
