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


def test_seq_div_self_extend():
    """llama_memory_seq_div (round 4; llama.h:740, self-extend): after
    dividing cached positions by d, the next decode step must match a
    from-scratch forward fed the divided rope positions directly (cells
    keep their slots; cached K is re-rotated by the position delta).

    One layer, like test_shift_matches_reprefill_single_layer: deeper
    models intentionally keep hidden states computed at the ORIGINAL
    positions (the reference's seq_div rotates cached K only, it never
    recomputes upper layers), so exact equality holds only at layer 0.
    Tolerance covers the bf16 activation rounding baked into the cached
    K before the f32 delta-rotation."""
    import jax.numpy as jnp

    from rrs_tpu.models import llama as lm

    cfg = dataclasses.replace(PRESETS["tiny"], n_layers=1)
    w = random_weights(cfg, seed=3)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64,
                           kv_dtype=jnp.float32)
    seq = ctx.new_sequence()
    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    ctx.prefill(seq, toks, all_logits=False)
    ctx.kv.seq_div(cfg, seq, 0, 1 << 30, 2)
    # positions 0..7 -> 0,0,1,1,2,2,3,3; next token decodes at position 4
    assert ctx.kv.pos_offset(0) == 4 - 8
    got = ctx.decode({seq: 7})[seq]

    # oracle: fresh caches, prefill with the divided positions, slot mask
    k, v = lm.scratch_caches(cfg, 1, 64, dtype=jnp.float32)
    slots = jnp.arange(8, dtype=jnp.int32)[None, :]
    pos_div = jnp.asarray([[0, 0, 1, 1, 2, 2, 3, 3]], jnp.int32)
    _, k, v = lm.forward(cfg, w, jnp.asarray([toks], jnp.int32), pos_div,
                         k, v, slots, slots)
    logits, _, _ = lm.forward(
        cfg, w, jnp.asarray([[7]], jnp.int32),
        jnp.asarray([[4]], jnp.int32), k, v,
        jnp.asarray([[8]], jnp.int32), jnp.asarray([[8]], jnp.int32))
    want = np.asarray(logits[0, 0])
    assert int(got.argmax()) == int(want.argmax())
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_seq_div_range_and_identity():
    """d=1 and out-of-range [p0, p1) are no-ops; an in-range division
    only touches cells whose POSITION falls in the range."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=4)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    seq = ctx.new_sequence()
    ctx.prefill(seq, [5, 6, 7, 8], all_logits=False)
    ctx.kv.seq_div(cfg, seq, 0, 100, 1)        # d=1: no-op
    assert 0 not in ctx.kv.slot_pos
    ctx.kv.seq_div(cfg, seq, 100, 200, 4)      # empty range: no-op
    assert 0 not in ctx.kv.slot_pos
    ctx.kv.seq_div(cfg, seq, 2, 100, 2)        # only positions 2,3 divided
    np.testing.assert_array_equal(ctx.kv.slot_pos[0][:4], [0, 1, 1, 1])
    assert ctx.kv.positions_row(0, 4, 2).tolist() == [2, 3]


def test_seq_div_batched_prefill_uses_divided_positions():
    """prefill_multi / prefill_logprobs on a lane whose positions were
    remapped by seq_div must feed the divided rope positions (pos_row),
    matching the sequential prefill path (advisor round-4 finding)."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=5)
    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    cont = [2, 7, 1, 8]

    ctx_a = InferenceContext(cfg, w, n_lanes=2, max_seq=64)
    seq_a = ctx_a.new_sequence()
    ctx_a.prefill(seq_a, toks, all_logits=False)
    ctx_a.kv.seq_div(cfg, seq_a, 0, 1 << 30, 2)
    want = ctx_a.prefill(seq_a, cont, all_logits=False)[-1]  # _run: pos_row

    ctx_b = InferenceContext(cfg, w, n_lanes=2, max_seq=64)
    seq_b = ctx_b.new_sequence()
    ctx_b.prefill(seq_b, toks, all_logits=False)
    ctx_b.kv.seq_div(cfg, seq_b, 0, 1 << 30, 2)
    got = ctx_b.prefill_multi({seq_b: cont})[seq_b]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # prefill_logprobs picks the same divided-position logits
    ctx_c = InferenceContext(cfg, w, n_lanes=2, max_seq=64)
    seq_c = ctx_c.new_sequence()
    ctx_c.prefill(seq_c, toks, all_logits=False)
    ctx_c.kv.seq_div(cfg, seq_c, 0, 1 << 30, 2)
    lp = ctx_c.prefill_logprobs(seq_c, cont, cont[1:] + [0])
    ref = np.asarray(want, np.float64)
    ref = ref - np.log(np.exp(ref - ref.max()).sum()) - ref.max()
    np.testing.assert_allclose(lp[-1], ref[0], rtol=2e-2, atol=2e-2)
