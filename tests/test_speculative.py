"""Speculative decoding tests (common/speculative.cpp behavior)."""

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams
from rrs_tpu.runtime.speculative import generate_speculative


def test_self_draft_matches_greedy_and_accepts_everything():
    """With draft == target, speculation must reproduce plain greedy output
    and accept every drafted token."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    prompt = [1, 2, 3]
    n_new = 10

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    ref = ctx.generate(prompt, n_new, SamplerParams(temperature=0.0))

    target = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    draft = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    got, stats = generate_speculative(target, draft, prompt, n_new, n_draft=3)

    assert got == ref, (got, ref)
    assert stats.acceptance_rate == 1.0, stats


def test_different_draft_still_correct():
    """A mismatched draft must not change the target's greedy output."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    w_draft = random_weights(cfg, seed=99)
    prompt = [5, 6]
    n_new = 8

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    ref = ctx.generate(prompt, n_new, SamplerParams(temperature=0.0))

    target = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    draft = InferenceContext(cfg, w_draft, n_lanes=1, max_seq=64)
    got, stats = generate_speculative(target, draft, prompt, n_new, n_draft=3)

    assert got == ref, (got, ref)
    assert 0.0 <= stats.acceptance_rate <= 1.0
