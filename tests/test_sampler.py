"""Sampler chain tests (llama-sampling / test-sampling.cpp analog)."""

import numpy as np
import jax
import jax.numpy as jnp

from rrs_tpu.runtime import sampler as S


def _row(vals):
    return jnp.asarray(np.asarray(vals, np.float32)[None, :])


def test_greedy():
    p = S.SamplerParams(temperature=0.0)
    out = S.sample(_row([1.0, 5.0, 2.0]), jax.random.PRNGKey(0), p)
    assert int(out[0]) == 1


def test_top_k_masks_tail():
    logits = _row([5.0, 4.0, 3.0, 2.0, 1.0])
    masked = np.asarray(S.apply_top_k(logits, 2))[0]
    assert masked[0] == 5.0 and masked[1] == 4.0
    assert all(m <= S.NEG_INF for m in masked[2:])


def test_top_p():
    probs = np.array([0.5, 0.3, 0.15, 0.05], np.float32)
    logits = _row(np.log(probs))
    masked = np.asarray(S.apply_top_p(logits, 0.8))[0]
    assert masked[0] > S.NEG_INF and masked[1] > S.NEG_INF
    assert masked[3] <= S.NEG_INF


def test_min_p():
    probs = np.array([0.6, 0.3, 0.05, 0.05], np.float32)
    logits = _row(np.log(probs))
    masked = np.asarray(S.apply_min_p(logits, 0.2))[0]   # cutoff 0.12
    assert masked[0] > S.NEG_INF and masked[1] > S.NEG_INF
    assert masked[2] <= S.NEG_INF


def test_penalties():
    p = S.SamplerParams(penalty_repeat=2.0, penalty_present=0.5)
    logits = jnp.asarray(np.array([2.0, -2.0, 1.0], np.float32))
    counts = jnp.asarray(np.array([1.0, 1.0, 0.0], np.float32))
    out = np.asarray(S.apply_penalties(logits, counts, p))
    assert np.isclose(out[0], 2.0 / 2.0 - 0.5)
    assert np.isclose(out[1], -2.0 * 2.0 - 0.5)
    assert np.isclose(out[2], 1.0)


def test_xtc_drops_high_prob_keeps_lowest_qualifier():
    p = S.SamplerParams(xtc_probability=1.0, xtc_threshold=0.2, temperature=1.0)
    probs = np.array([0.5, 0.3, 0.15, 0.05], np.float32)
    logits = _row(np.log(probs))
    out = np.asarray(S.apply_xtc(logits, jax.random.PRNGKey(0), p))[0]
    # tokens 0,1 qualify (>= 0.2); the lowest qualifier (1) survives
    assert out[0] <= S.NEG_INF
    assert out[1] > S.NEG_INF and out[2] > S.NEG_INF


def test_top_n_sigma():
    logits = _row([10.0, 9.9, 0.0, -5.0])
    out = np.asarray(S.apply_top_n_sigma(logits, 1.0))[0]
    assert out[0] > S.NEG_INF and out[1] > S.NEG_INF
    assert out[3] <= S.NEG_INF


def test_mirostat_v2_updates_mu():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    p = S.SamplerParams(mirostat=2, mirostat_tau=3.0, mirostat_eta=0.2)
    tok, mu = S.mirostat_v2_sample(logits, jax.random.PRNGKey(1), 6.0, p)
    assert 0 <= tok < 100
    assert mu != 6.0


def test_dry_penalizes_repeat_continuation():
    # window ends with "1 2 3" which previously appeared followed by 4
    toks = [9, 1, 2, 3, 4, 7, 1, 2, 3]
    pen = S.dry_penalties(toks, 10, multiplier=1.0, base=2.0, allowed_length=2)
    assert pen is not None and 4 in pen
    assert pen[4] == 1.0 * 2.0 ** (3 - 2)


def test_logit_bias():
    p = S.SamplerParams(temperature=0.0, logit_bias=((0, 100.0),))
    out = S.sample(_row([0.0, 5.0]), jax.random.PRNGKey(0), p)
    assert int(out[0]) == 0


def test_distribution_sampling_respects_seed():
    p = S.SamplerParams(temperature=1.0, top_k=0)
    logits = _row([1.0, 1.0, 1.0, 1.0])
    a = int(S.sample(logits, jax.random.PRNGKey(7), p)[0])
    b = int(S.sample(logits, jax.random.PRNGKey(7), p)[0])
    assert a == b


def test_infill_sampler():
    """llama_sampler_init_infill semantics: EOG dominance check, common-
    prefix merging, 0.2 threshold, EOG fallback."""
    import jax

    from rrs_tpu.runtime.sampler import infill_sample

    pieces = ["", "<eos>", "def", "de", "x", "y"]
    key = jax.random.PRNGKey(0)

    # "de" (p high) and "def": prefix-merge into the higher-p one; both
    # well above threshold -> deterministic winner
    logits = np.full(6, -20.0, np.float32)
    logits[2] = 4.0    # def
    logits[3] = 4.5    # de
    logits[4] = 1.0
    tok = infill_sample(logits, pieces, {1}, key)
    assert tok == 3    # merged mass lands on "de"

    # overwhelming EOG mass -> sample EOG
    logits = np.full(6, -20.0, np.float32)
    logits[1] = 10.0
    logits[2] = 0.0
    assert infill_sample(logits, pieces, {1}, key) == 1

    # nothing above threshold (no prefix relations to merge) and no EOG
    # candidate mass -> EOG fallback
    pieces2 = ["", "<eos>", "aa", "bb", "cc", "dd"]
    logits = np.zeros(6, np.float32)    # uniform: all p = 1/6 < 0.2
    logits[1] = -30.0
    tok = infill_sample(logits, pieces2, {1}, key)
    assert tok == 1
