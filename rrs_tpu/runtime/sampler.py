"""Chain-composable samplers (the llama-sampling.cpp analog).

Each sampler is a pure transform on a logits row; chains compose left to
right like llama_sampler_chain (include/llama.h:1297-1454). All math is jnp
so sampling can run on device inside the jitted step (the reference's
"backend sampling" path, llama.h:1012-1035) or on host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplerParams:
    temperature: float = 1.0
    top_k: int = 0                  # 0 = disabled
    top_p: float = 1.0
    min_p: float = 0.0
    typical_p: float = 1.0
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    penalty_last_n: int = 64
    seed: int = 42
    # XTC (exclude-the-common) sampler
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    # top-n-sigma
    top_n_sigma: float = 0.0        # 0 = disabled
    # mirostat (stateful; engine carries mu per slot)
    mirostat: int = 0               # 0 off, 2 = mirostat v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    # static per-token logit offsets
    logit_bias: tuple = ()          # ((token_id, bias), ...)
    # DRY repeat suppression
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def apply_penalties(
    logits: jnp.ndarray,            # [V]
    recent_counts: jnp.ndarray,     # [V] occurrence counts in the penalty window
    p: SamplerParams,
) -> jnp.ndarray:
    """Repetition/frequency/presence penalties (llama_sampler_penalties)."""
    if p.penalty_repeat == 1.0 and p.penalty_freq == 0.0 and p.penalty_present == 0.0:
        return logits
    present = recent_counts > 0
    if p.penalty_repeat != 1.0:
        pen = jnp.where(logits > 0, logits / p.penalty_repeat, logits * p.penalty_repeat)
        logits = jnp.where(present, pen, logits)
    logits = logits - recent_counts * p.penalty_freq
    logits = logits - present.astype(logits.dtype) * p.penalty_present
    return logits


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the first)
    cutoff_mask = cum - probs < top_p
    threshold = jnp.min(
        jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, NEG_INF, logits)


def apply_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = jnp.max(probs, axis=-1, keepdims=True) * min_p
    return jnp.where(probs < cutoff, NEG_INF, logits)


def apply_typical(logits: jnp.ndarray, typ_p: float) -> jnp.ndarray:
    """Locally-typical sampling (llama_sampler_typical)."""
    if typ_p >= 1.0:
        return logits
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=-1, keepdims=True)
    shifted = jnp.abs(-log_probs - entropy)
    order = jnp.argsort(shifted, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = cum - probs_sorted < typ_p
    keep = jnp.zeros_like(keep_sorted)
    keep = jnp.put_along_axis(keep, order, keep_sorted, axis=-1, inplace=False)
    return jnp.where(keep, logits, NEG_INF)


def apply_xtc(logits: jnp.ndarray, key: jax.Array, p: SamplerParams) -> jnp.ndarray:
    """XTC (llama_sampler_xtc): with probability xtc_probability, drop every
    token whose prob exceeds the threshold EXCEPT the least likely of them."""
    if p.xtc_probability <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    over = probs >= p.xtc_threshold
    n_over = over.sum(-1, keepdims=True)
    # keep the lowest-probability qualifying token: mask others when >= 2 qualify
    min_over = jnp.min(jnp.where(over, probs, jnp.inf), axis=-1, keepdims=True)
    drop = over & (probs > min_over) & (n_over >= 2)
    gate = jax.random.uniform(key, logits.shape[:-1] + (1,)) < p.xtc_probability
    return jnp.where(drop & gate, NEG_INF, logits)


def apply_top_n_sigma(logits: jnp.ndarray, n_sigma: float) -> jnp.ndarray:
    """top-n-sigma (llama_sampler_top_n_sigma): keep logits within n*std of max."""
    if n_sigma <= 0.0:
        return logits
    valid = logits > NEG_INF / 2
    cnt = valid.sum(-1, keepdims=True)
    mean = jnp.where(valid, logits, 0.0).sum(-1, keepdims=True) / cnt
    var = (jnp.where(valid, logits - mean, 0.0) ** 2).sum(-1, keepdims=True) / cnt
    std = jnp.sqrt(var)
    cutoff = logits.max(-1, keepdims=True) - n_sigma * std
    return jnp.where(logits < cutoff, NEG_INF, logits)


def apply_logit_bias(logits: jnp.ndarray, bias: tuple) -> jnp.ndarray:
    for tid, b in bias:
        logits = logits.at[..., int(tid)].add(float(b))
    return logits


def mirostat_v2_sample(
    logits: jnp.ndarray,            # [V]
    key: jax.Array,
    mu: float,
    p: SamplerParams,
) -> tuple[int, float]:
    """Mirostat v2 (llama_sampler_mirostat_v2): truncate tokens with surprise
    > mu, sample, then update mu toward the target entropy tau."""
    import numpy as np

    lg = np.asarray(logits, np.float64) / max(p.temperature, 1e-6)
    lg -= lg.max()
    probs = np.exp(lg)
    probs /= probs.sum()
    surprise = -np.log2(np.maximum(probs, 1e-30))
    keep = surprise <= mu
    if not keep.any():
        keep[np.argmax(probs)] = True
    pk = np.where(keep, probs, 0.0)
    pk /= pk.sum()
    u = float(jax.random.uniform(key))
    token = int(np.searchsorted(np.cumsum(pk), u))
    token = min(token, len(pk) - 1)
    observed = float(surprise[token])
    mu = mu - p.mirostat_eta * (observed - p.mirostat_tau)
    return token, mu


def sample(
    logits: jnp.ndarray,            # [B, V] f32
    key: jax.Array,
    p: SamplerParams,
    recent_counts: Optional[jnp.ndarray] = None,   # [B, V]
) -> jnp.ndarray:
    """Apply the sampler chain and draw one token per row. Returns [B] int32."""
    if p.logit_bias:
        logits = apply_logit_bias(logits, p.logit_bias)
    if recent_counts is not None:
        logits = jax.vmap(lambda l, c: apply_penalties(l, c, p))(logits, recent_counts)
    if p.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    key, kx = jax.random.split(key)
    logits = logits / max(p.temperature, 1e-6)
    logits = apply_xtc(logits, kx, p)
    logits = apply_top_n_sigma(logits, p.top_n_sigma)
    logits = apply_top_k(logits, p.top_k)
    logits = apply_typical(logits, p.typical_p)
    logits = apply_top_p(logits, p.top_p)
    logits = apply_min_p(logits, p.min_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def device_penalties(
    logits: jnp.ndarray,            # [B, V] f32
    counts: jnp.ndarray,            # [B, V] f32 penalty-window counts
    rep: jnp.ndarray,               # [B] f32 (1.0 = off)
    frq: jnp.ndarray,               # [B] f32
    prs: jnp.ndarray,               # [B] f32
    bias: jnp.ndarray,              # [B, V] f32 dense logit bias
) -> jnp.ndarray:
    """Per-lane repetition/frequency/presence penalties + logit bias as a
    jit-friendly [B, V] transform (the device-run twin of apply_penalties;
    llama_sampler_penalties semantics). Lanes with rep=1/frq=0/prs=0 and a
    zero bias row pass through unchanged, so penalty-free lanes cost only
    the vector ops."""
    present = counts > 0
    r = rep[:, None]
    pen = jnp.where(logits > 0, logits / r, logits * r)
    logits = jnp.where(present, pen, logits)
    logits = logits - counts * frq[:, None] - \
        present.astype(logits.dtype) * prs[:, None]
    return logits + bias


def device_xtc(
    logits: jnp.ndarray,            # [B, V] f32 (post-penalties)
    keys: jnp.ndarray,              # [B] PRNG keys
    temp: jnp.ndarray,              # [B] f32
    xtc_p: jnp.ndarray,             # [B] f32 probability (0 = off)
    xtc_t: jnp.ndarray,             # [B] f32 threshold
) -> jnp.ndarray:
    """Jit-friendly per-lane XTC for device decode runs (apply_xtc's
    batched twin; llama_sampler_xtc semantics): with probability xtc_p,
    drop every token whose prob (on the temperature-scaled distribution)
    exceeds the threshold except the least likely of them. Lanes with
    xtc_p = 0 pass through (the gate never fires)."""
    t = jnp.where(temp > 0, temp, 1.0)[:, None]
    probs = jax.nn.softmax(logits / t, axis=-1)
    over = probs >= xtc_t[:, None]
    n_over = over.sum(-1, keepdims=True)
    min_over = jnp.min(jnp.where(over, probs, jnp.inf), axis=-1,
                       keepdims=True)
    drop = over & (probs > min_over) & (n_over >= 2)
    gate = jax.vmap(lambda k: jax.random.uniform(k))(keys) < xtc_p
    return jnp.where(drop & gate[:, None], NEG_INF, logits)


_LN2 = 0.6931471805599453


def device_mirostat(
    logits: jnp.ndarray,            # [B, V] f32 (post-penalties)
    keys: jnp.ndarray,              # [B] PRNG keys
    temp: jnp.ndarray,              # [B] f32
    mu: jnp.ndarray,                # [B] f32 running surprise bound
    eta: jnp.ndarray,               # [B] f32 learning rate
    tau: jnp.ndarray,               # [B] f32 target surprise
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mirostat v2 on device (mirostat_v2_sample's batched twin,
    llama_sampler_mirostat_v2 semantics): truncate tokens whose surprise
    exceeds mu, sample from the rest (gumbel-max == renormalized
    categorical), then move mu toward the target. Returns (token [B] i32,
    mu' [B])."""
    t = jnp.where(temp > 0, temp, 1.0)[:, None]
    lp = jax.nn.log_softmax(logits / t, axis=-1)
    surprise = -lp / _LN2
    keep = surprise <= mu[:, None]
    best = jnp.argmax(lp, axis=-1)
    keep = keep | (jnp.arange(lp.shape[-1], dtype=jnp.int32)[None, :]
                   == best[:, None])
    masked = jnp.where(keep, lp, NEG_INF)
    g = jax.vmap(lambda k: jax.random.gumbel(k, masked.shape[-1:]))(keys)
    tok = jnp.argmax(masked + g, axis=-1)
    obs = jnp.take_along_axis(surprise, tok[:, None], axis=-1)[:, 0]
    return tok.astype(jnp.int32), mu - eta * (obs - tau)


def device_top_n_sigma(
    logits: jnp.ndarray,            # [B, V] f32 (post-penalties/XTC)
    nsig: jnp.ndarray,              # [B] f32 (<=0 = off)
) -> jnp.ndarray:
    """Per-lane top-n-sigma (apply_top_n_sigma's batched twin,
    llama_sampler_top_n_sigma): mask logits below max - n*std. The cutoff
    is scale-invariant under temperature division (both max and std scale
    by 1/t), so applying it pre-temperature matches the host chain's
    post-temperature placement exactly. Full-V: two reductions, no sort.
    Lanes with nsig <= 0 pass through."""
    valid = logits > NEG_INF / 2
    cnt = jnp.maximum(valid.sum(-1, keepdims=True), 1)
    mean = jnp.where(valid, logits, 0.0).sum(-1, keepdims=True) / cnt
    var = (jnp.where(valid, logits - mean, 0.0) ** 2).sum(
        -1, keepdims=True) / cnt
    cutoff = jnp.where(nsig[:, None] > 0,
                       logits.max(-1, keepdims=True)
                       - nsig[:, None] * jnp.sqrt(var),
                       NEG_INF)
    return jnp.where(logits < cutoff, NEG_INF, logits)


DRY_WINDOW = 256                    # device DRY ring length (static)
DRY_MAX_MATCH = 32                  # capped match length (base^30 already
                                    # saturates any f32 logit)


def device_dry(
    dwin: jnp.ndarray,              # [B, W] i32 recent tokens, newest LAST
                                    # (-1 = empty / pre-history)
    cand_v: jnp.ndarray,            # [B, K] f32 candidate logits (desc)
    cand_i: jnp.ndarray,            # [B, K] i32 candidate ids
    mult: jnp.ndarray,              # [B] f32 dry_multiplier (0 = off)
    base: jnp.ndarray,              # [B] f32 dry_base
    allowed_len: jnp.ndarray,       # [B] i32 dry_allowed_length
    lastn: jnp.ndarray,             # [B] i32 effective window (<=W)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DRY repetition penalty on the captured candidate rows
    (dry_penalties' device twin, llama_sampler_dry semantics): for each
    window position i whose suffix-match length m with the current tail
    is >= allowed_len, the continuation token dwin[i+1] is penalized by
    mult * base^(m - allowed_len). Applied to the top-K candidates only —
    DRY only LOWERS logits, so the candidate set (captured pre-penalty)
    still contains every possible survivor; the rows are re-sorted so
    downstream top-k rank semantics hold. Returns (cand_v', cand_i')."""
    b, w = dwin.shape
    lmax = DRY_MAX_MATCH
    tail = dwin[:, (w - 1) - np.arange(lmax)]                # [B, L] suffix
    # shifted[j][b, i] = dwin[b, i - j] (out-of-range -> -1)
    pad = jnp.full((b, lmax), -1, dwin.dtype)
    ext = jnp.concatenate([pad, dwin], axis=1)               # [B, L+W]
    shifted = jnp.stack([ext[:, lmax - j : lmax - j + w]
                         for j in range(lmax)], axis=1)      # [B, L, W]
    age = (w - 1) - jnp.arange(w, dtype=jnp.int32)[None, :]  # steps back
    in_win = age < jnp.maximum(lastn, 0)[:, None]            # [B, W]
    tail_in = (np.arange(lmax, dtype=np.int32)[None, :, None]
               < jnp.maximum(lastn, 0)[:, None, None])       # [B, L, 1]
    eq = ((shifted == tail[:, :, None]) & (tail[:, :, None] >= 0)
          & (shifted >= 0) & in_win[:, None, :] & tail_in)   # [B, L, W]
    m = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)  # [B, W]
    # position i's match penalizes the token at i+1; i = W-1 has no
    # successor inside the window (its successor IS the next sample)
    pen_i = jnp.where(
        (m >= jnp.maximum(allowed_len, 1)[:, None]) & (mult[:, None] > 0),
        mult[:, None] * jnp.power(
            jnp.maximum(base, 1.0)[:, None],
            (m - allowed_len[:, None]).astype(jnp.float32)),
        0.0)[:, :-1]                                         # [B, W-1]
    z = dwin[:, 1:]                                          # [B, W-1]
    hit = (z[:, :, None] == cand_i[:, None, :]) & (z[:, :, None] >= 0)
    pen_c = jnp.max(jnp.where(hit, pen_i[:, :, None], 0.0), axis=1)
    v2 = cand_v - pen_c
    order = jnp.argsort(-v2, axis=-1, stable=True)
    return (jnp.take_along_axis(v2, order, axis=-1),
            jnp.take_along_axis(cand_i, order, axis=-1))


def topk_candidates(logits: jnp.ndarray, k_max: int = 128):
    """Top-k_max (vals, idx) candidate sets for device sampling — the
    shared pre-filter of device_sample and the serving run's per-step
    candidate capture (engine violation resamples)."""
    if logits.shape[-1] > 4096:
        return jax.lax.approx_max_k(logits, k_max, recall_target=0.99)
    return jax.lax.top_k(logits, k_max)


def device_sample(
    logits: jnp.ndarray,            # [B, V] f32
    keys: jnp.ndarray,              # [B] PRNG keys (uint32 [B, 2] typed key)
    temp: jnp.ndarray,              # [B] f32; <=0 -> greedy
    top_k: jnp.ndarray,             # [B] i32 in [1, k_max]
    top_p: jnp.ndarray,             # [B] f32
    min_p: jnp.ndarray,             # [B] f32
    k_max: int = 128,
    cands=None,                     # precomputed (vals, idx) [B, K]
    typ_p=None,                     # [B] f32 typical-p (None = not traced)
) -> jnp.ndarray:
    """Jit-friendly per-lane sampler for device-side decode runs: the
    temperature/top-k/top-p/min-p subset of the chain (the GPU-sampling
    analog of llama_context_params.samplers, llama.h:1012-1035), restricted
    to the k_max most likely candidates. Lanes with temp<=0 take argmax.
    Penalties/bias are applied beforehand by device_penalties. Returns [B]
    int32.

    ``typ_p`` traces in locally-typical filtering (apply_typical's
    candidate-restricted twin, llama_sampler_typical) between top-k and
    top-p, matching the host chain's order; lanes at 1.0 pass through.
    Entropy is computed over the surviving candidates — tokens past rank
    k_max carry negligible mass, so the truncation error is the same one
    the sampler already accepts."""
    if cands is not None:
        vals, idx = cands
    elif logits.shape[-1] > 4096:
        # lax.top_k lowers to a FULL [V] sort on TPU — measured ~1.8 ms/
        # step at V=151936, ~50% of the decode step's entire matmul time
        # and the served-vs-bench throughput gap (benchmarks/
        # profile_served_step.py round 4). approx_max_k is the TPU-native
        # PartialReduce top-k: top-1 is exact by construction and recall
        # misses concentrate at the candidate BOUNDARY (rank ~k_max),
        # far below any top_k <= 128 cutoff's surviving probability mass.
        vals, idx = jax.lax.approx_max_k(logits, k_max, recall_target=0.99)
    else:
        vals, idx = jax.lax.top_k(logits, k_max)            # [B, K]
    rank = jnp.arange(k_max, dtype=jnp.int32)[None, :]
    allowed = rank < jnp.maximum(top_k, 1)[:, None]
    t = jnp.where(temp > 0, temp, 1.0)[:, None]
    scaled = jnp.where(allowed, vals / t, -jnp.inf)
    probs = jax.nn.softmax(scaled, axis=-1)
    if typ_p is not None:
        # typical: sort by |surprise - entropy|, keep the prefix whose
        # cumulative mass crosses typ_p; downstream top-p/min-p then see
        # the RENORMALIZED survivor distribution (each host sampler
        # recomputes softmax over its remaining candidates)
        pt = jnp.clip(probs, 1e-30)
        ent = -jnp.sum(jnp.where(allowed, probs * jnp.log(pt), 0.0),
                       axis=-1, keepdims=True)
        shifted = jnp.where(allowed, jnp.abs(-jnp.log(pt) - ent), jnp.inf)
        order = jnp.argsort(shifted, axis=-1)
        p_sorted = jnp.take_along_axis(probs, order, axis=-1)
        cum_t = jnp.cumsum(p_sorted, axis=-1)
        keep_sorted = (cum_t - p_sorted) < typ_p[:, None]
        keep_typ = jnp.zeros_like(keep_sorted)
        keep_typ = jnp.put_along_axis(keep_typ, order, keep_sorted,
                                      axis=-1, inplace=False)
        allowed = allowed & keep_typ
        probs = jax.nn.softmax(jnp.where(allowed, scaled, -jnp.inf),
                               axis=-1)
    # top-p: keep the prefix whose cumulative mass crosses p (the crossing
    # token included, llama-sampling top_p semantics)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_p[:, None]
    # min-p: relative to the max candidate probability
    keep_m = probs >= min_p[:, None] * probs.max(axis=-1, keepdims=True)
    final = allowed & keep_p & keep_m
    if typ_p is None:
        final = final.at[:, 0].set(True)
    else:
        # typical may legitimately exclude rank 0; only force it back in
        # when the whole set emptied out (can't happen analytically, but
        # guards NaN logits)
        final = final.at[:, 0].set(final[:, 0] | ~final.any(-1))
    logp = jnp.where(final, scaled, -jnp.inf)
    g = jax.vmap(lambda k: jax.random.gumbel(k, (k_max,)))(keys)
    choice = jnp.argmax(logp + g, axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    return jnp.where(temp <= 0, idx[:, 0], sampled).astype(jnp.int32)


def infill_sample(
    logits: "np.ndarray",           # [V] f32 host logits
    pieces: list[str],              # token id -> text piece
    eog_ids: set,                   # EOG token ids (eos/eot/stop)
    key: jax.Array,
    k_max: int = 64,
    thold: float = 0.2,
) -> int:
    """Fill-in-the-middle sampler (llama_sampler_init_infill,
    llama-sampling.cpp:3641+): over the top candidates —
      1. if EOG mass dominates (3*p_eog*n > p_txt) sample among EOG only;
      2. merge tokens whose piece is a prefix of another candidate's piece
         into the higher-probability one;
      3. drop non-EOG tokens below the 0.2 probability threshold;
      4. if nothing non-EOG survives, emit EOG deterministically.
    """
    import numpy as np

    v = logits.shape[-1]
    x = logits.astype(np.float64)
    x = x - x.max()
    p_full = np.exp(x)
    p_full /= p_full.sum()
    k = min(k_max, v)
    cand = np.argpartition(-p_full, k - 1)[:k]
    cand = cand[np.argsort(-p_full[cand])]
    probs = p_full[cand].copy()

    is_eog = np.asarray([int(c) in eog_ids for c in cand])
    p_eog = probs[is_eog].sum()
    p_txt = probs[~is_eog].sum()

    def draw(ids, ps):
        ps = np.maximum(ps, 0)
        s = ps.sum()
        if s <= 0 or len(ids) == 1:
            return int(ids[0])
        r = float(jax.random.uniform(key))
        return int(ids[np.searchsorted(np.cumsum(ps / s), r)])

    if p_eog > 0 and 3.0 * p_eog * len(cand) > p_txt:
        return draw(cand[is_eog], probs[is_eog])

    # combine common-prefix tokens into the more probable one
    texts = [pieces[int(c)] if int(c) < len(pieces) else "" for c in cand]
    alive = np.ones(len(cand), bool)
    for i0 in range(len(cand)):
        for i1 in range(len(cand)):
            if i0 == i1 or not alive[i0] or not alive[i1]:
                continue
            t0, t1 = texts[i0], texts[i1]
            if t0 and len(t0) <= len(t1) and t1.startswith(t0):
                dst, src = (i0, i1) if probs[i0] >= probs[i1] else (i1, i0)
                probs[dst] += probs[src]
                probs[src] = 0.0
                alive[src] = False

    keep = alive & (is_eog | (probs >= thold))
    if not (keep & ~is_eog).any():
        eogs = [int(c) for c in cand[is_eog]] or sorted(eog_ids)
        return int(eogs[0]) if eogs else int(cand[0])
    return draw(cand[keep], probs[keep])


def dry_penalties(
    tokens: list[int],
    vocab_size: int,
    multiplier: float = 0.0,
    base: float = 1.75,
    allowed_length: int = 2,
    penalty_last_n: int = 1024,
) -> Optional[dict[int, float]]:
    """DRY sampler (llama_sampler_dry semantics, host-side): for each token z
    that would extend a repeat of the recent suffix, penalize by
    multiplier * base^(match_len - allowed_length)."""
    if multiplier <= 0.0 or len(tokens) < allowed_length:
        return None
    window = tokens[-penalty_last_n:]
    n = len(window)
    penalties: dict[int, float] = {}
    # longest suffix of `window` matching a substring ending at i (z = window[i])
    for i in range(n - 1):
        m = 0
        while (
            m < i + 1
            and m < n - 1
            and window[i - m] == window[n - 1 - m]
        ):
            m += 1
        if m >= allowed_length:
            z = window[i + 1] if i + 1 < n else None
            if z is not None:
                pen = multiplier * (base ** (m - allowed_length))
                penalties[z] = max(penalties.get(z, 0.0), pen)
    return penalties or None
