"""Training / finetuning (ggml-opt.cpp + examples/training analog).

The reference builds backward graphs in ggml and steps AdamW/SGD
(ggml-opt.cpp: ggml_opt_fit, tests/test-opt.cpp). TPU-native equivalent:
``jax.value_and_grad`` over the model forward + optax, jitted once; the
dataset is a token stream chunked into (input, target) next-token pairs.

Supports full finetuning of dense (bf16/f32) weights. Quantized (TCQ4/Q8)
tensors are frozen — like the reference, which trains F32/F16 models
(finetune.cpp requires an unquantized base) — train then quantize.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rrs_tpu.models import llama as llama_model
from rrs_tpu.models.config import ModelConfig


@dataclasses.dataclass
class TrainConfig:
    optimizer: str = "adamw"        # "adamw" | "sgd" (the two ggml-opt offers)
    lr: float = 1e-4
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    clip_norm: float = 0.0


def make_dataset(tokens: list[int], seq_len: int, batch: int = 1,
                 seed: int = 0) -> list[np.ndarray]:
    """Chunk a token stream into [batch, seq_len+1] blocks
    (ggml_opt_dataset analog: inputs + shifted labels in one array)."""
    n = (len(tokens) - 1) // seq_len
    rng = np.random.default_rng(seed)
    starts = rng.permutation(n) * seq_len
    blocks = [np.asarray(tokens[s : s + seq_len + 1], np.int64)
              for s in starts if s + seq_len + 1 <= len(tokens)]
    out = []
    for i in range(0, len(blocks) - batch + 1, batch):
        out.append(np.stack(blocks[i : i + batch]).astype(np.int32))
    return out


def _loss_fn(cfg: ModelConfig, weights, batch: jnp.ndarray,
             logits_sharding=None):
    """Mean next-token cross-entropy over a [B, T+1] batch.

    ``logits_sharding`` (a NamedSharding) constrains the [B, T, V] logits —
    the SPMD train step passes P(dp, tp, None) so the log-softmax region is
    sequence-parallel over the tp axis (sp-over-tp)."""
    # differentiated forward: the Pallas flash-attention kernel has no VJP,
    # so training must run the jnp reference attention on TPU as well
    cfg = dataclasses.replace(cfg, ref_attention=True)
    toks = batch[:, :-1]
    labels = batch[:, 1:]
    b, t = toks.shape
    pos = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, 0)
    kc, vc = llama_model.scratch_caches(cfg, b, t)
    logits, _, _ = llama_model.forward(cfg, weights, toks, pos, kc, vc, pos, pos)
    if logits_sharding is not None:
        logits = jax.lax.with_sharding_constraint(logits, logits_sharding)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return nll.mean()


def partition(weights):
    """Split into (params, static): float leaves train, integer leaves
    (quantized codes) freeze. Both trees share the structure, with None in
    the complementary slots."""
    def is_float(leaf):
        return hasattr(leaf, "dtype") and leaf.dtype in (
            jnp.float32, jnp.bfloat16, jnp.float16)

    params = jax.tree_util.tree_map(
        lambda w: w if is_float(w) else None, weights)
    static = jax.tree_util.tree_map(
        lambda w: None if is_float(w) else w, weights)
    return params, static


def combine(params, static):
    return jax.tree_util.tree_map(
        lambda p, s: p if s is None else s, params, static,
        is_leaf=lambda x: x is None)


def make_optimizer(tc: TrainConfig):
    if tc.optimizer == "sgd":
        opt = optax.sgd(tc.lr)
    else:
        opt = optax.adamw(tc.lr, b1=tc.beta1, b2=tc.beta2, eps=tc.eps,
                          weight_decay=tc.weight_decay)
    if tc.clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(tc.clip_norm), opt)
    return opt


def train(
    cfg: ModelConfig,
    weights,
    batches: Iterable[np.ndarray],
    tc: Optional[TrainConfig] = None,
    n_epochs: int = 1,
    on_step: Optional[Callable[[int, float], None]] = None,
    chunk_steps: int = 1,
):
    """Finetune; returns (weights, losses). The step is jitted once and
    reused across batches (all batches share one shape).

    ``chunk_steps`` > 1 runs that many optimizer steps per dispatch via a
    device-side ``lax.scan`` (losses read back once per chunk). Through a
    remote device link the per-step float(loss) readback otherwise
    dominates: ~150-450 ms of relay cost per step vs ~tens of ms of
    compute (PERF.md methodology notes)."""
    tc = tc or TrainConfig()
    opt = make_optimizer(tc)
    params, static = partition(weights)
    opt_state = opt.init(params)

    def one_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: _loss_fn(cfg, combine(p, static), batch))(params)
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(one_step)

    @jax.jit
    def multi_step(params, opt_state, chunk):      # [C, B, T]
        def body(carry, batch):
            p, o = carry
            p, o, loss = one_step(p, o, batch)
            return (p, o), loss
        (params, opt_state), ls = jax.lax.scan(body, (params, opt_state),
                                               chunk)
        return params, opt_state, ls

    losses = []
    i = 0
    for _ in range(n_epochs):
        if chunk_steps > 1:
            blist = list(batches)
            for c0 in range(0, len(blist), chunk_steps):
                chunk = np.stack(blist[c0:c0 + chunk_steps])
                params, opt_state, ls = multi_step(params, opt_state,
                                                   jnp.asarray(chunk))
                for loss in np.asarray(ls).tolist():
                    losses.append(float(loss))
                    if on_step:
                        on_step(i, losses[-1])
                    i += 1
            continue
        for batch in batches:
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(batch))
            loss = float(loss)
            losses.append(loss)
            if on_step:
                on_step(i, loss)
            i += 1
    return combine(params, static), losses


def evaluate(cfg: ModelConfig, weights, batches) -> float:
    """Mean loss over batches (ggml_opt_epoch eval split analog)."""
    f = jax.jit(lambda w, b: _loss_fn(cfg, w, b))
    vals = [float(f(weights, jnp.asarray(b))) for b in batches]
    return float(np.mean(vals)) if vals else float("nan")
