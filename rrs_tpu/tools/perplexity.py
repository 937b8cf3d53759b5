"""WikiText-2-style perplexity evaluation (tools/perplexity/perplexity.cpp analog).

Reimplements the reference's windowed NLL protocol (perplexity() :441):
tokens are split into chunks of ``n_ctx``; within each chunk the first
min(n_ctx/2, 512) positions are context warm-up and the NLL is accumulated
from there on, using log_softmax in f64-ish stability (log_softmax :58-118).
PPL = exp(mean NLL).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Optional

import numpy as np

from rrs_tpu.runtime.context import InferenceContext


@dataclasses.dataclass
class PerplexityResult:
    ppl: float
    nll_sum: float
    n_tokens: int
    per_chunk: list[float]


def _log_softmax_row(logits: np.ndarray, target: int) -> float:
    m = logits.max()
    lse = m + math.log(np.exp(logits - m).sum())
    return float(logits[target] - lse)


def compute_perplexity(
    ctx: InferenceContext,
    tokens: list[int],
    n_ctx: int = 512,
    stride: Optional[int] = None,
    progress: bool = False,
    device_nll: bool = True,
) -> PerplexityResult:
    """Sliding-chunk perplexity over a token stream.

    ``device_nll``: compute the target log-probs on device (log-softmax +
    gather fused into the forward; readback [T] floats instead of [T, V]
    logits — the full-logits readback dominates wall time through a
    remote device link). Falls back to the host f64 path for contexts
    without prefill_logprobs."""
    first = min(n_ctx // 2, 512)
    nll = 0.0
    count = 0
    per_chunk = []
    n_chunks = max(0, len(tokens) // n_ctx)
    for c in range(n_chunks):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
        seq = ctx.new_sequence()
        if device_nll and hasattr(ctx, "prefill_logprobs"):
            lp = ctx.prefill_logprobs(seq, chunk, chunk[1:] + [0])
            ctx.kv.seq_rm(seq)
            sel = lp[first : len(chunk) - 1]
            chunk_nll = -float(sel.sum())
            chunk_count = len(sel)
        else:
            logits = ctx.prefill(seq, chunk)       # [T, V]
            ctx.kv.seq_rm(seq)
            chunk_nll = 0.0
            chunk_count = 0
            for i in range(first, len(chunk) - 1):
                ll = _log_softmax_row(
                    logits[i].astype(np.float64), chunk[i + 1])
                chunk_nll -= ll
                chunk_count += 1
        nll += chunk_nll
        count += chunk_count
        per_chunk.append(math.exp(chunk_nll / max(chunk_count, 1)))
        if progress:
            print(f"[{c + 1}/{n_chunks}] ppl so far: {math.exp(nll / count):.4f}",
                  flush=True)
    return PerplexityResult(
        ppl=math.exp(nll / max(count, 1)),
        nll_sum=nll,
        n_tokens=count,
        per_chunk=per_chunk,
    )


def compute_perplexity_pp(cfg, weights, tokens: list[int], mesh,
                          n_ctx: int = 512, n_micro: int = 2,
                          progress: bool = False) -> PerplexityResult:
    """Perplexity over a pipeline-parallel (layer-split) mesh — the
    --split-mode layer analog (llama.h:193-197) for batch evaluation.
    Each dispatch pushes n_micro chunks through the GPipe schedule
    (parallel/pipeline.py); same NLL protocol as compute_perplexity."""
    from rrs_tpu.parallel.pipeline import make_pipeline_forward

    first = min(n_ctx // 2, 512)
    n_chunks = len(tokens) // n_ctx
    fn = make_pipeline_forward(cfg, weights, mesh, b=n_micro, t=n_ctx,
                               n_micro=n_micro)
    positions = np.broadcast_to(
        np.arange(n_ctx, dtype=np.int32), (n_micro, n_ctx)).copy()
    nll = 0.0
    count = 0
    per_chunk = []
    for base in range(0, n_chunks, n_micro):
        batch = [tokens[c * n_ctx:(c + 1) * n_ctx]
                 for c in range(base, min(base + n_micro, n_chunks))]
        real = len(batch)
        batch += [batch[-1]] * (n_micro - real)     # pad the last dispatch
        logits = np.asarray(fn(np.asarray(batch, np.int32), positions))
        for r in range(real):
            chunk = batch[r]
            chunk_nll = 0.0
            chunk_count = 0
            for i in range(first, n_ctx - 1):
                ll = _log_softmax_row(
                    logits[r, i].astype(np.float64), chunk[i + 1])
                chunk_nll -= ll
                chunk_count += 1
            nll += chunk_nll
            count += chunk_count
            per_chunk.append(math.exp(chunk_nll / max(chunk_count, 1)))
        if progress:
            print(f"[{len(per_chunk)}/{n_chunks}] ppl so far: "
                  f"{math.exp(nll / max(count, 1)):.4f}", flush=True)
    return PerplexityResult(
        ppl=math.exp(nll / max(count, 1)),
        nll_sum=nll,
        n_tokens=count,
        per_chunk=per_chunk,
    )


# ---------------------------------------------------------------------------
# Multiple-choice scoring + KL divergence (perplexity.cpp: hellaswag_score
# :800+, winogrande_score, multiple_choice_score (MMLU), kl_divergence :1700+)
# ---------------------------------------------------------------------------

def score_choice(ctx, prefix_tokens: list[int], choice_tokens: list[int]) -> float:
    """Total logprob of ``choice_tokens`` given ``prefix_tokens`` (the
    common-prefix scoring core of hellaswag/winogrande/MMLU evaluators)."""
    toks = prefix_tokens + choice_tokens
    seq = ctx.new_sequence()
    try:
        if hasattr(ctx, "prefill_logprobs"):
            lp_all = ctx.prefill_logprobs(seq, toks, toks[1:] + [0])
            return float(lp_all[len(prefix_tokens) - 1 : len(toks) - 1].sum())
        logits = ctx.prefill(seq, toks)
    finally:
        ctx.kv.seq_rm(seq)
    lp = 0.0
    for i in range(len(prefix_tokens) - 1, len(toks) - 1):
        lp += _log_softmax_row(logits[i], toks[i + 1])
    return lp


def multiple_choice_score(ctx, vocab, tasks, normalize_length: bool = True):
    """tasks: [{"prompt": str, "choices": [str...], "answer": int}].
    Returns (accuracy, per-task picks). Length-normalized logprob scoring
    (the hellaswag convention)."""
    n_correct = 0
    picks = []
    for task in tasks:
        prefix = vocab.encode(task["prompt"], add_special=True)
        best, best_score = -1, -1e30
        for ci, choice in enumerate(task["choices"]):
            ctoks = vocab.encode(choice, add_special=False)
            if not ctoks:
                continue
            s = score_choice(ctx, prefix, ctoks)
            if normalize_length:
                s /= len(ctoks)
            if s > best_score:
                best, best_score = ci, s
        picks.append(best)
        if best == int(task["answer"]):
            n_correct += 1
    return n_correct / max(len(tasks), 1), picks


def kl_divergence(ctx, base_logits_per_pos: "np.ndarray", tokens: list[int],
                  n_ctx: int = 512):
    """Mean KL(base || model) over positions + same-top-token rate, given
    the base model's full logits [T, V] (the --kl-divergence-base flow)."""
    seq = ctx.new_sequence()
    try:
        logits = ctx.prefill(seq, tokens[: base_logits_per_pos.shape[0]])
    finally:
        ctx.kv.seq_rm(seq)
    n = min(logits.shape[0], base_logits_per_pos.shape[0])
    kls = []
    same_top = 0
    for i in range(n):
        p = base_logits_per_pos[i].astype(np.float64)
        q = logits[i].astype(np.float64)
        p = p - p.max()
        q = q - q.max()
        lp = p - np.log(np.exp(p).sum())
        lq = q - np.log(np.exp(q).sum())
        kls.append(float((np.exp(lp) * (lp - lq)).sum()))
        same_top += int(p.argmax() == q.argmax())
    return {"mean_kl": float(np.mean(kls)), "max_kl": float(np.max(kls)),
            "same_top_rate": same_top / max(n, 1), "n_pos": n}


# ---------------------------------------------------------------------------
# Benchmark-task loaders (tools/perplexity/perplexity.cpp dataset formats)
# ---------------------------------------------------------------------------

def load_hellaswag(text: str) -> list[dict]:
    """HellaSwag datafile (perplexity.cpp:741 hellaswag_score layout):
    6 lines per task — context, gold ending index, 4 endings. Returns
    generic multiple-choice tasks (endings joined with a leading space,
    the lm-eval preprocessing the reference mirrors)."""
    lines = [ln for ln in text.split("\n")]
    while lines and not lines[-1].strip():
        lines.pop()
    if len(lines) % 6:
        raise ValueError(f"hellaswag file: {len(lines)} lines, not a "
                         "multiple of 6")
    tasks = []
    for i in range(0, len(lines), 6):
        tasks.append({
            "prompt": lines[i],
            "answer": int(lines[i + 1]),
            "choices": [" " + lines[i + 2 + j] for j in range(4)],
        })
    return tasks


def hellaswag_score(ctx, vocab, tasks: list[dict], n_tasks: int = 0,
                    progress: bool = False):
    """acc_norm over (a deterministic random subset of) HellaSwag tasks —
    length-normalized ending logprob, argmax vs gold
    (perplexity.cpp:741+)."""
    if n_tasks and n_tasks < len(tasks):
        rng = np.random.default_rng(1)
        idx = rng.permutation(len(tasks))[:n_tasks]
        tasks = [tasks[i] for i in idx]
    n_correct = 0
    for ti, task in enumerate(tasks):
        acc, picks = multiple_choice_score(ctx, vocab, [task])
        n_correct += int(acc > 0.5)
        if progress:
            import sys

            print(f"[{ti + 1}/{len(tasks)}] hellaswag acc so far: "
                  f"{n_correct / (ti + 1):.4f}", file=sys.stderr,
                  flush=True)
    return n_correct / max(len(tasks), 1)


def load_winogrande(csv_text: str) -> list[dict]:
    """Winogrande CSV (perplexity.cpp load_winogrande_from_csv):
    index,sentence,choice1,choice2,answer — sentence holds a '_' blank,
    answer is 1 or 2. Quoted sentences are unquoted."""
    import csv as _csv
    import io

    out = []
    for row in _csv.reader(io.StringIO(csv_text)):
        if len(row) < 5:
            continue
        _, sentence, c1, c2, answer = row[:5]
        if "_" not in sentence:
            continue
        out.append({"sentence": sentence, "choices": [c1, c2],
                    "answer": int(answer)})
    return out


def winogrande_score(ctx, vocab, tasks: list[dict], n_tasks: int = 0,
                     progress: bool = False) -> float:
    """Winogrande scoring (perplexity.cpp:1098): fill the blank with each
    choice and compare the log-likelihood of the TRAILING context given
    the filled prefix (the trailing tokens are identical for both
    choices, so no length normalization is needed)."""
    if n_tasks and n_tasks < len(tasks):
        rng = np.random.default_rng(1)
        idx = rng.permutation(len(tasks))[:n_tasks]
        tasks = [tasks[i] for i in idx]
    n_correct = 0
    for ti, task in enumerate(tasks):
        pre, post = task["sentence"].split("_", 1)
        scores = []
        for choice in task["choices"]:
            prefix = vocab.encode(pre + choice, add_special=True)
            tail = vocab.encode(post, add_special=False)
            if not tail:
                tail = vocab.encode(".", add_special=False)
            scores.append(score_choice(ctx, prefix, tail))
        pick = 1 if scores[0] >= scores[1] else 2
        n_correct += int(pick == task["answer"])
        if progress:
            import sys

            print(f"[{ti + 1}/{len(tasks)}] winogrande acc so far: "
                  f"{n_correct / (ti + 1):.4f}", file=sys.stderr,
                  flush=True)
    return n_correct / max(len(tasks), 1)


def load_multiple_choice_bin(data: bytes) -> list[dict]:
    """The reference's serialized multiple-choice format (MMLU etc.;
    perplexity.cpp multiple_choice_task::deserialize): u32 n_task, u32
    task_pos[n_task], then per task question + mc1 {u32 n, n strings,
    n i32 labels} + mc2 (same, unused). Strings are u32-length-prefixed
    UTF-8."""
    import struct

    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", data, off)
        off += 4
        return v

    def s():
        nonlocal off
        n = u32()
        v = data[off:off + n].decode("utf-8", errors="replace")
        off += n
        return v

    n_task = u32()
    off += 4 * n_task                      # task_pos (sequential read)
    tasks = []
    for _ in range(n_task):
        question = s()
        out = {"prompt": question}
        for which in ("mc1", "mc2"):
            n = u32()
            answers = [s() for _ in range(n)]
            labels = list(struct.unpack_from(f"<{n}i", data, off))
            off += 4 * n
            out[which] = (answers, labels)
        answers, labels = out["mc1"]
        gold = labels.index(1) if 1 in labels else 0
        tasks.append({"prompt": question,
                      "choices": [" " + a for a in answers],
                      "answer": gold})
    return tasks
