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
) -> PerplexityResult:
    """Sliding-chunk perplexity over a token stream."""
    first = min(n_ctx // 2, 512)
    nll = 0.0
    count = 0
    per_chunk = []
    n_chunks = max(0, len(tokens) // n_ctx)
    for c in range(n_chunks):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
        seq = ctx.new_sequence()
        logits = ctx.prefill(seq, chunk)       # [T, V]
        ctx.kv.seq_rm(seq)
        chunk_nll = 0.0
        chunk_count = 0
        for i in range(first, len(chunk) - 1):
            ll = _log_softmax_row(logits[i].astype(np.float64), chunk[i + 1])
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
