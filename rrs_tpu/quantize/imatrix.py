"""imatrix collection: per-channel activation second moments.

Analog of tools/imatrix/imatrix.cpp: the reference hooks the scheduler's
eval-callback and accumulates sum(x^2) per input channel of every MUL_MAT
(collect_imatrix :219). Here the capture is part of the traced forward
(models/llama.py `_capture`), so one jitted call returns all per-tensor sums.

Output: dict tensor_name -> (sums [K] f32, n_tokens) and GGUF save/load in
the reference's imatrix-GGUF convention (save_imatrix :507-578:
``general.type = "imatrix"``, per-tensor ``<name>.in_sum2`` and
``<name>.counts`` tensors).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import llama as llama_model


def collect_imatrix(
    cfg: ModelConfig,
    weights,
    token_chunks: list[list[int]],
    chunk_len: int = 512,
) -> dict[str, tuple[np.ndarray, int]]:
    """Run calibration chunks through the model, accumulate per-channel sums."""
    max_seq = chunk_len

    @jax.jit
    def run(w, tokens):
        b, t = tokens.shape
        pos = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, 0)
        kc, vc = llama_model.scratch_caches(cfg, b, t)
        cap: dict = {}
        llama_model.forward(cfg, w, tokens, pos, kc, vc, pos, pos, cap=cap)
        counts = cap.pop("__counts__")
        return cap, counts

    acc: dict[str, tuple[np.ndarray, int]] = {}
    for chunk in token_chunks:
        chunk = chunk[:chunk_len]
        if len(chunk) < 2:
            continue
        toks = jnp.asarray(np.asarray(chunk, np.int32)[None, :])
        cap, counts = run(weights, toks)
        for name, sums in cap.items():
            s = np.asarray(sums)
            if name in acc:
                prev, n = acc[name]
                acc[name] = (prev + s, n + int(counts[name]))
            else:
                acc[name] = (s, int(counts[name]))
    return acc


def save_imatrix(path: str | Path, acc: dict[str, tuple[np.ndarray, int]]):
    from rrs_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter(path)
    w.add_string("general.type", "imatrix")
    w.add_string("general.architecture", "imatrix")
    for name, (sums, count) in acc.items():
        w.add_tensor(f"{name}.in_sum2", sums.astype(np.float32))
        w.add_tensor(f"{name}.counts", np.asarray([float(count)], np.float32))
    w.write()


def load_imatrix(path: str | Path) -> dict[str, np.ndarray]:
    """Load mean-squared activations per tensor: sum2/counts."""
    from rrs_tpu.gguf.reader import read_gguf

    out = {}
    with read_gguf(path) as g:
        for name in g.tensors:
            if name.endswith(".in_sum2"):
                base = name[: -len(".in_sum2")]
                sums = g.tensor(name).astype(np.float32)
                counts = g.tensor(f"{base}.counts").astype(np.float32)
                out[base] = sums / max(float(counts[0]), 1.0)
    return out


def derive_tcq4_perms(
    imatrix: dict[str, np.ndarray], block: int = 256
) -> dict[str, np.ndarray]:
    """Per-tensor channel permutations: sort by imatrix magnitude DESCENDING
    within each 256-wide FWHT block (derive_tcq4_perms_from_imatrix,
    tools/quantize/quantize.cpp:127-164). perm[i] = source channel index."""
    perms = {}
    for name, m in imatrix.items():
        k = m.shape[0]
        if k % block:
            continue
        perm = np.empty(k, np.int32)
        for b0 in range(0, k, block):
            seg = m[b0 : b0 + block]
            # stable descending sort for deterministic ties
            order = np.argsort(-seg, kind="stable")
            perm[b0 : b0 + block] = b0 + order
        perms[name] = perm
    return perms
