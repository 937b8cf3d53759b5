"""Per-op device-time breakdown of a 1024-token prefill dispatch on
Qwen3-4B TCQ4 (the pp2048 path) — where does the end-to-end 7.1k tok/s
(vs the GEMM kernel's standalone ~100 TFLOPS) actually go?

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_prefill.py
"""
import collections
import re
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from benchmarks.profile_decode import op_times

T = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.runtime.context import InferenceContext

    cfg = PRESETS["qwen3-4b"]
    weights = llama_model.fabricated_tcq4_weights(cfg, seed=0)
    jax.block_until_ready(weights.embed)
    b, s = 1, 2048
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    k = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    v = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    toks = jnp.ones((b, T), jnp.int32)
    start = jnp.zeros((b,), jnp.int32)

    step = jax.jit(lambda w, t_, st, kk, vv: InferenceContext._step(
        cfg, w, t_, st, None, kk, vv, last_only=True))
    t0 = time.time()
    logits, nk, nv = step(weights, toks, start, k, v)
    _ = float(np.asarray(logits).sum())
    log(f"compile+warmup in {time.time() - t0:.1f}s")

    # time 8 dispatches (value readback each)
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            logits, nk, nv = step(weights, toks + i, start, k, v)
        _ = float(np.asarray(logits).sum())
        best = min(best, (time.perf_counter() - t0) / 4)
    log(f"wall {best*1e3:.1f} ms/chunk -> {T/best:.0f} tok/s incl relay")

    td = tempfile.mkdtemp(prefix="rrs_pp_prof_")
    with jax.profiler.trace(td):
        logits, nk, nv = step(weights, toks + 9, start, k, v)
        _ = float(np.asarray(logits).sum())
    total_ms, agg, cnt = op_times(td)
    log(f"device total {total_ms:.2f} ms/chunk "
        f"({T / total_ms * 1e3:.0f} tok/s device-side)")
    fam = collections.Counter()
    fcnt = collections.Counter()
    for name, dur in agg.items():
        f = re.sub(r"[.\d]+$", "", name)
        fam[f] += dur
        fcnt[f] += cnt[name]
    log(f"{'us/chunk':>9}  {'calls':>6}  family")
    for name, dur in fam.most_common(25):
        if name == "while":
            continue
        log(f"{dur:9.1f}  {fcnt[name]:6d}  {name[:100]}")


if __name__ == "__main__":
    main()
