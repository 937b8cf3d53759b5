"""Per-op device-time breakdown of the headline decode step.

Traces one 512-step decode scan (same model/config as bench.py) with
jax.profiler, then aggregates TPU op durations by name, so the step
budget (gx matmuls / dequant matmuls / lm_head / attention / glue) is
measured instead of guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_decode.py
"""
import collections
import glob
import gzip
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N_STEPS = 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def op_times(trace_dir):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
    # find the top-level jit scan span, then collect ops nested inside it
    # on the TPU op track(s)
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    spans = [e for e in ev if e.get("ph") == "X" and "dur" in e
             and e["pid"] in tpu_pids]
    big = max(spans, key=lambda e: e["dur"])
    lo, hi = big["ts"], big["ts"] + big["dur"]
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in spans:
        if e is big or e["ts"] < lo or e["ts"] >= hi:
            continue
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    return big["dur"] / 1e3, agg, cnt


def main():
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model

    cfg = PRESETS["qwen3-4b"]
    weights = llama_model.fabricated_tcq4_weights(cfg, seed=0)
    jax.block_until_ready(weights.embed)
    b, s = 1, 384
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    k_caches = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    v_caches = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    first = jnp.zeros((b,), jnp.int32)
    pos0 = jnp.zeros((b,), jnp.int32)
    scan = jax.jit(lambda w, f, p, k, v: llama_model.decode_scan(
        cfg, w, f, p, k, v, N_STEPS))
    t0 = time.time()
    toks, last, _, _ = scan(weights, first, pos0, k_caches, v_caches)
    _ = int(np.asarray(toks).sum())
    log(f"compile+warmup in {time.time() - t0:.1f}s")

    td = tempfile.mkdtemp(prefix="rrs_prof_")
    with jax.profiler.trace(td):
        toks, last, _, _ = scan(weights, last, pos0 + 7, k_caches, v_caches)
        _ = int(np.asarray(toks).sum())
    total_ms, agg, cnt = op_times(td)
    log(f"scan device total: {total_ms:.1f} ms "
        f"({total_ms / N_STEPS:.3f} ms/step, {N_STEPS / total_ms * 1e3:.1f} tok/s)")
    # group by family: strip trailing .NNN instance suffixes
    import re
    fam = collections.Counter()
    fcnt = collections.Counter()
    for name, dur in agg.items():
        f = re.sub(r"[.\d]+$", "", name)
        fam[f] += dur
        fcnt[f] += cnt[name]
    log(f"{'us/step':>9}  {'calls/step':>10}  family")
    shown = 0.0
    for name, dur in fam.most_common(60):
        us = dur / N_STEPS
        if name == "while":
            continue
        shown += us
        log(f"{us:9.2f}  {fcnt[name] / N_STEPS:10.2f}  {name[:110]}")
    log(f"sum of shown: {shown / 1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
