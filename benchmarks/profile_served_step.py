"""Profile the SERVED decode run (decode_run_start's jitted scan) per-op
on device — finds where the served path's per-token overhead vs the
greedy bench scan lives (device sampling? penalties? RNG?).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_served_step.py
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models import llama as lm
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = PRESETS["qwen3-4b"]
    w = lm.fabricated_tcq4_weights(cfg)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=1024)
    seq = ctx.new_sequence()
    ctx.prefill(seq, [5, 6, 7, 8], all_logits=False)
    params = SamplerParams(temperature=0.8, top_k=40)
    key = jax.random.PRNGKey(0)

    import jax.numpy as jnp

    n = 64
    h = ctx.decode_run_start({seq: 9}, {seq: key}, {seq: params}, n_steps=n)
    toks = np.asarray(h["toks"])
    log("warm run done", toks.shape)

    tdir = "/tmp/served_prof"
    with jax.profiler.trace(tdir):
        h = ctx.decode_run_start({seq: int(toks[0, -1])}, {seq: key},
                                 {seq: params}, n_steps=n)
        np.asarray(h["toks"]).sum()
    time.sleep(2)

    traces = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert traces, "no trace written"
    tr = json.loads(gzip.open(sorted(traces)[-1]).read())
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        pid_name = ev.get("pid")
        dur[name] += ev.get("dur", 0)
        cnt[name] += 1
    total = sum(dur.values())
    rows = sorted(dur.items(), key=lambda kv: -kv[1])[:40]
    log(f"top ops by device time (total {total/1e3:.1f} ms incl. host "
        f"threads; {n}-step run):")
    for name, d in rows:
        log(f"  {d/1e3:9.2f} ms x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
