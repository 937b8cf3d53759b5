"""Per-op diff of the S=8192 decode step: bf16 KV vs q4 head-pair KV
(round 5: bench_longctx still shows 144.4 vs 157.2 tok/s end-to-end even
though the ATTENTION kernel is at parity per the regression test — this
finds where the remaining ~0.5 ms/step went).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_kvq4.py
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

N_STEPS = 256
S = 8192


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(kv_quant):
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.runtime.kv_cache import KVCache

    cfg = PRESETS["qwen3-4b"]
    weights = llama_model.fabricated_tcq4_weights(cfg, seed=0)
    jax.block_until_ready(weights.embed)
    kv = KVCache.create(cfg, 1, S, jnp.bfloat16, quant=kv_quant)
    first = jnp.zeros((1,), jnp.int32)
    pos0 = jnp.full((1,), S - N_STEPS - 2, jnp.int32)
    scan = jax.jit(lambda w, f, p, k, v: llama_model.decode_scan(
        cfg, w, f, p, k, v, N_STEPS))
    t0 = time.time()
    toks, last, _, _ = scan(weights, first, pos0, kv.k, kv.v)
    _ = int(np.asarray(toks).sum())
    log(f"[{kv_quant}] compile+warmup {time.time() - t0:.1f}s")
    td = tempfile.mkdtemp(prefix=f"rrs_kvq4_{kv_quant}_")
    with jax.profiler.trace(td):
        toks, last, _, _ = scan(weights, last, pos0, kv.k, kv.v)
        _ = int(np.asarray(toks).sum())
    total_ms, agg, cnt = op_times(td)
    fam = collections.Counter()
    for name, dur in agg.items():
        fam[re.sub(r"[.\d]+$", "", name)] += dur
    log(f"[{kv_quant}] device {total_ms:.1f} ms "
        f"({total_ms / N_STEPS * 1e3:.1f} us/step)")
    return total_ms, fam


def main():
    t_bf, f_bf = run("none")
    t_q4, f_q4 = run("q4")
    log(f"\ndelta {1e3 * (t_q4 - t_bf) / N_STEPS:+.1f} us/step; "
        f"top family diffs (us/step):")
    keys = set(f_bf) | set(f_q4)
    diffs = sorted(keys, key=lambda k: -(f_q4.get(k, 0) - f_bf.get(k, 0)))
    for k in diffs[:14]:
        d = (f_q4.get(k, 0) - f_bf.get(k, 0)) / N_STEPS
        log(f"{d:+9.2f}  q4={f_q4.get(k, 0)/N_STEPS:8.2f} "
            f"bf={f_bf.get(k, 0)/N_STEPS:8.2f}  {k[:90]}")


if __name__ == "__main__":
    main()
