"""Headline benchmark: Qwen3-4B TCQ4 W4A4 single-chip decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": tok/s, "unit": "tok/s", "vs_baseline": value/68}

Baseline 68 tok/s = the reference's TCQ4 decode on RTX 3090 (README.md:44,
BASELINE.md). Decode runs as a device-side lax.scan (greedy), so the number
measures the model, not host dispatch.

Measurement rules (PERF.md; hard-won against the axon relay):
- NO donate_argnums: donated buffers make the first post-warmup dispatch
  ~3.5x slower through the relay (and compilation ~16x slower) — that
  artifact alone produced the round-1 BENCH reading of 52.6 tok/s vs the
  real ~186.
- >=3 timed reps with varied input values (the relay caches identical
  executions) and a VALUE readback each (block_until_ready can ACK early);
  headline = median, min also reported.
- jax.profiler cross-check: one rep is traced and the device-side time of
  the scan is printed next to the wall clock, so a relay-induced wall
  anomaly is visible instead of silently recorded.
"""

import glob
import gzip
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TOKS = 68.0  # reference TCQ4 decode t/s, RTX 3090 (README.md:44)
N_STEPS = 512
N_REPS = 3

# decode-only headline: the i8p PREFILL packs (2.2 GB extra weight
# residency the decode path never reads) cost a measured 2.4% of decode
# through HBM allocation-layout interference (4.48 vs 4.37 ms/step,
# round 5). Serving keeps them (1.6x prefill for that 2.4%); the
# decode benchmark measures decode.
os.environ.setdefault("RRS_PREFILL_I8", "0")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_scan_ms(trace_dir: str) -> float:
    """Total device-side ms of the largest jit program in a profiler trace."""
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        return float("nan")
    ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
    best = 0.0
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and e["name"].startswith("jit")):
            best = max(best, e["dur"])
    return best / 1e3


def main():
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model

    cfg = PRESETS["qwen3-4b"]
    log(f"building fabricated TCQ4 weights for {cfg.arch} "
        f"({cfg.n_layers}L, E={cfg.n_embd}, FF={cfg.n_ff})")
    t0 = time.time()
    weights = llama_model.fabricated_tcq4_weights(cfg, seed=0)
    jax.block_until_ready(weights.embed)
    log(f"weights ready in {time.time() - t0:.1f}s on {jax.devices()[0]}")

    # S=384 matches the baseline context (writes clip at s-1 after overflow —
    # identical per-step cost, steady-state attention)
    b, s = 1, 384
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    k_caches = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    v_caches = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    first = jnp.zeros((b,), jnp.int32)
    pos0 = jnp.zeros((b,), jnp.int32)

    # weights must be jit ARGUMENTS (closing over them bakes GBs of
    # constants into the HLO); one compiled scan reused for warmup + timing
    scan = jax.jit(
        lambda w, f, p, k, v: llama_model.decode_scan(
            cfg, w, f, p, k, v, N_STEPS),
    )

    t0 = time.time()
    toks, last, _, _ = scan(weights, first, pos0, k_caches, v_caches)
    _ = int(np.asarray(toks).sum())   # value readback: block_until_ready can ack
    log(f"compile+warmup ({N_STEPS} steps) in {time.time() - t0:.1f}s")

    times = []
    for rep in range(N_REPS + 1):
        t0 = time.time()
        toks, last, _, _ = scan(weights, last, pos0 + rep, k_caches, v_caches)
        _ = int(np.asarray(toks).sum())   # early under relayed transports
        dt = time.time() - t0
        if rep == 0:
            # rep 0 regularly reads 10-15% slow even after the compile
            # warmup (relay/device cold state; observed 190 vs 220-227
            # steady across round-5 runs) — report it but keep the
            # median over the steady reps
            log(f"rep 0 (warm-in, excluded): {N_STEPS} steps in {dt:.3f}s "
                f"-> {N_STEPS / dt:.1f} tok/s")
            continue
        times.append(dt)
        log(f"rep {rep}: {N_STEPS} steps in {dt:.3f}s "
            f"-> {N_STEPS / dt:.1f} tok/s ({dt / N_STEPS * 1e3:.2f} ms/step)")

    med = statistics.median(times)
    best = min(times)

    # profiler cross-check: device time of one traced rep
    trace_dir = "/tmp/rrs_bench_trace"
    try:
        with jax.profiler.trace(trace_dir):
            toks, last, _, _ = scan(weights, last, pos0 + N_REPS,
                                    k_caches, v_caches)
            _ = int(np.asarray(toks).sum())
        dev_ms = device_scan_ms(trace_dir)
    except Exception as e:                                  # noqa: BLE001
        log(f"profiler cross-check unavailable: {e}")
        dev_ms = float("nan")
    dev_step = dev_ms / N_STEPS
    log(f"median {N_STEPS / med:.1f} tok/s | min-rep {N_STEPS / best:.1f} "
        f"tok/s | device profile {dev_step:.2f} ms/step "
        f"({1e3 / dev_step:.1f} tok/s device-side)" if dev_ms == dev_ms else
        f"median {N_STEPS / med:.1f} tok/s | min-rep {N_STEPS / best:.1f} tok/s")
    if dev_ms == dev_ms and med / N_STEPS * 1e3 > 1.5 * dev_step:
        log("WARNING: wall clock disagrees with device profile by >1.5x — "
            "relay interference likely; trust the device number")

    tps = N_STEPS / med
    print(json.dumps({
        "metric": "qwen3_4b_tcq4_decode_1chip",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_TOKS, 3),
        "min_rep_toks": round(N_STEPS / best, 2),
        "device_ms_per_step": round(dev_step, 3) if dev_ms == dev_ms else None,
    }))


if __name__ == "__main__":
    main()
