"""Multi-chip scaling-efficiency harness (SURVEY §6 north star: >=85%).

Measures the headline decode scan over a (dp, tp) jax Mesh and reports
tokens/s plus scaling efficiency vs the same model on ONE device:

  tp=N: weights/KV shard N ways -> ideal step time t1/N;
        efficiency = t1 / (N * tN)
  dp=N: N independent lanes -> ideal aggregate N * (1-lane tok/s);
        efficiency = agg_toks / (N * base_toks)

On real multi-chip hardware this is ONE command:
  PYTHONPATH=... python benchmarks/bench_scaling.py --tp 8
On this environment (one physical chip) the full path is validated on a
virtual CPU mesh (--virtual 8), where wall numbers are meaningless but
the sharding, collectives and efficiency plumbing are the real product
code (parallel/sharding.py::make_sharded_scan). --check-hlo additionally
pins the collective schedule by inspecting the lowered SPMD program:
exactly 2 all-reduces per layer (o + down row-parallel psums,
[B_local, 1, n_embd] bf16) and 1 logits all-gather per step — the same
schedule tests/test_scaling_hlo.py asserts in CI.

Measurement rules follow PERF.md: device-side scans, >=2 timed reps with
varied inputs, value readback.
"""
import argparse
import json
import os
import re
import statistics
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--preset", default="qwen3-4b")
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--seq", type=int, default=384)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--virtual", type=int, default=0,
                   help="run on an N-device virtual CPU mesh (validation)")
    p.add_argument("--check-hlo", action="store_true",
                   help="assert the collective schedule from lowered HLO")
    p.add_argument("--skip-baseline", action="store_true",
                   help="skip the 1-device reference run (report raw tok/s)")
    return p.parse_args()


def collective_schedule(lowered_text: str):
    """Count collectives and their payload bytes in lowered StableHLO.

    Line-based (NOT a multi-line regex: MLIR lines with inline constants
    can be megabytes long, and [^\\n]*-style patterns backtrack
    quadratically on them)."""
    dbytes = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "u32": 4,
              "i8": 1, "u8": 1, "i64": 8}
    kinds = ("all_reduce", "all_gather", "reduce_scatter",
             "collective_permute", "all_to_all")
    shape_re = re.compile(r"->\s*tensor<([^>]+)>")
    out = {}

    def nbytes(line):
        m = shape_re.search(line)
        if not m:
            return None
        dims = m.group(1).split("x")
        size = dbytes.get(dims[-1], 4)
        for d in dims[:-1]:
            size *= int(d)
        return size

    pending = None   # region-form op (all_reduce): type is on the `}) :` line
    for line in lowered_text.split("\n"):
        if pending and line.lstrip().startswith("})"):
            out[pending]["bytes"] += nbytes(line) or 0
            pending = None
            continue
        for kind in kinds:
            if f"stablehlo.{kind}" not in line:
                continue
            rec = out.setdefault(kind, {"count": 0, "bytes": 0})
            rec["count"] += 1
            size = nbytes(line)
            if size is None:
                pending = kind
            else:
                rec["bytes"] += size
            break
    return out


def main():
    args = parse_args()
    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.parallel.sharding import (make_mesh, make_sharded_scan,
                                           shard_weights)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = PRESETS[args.preset]
    if args.virtual:
        # virtual CPU devices can't hold 4B params; shrink depth only (the
        # sharding plan is per-layer, so 2 layers exercise the same specs)
        import dataclasses
        cfg = dataclasses.replace(cfg, n_layers=2, vocab_size=4096)
    n_dev = args.tp * args.dp
    assert n_dev <= len(jax.devices()), (n_dev, jax.devices())
    log(f"{args.preset}: tp={args.tp} dp={args.dp} on {jax.devices()[0]}")

    weights = llama_model.fabricated_tcq4_weights(cfg, seed=0, fuse=False)
    jax.block_until_ready(weights.embed)

    def timed_scan(run, run_args, b, label):
        t0 = time.time()
        toks, last = run(*run_args)
        _ = int(np.asarray(toks).sum())
        log(f"  {label}: compile+warmup {time.time() - t0:.1f}s")
        ts = []
        for rep in range(args.reps):
            a2 = (run_args[0], last, run_args[2] + rep + 1) + run_args[3:]
            t0 = time.time()
            toks, last = run(*a2)
            _ = int(np.asarray(toks).sum())
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        tps = args.steps * b / med
        log(f"  {label}: {tps:.1f} tok/s aggregate "
            f"({med / args.steps * 1e3:.2f} ms/step)")
        return tps, med / args.steps

    def build(mesh, b):
        make = make_sharded_scan(cfg, mesh, args.steps)
        ws = shard_weights(weights, mesh)
        kv_spec = P("dp", None, None, None) if cfg.is_mla \
            else P("dp", "tp", None, None)
        kv_shard = NamedSharding(mesh, kv_spec)
        shape = (b, cfg.n_kv_heads, args.seq, cfg.head_dim)
        kc = [jax.device_put(jnp.zeros(shape, jnp.bfloat16), kv_shard)
              for _ in range(cfg.n_layers)]
        vc = [jax.device_put(jnp.zeros(shape, jnp.bfloat16), kv_shard)
              for _ in range(cfg.n_layers)]
        lane = NamedSharding(mesh, P("dp"))
        first = jax.device_put(jnp.zeros((b,), jnp.int32), lane)
        pos0 = jax.device_put(jnp.zeros((b,), jnp.int32), lane)
        return make(ws), (ws, first, pos0, kc, vc)

    # --- collective-schedule check (no execution needed) ---
    if args.check_hlo:
        mesh = make_mesh(n_dev, dp=args.dp)
        run, run_args = build(mesh, b=args.dp)
        lowered = run.lower(*jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            run_args)).as_text()
        sched = collective_schedule(lowered)
        log(f"  collective schedule: {json.dumps(sched)}")
        if args.tp > 1:
            ar = sched.get("all_reduce", {"count": 0})
            ag = sched.get("all_gather", {"count": 0})
            assert ar["count"] == 2 * cfg.n_layers, sched
            assert ag["count"] == 1, sched
            assert not sched.get("reduce_scatter"), sched
            assert not sched.get("all_to_all"), sched
        else:
            assert not sched, f"dp-only plan must be collective-free: {sched}"
        log("  collective schedule OK")

    # --- baseline: one device ---
    base_tps = base_step = None
    if not args.skip_baseline:
        mesh1 = make_mesh(1)
        run1, args1 = build(mesh1, b=1)
        base_tps, base_step = timed_scan(run1, args1, 1, "1 device")

    # --- the (dp, tp) mesh ---
    mesh = make_mesh(n_dev, dp=args.dp)
    b = args.dp   # one lane per dp shard (decode latency benchmark shape)
    run, run_args = build(mesh, b)
    tps, step = timed_scan(run, run_args, b, f"tp={args.tp} dp={args.dp}")

    result = {
        "metric": f"{args.preset}_decode_scaling",
        "tp": args.tp, "dp": args.dp, "n_devices": n_dev,
        "toks_aggregate": round(tps, 2),
        "ms_per_step": round(step * 1e3, 3),
        "virtual_cpu_mesh": bool(args.virtual),
    }
    if base_tps is not None:
        if args.tp > 1 and args.dp == 1:
            eff = base_step / (args.tp * step)
        else:
            eff = tps / (n_dev * base_tps)
        result["baseline_toks"] = round(base_tps, 2)
        result["efficiency"] = round(eff, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
