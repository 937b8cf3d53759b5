"""pp/tg/pg throughput sweeps (tools/llama-bench/llama-bench.cpp analog).

Feature parity with the reference tool (llama-bench.cpp): the full
parameter cross-product (models x pp/tg/pg tests x depth x batch x KV
cache types x mesh), r repetitions reported as avg +- stddev, and the
five output writers — markdown, csv, json, jsonl and sql with the
reference's llama_bench table shape (llama-bench.cpp:1416-1448 field
list, :1930-1950 CREATE TABLE/INSERT writers). TPU adaptations instead
of translations: tests run as device-side scans / single big dispatches
per PERF.md timing rules (the axon relay caches identical executions and
adds fixed per-dispatch cost, so each rep varies inputs and reads a
value back); n_gpu_layers/cpu_mask/mmap knobs become tp/dp mesh shape
and KV quant types, which are the levers that exist on this backend.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import time


# the reference's field list (llama-bench.cpp:1416), minus knobs with no
# TPU meaning (cpu_mask, poll, mmap, ...), plus the mesh shape
FIELDS = [
    "build_commit", "build_number", "cpu_info", "gpu_info", "backends",
    "model_filename", "model_type", "model_size", "model_n_params",
    "n_batch", "type_k", "type_v", "flash_attn", "tensor_split",
    "n_prompt", "n_gen", "n_depth", "test_time",
    "avg_ns", "stddev_ns", "avg_ts", "stddev_ts",
]
INT_FIELDS = {"build_number", "model_size", "model_n_params", "n_batch",
              "n_prompt", "n_gen", "n_depth", "avg_ns", "stddev_ns",
              "flash_attn"}
FLOAT_FIELDS = {"avg_ts", "stddev_ts"}


def _build_commit():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=__file__.rsplit("/", 3)[0], timeout=5,
        ).stdout.strip() or "unknown"
    except Exception:                                     # noqa: BLE001
        return "unknown"


def _tree_stats(weights):
    """(bytes on device, logical param count) over the weight pytree."""
    import jax
    import jax.numpy as jnp
    from rrs_tpu.models.linear import MXFP4Linear, Q8Linear, TCQ4Linear

    size = 0
    for leaf in jax.tree.leaves(weights):
        size += leaf.size * leaf.dtype.itemsize

    params = 0

    def count(node):
        nonlocal params
        if isinstance(node, TCQ4Linear):
            params += node.qs.size * 2
            return True
        if isinstance(node, Q8Linear):
            params += node.q.size
            return True
        if isinstance(node, MXFP4Linear):
            params += node.blocks.size * 2
            return True
        return False

    jax.tree.map(lambda x: x, weights,
                 is_leaf=lambda n: count(n) if not isinstance(n, jnp.ndarray)
                 else False)
    # plain arrays (embeddings, norms, dense linears)
    for leaf in jax.tree.leaves(
            weights, is_leaf=lambda n: isinstance(
                n, (TCQ4Linear, Q8Linear, MXFP4Linear))):
        if not isinstance(leaf, (TCQ4Linear, Q8Linear, MXFP4Linear)):
            params += leaf.size
    return size, params


def _kv_maker(quant, b, heads, s, head_dim):
    import jax.numpy as jnp

    shape = (b, heads, s, head_dim)
    if quant == "q8_0":
        return lambda: (jnp.zeros(shape, jnp.int8),
                        jnp.ones((b, heads, 1, s), jnp.float32))
    if quant == "q4_0":
        return lambda: (jnp.zeros(shape[:-1] + (head_dim // 2,), jnp.uint8),
                        jnp.ones((b, heads, 1, s), jnp.float32))
    assert quant in ("bf16", "f16"), quant
    return lambda: jnp.zeros(shape, jnp.bfloat16)


def _fmt_test(row):
    if row["n_prompt"] and not row["n_gen"]:
        t = f"pp{row['n_prompt']}"
    elif row["n_gen"] and not row["n_prompt"]:
        t = f"tg{row['n_gen']}"
    else:
        t = f"pp{row['n_prompt']}+tg{row['n_gen']}"
    if row["n_depth"]:
        t += f" @ d{row['n_depth']}"
    return t


def _write(rows, fmt):
    def human_size(b):
        return (f"{b / 1024**3:.2f} GiB" if b >= 1024**3
                else f"{b / 1024**2:.2f} MiB")

    def human_params(p):
        return f"{p / 1e9:.2f} B" if p >= 1e9 else f"{p / 1e6:.2f} M"

    if fmt == "md":
        # like the reference: parameters that VARY across rows get their
        # own column (llama-bench.cpp markdown_printer)
        varying = [f for f in ("n_batch", "type_k", "type_v",
                               "tensor_split")
                   if len({r[f] for r in rows}) > 1]
        hdr = ["model", "size", "params", "backend", *varying,
               "test", "t/s"]
        print("| " + " | ".join(hdr) + " |")
        print("|" + "|".join("---" for _ in hdr) + "|")
        for r in rows:
            extra = "".join(f" {r[f]} |" for f in varying)
            print(f"| {r['model_type']} | {human_size(r['model_size'])} "
                  f"| {human_params(r['model_n_params'])} | {r['backends']} "
                  f"|{extra} {_fmt_test(r)} "
                  f"| {r['avg_ts']:.2f} ± {r['stddev_ts']:.2f} |")
    elif fmt == "csv":
        print(",".join(FIELDS))
        for r in rows:
            print(",".join(f'"{r[f]}"' if f not in INT_FIELDS
                           and f not in FLOAT_FIELDS else str(r[f])
                           for f in FIELDS))
    elif fmt == "json":
        print(json.dumps([{f: r[f] for f in FIELDS} for r in rows],
                         indent=2))
    elif fmt == "jsonl":
        for r in rows:
            print(json.dumps({f: r[f] for f in FIELDS}))
    elif fmt == "sql":
        cols = []
        for f in FIELDS:
            t = ("INTEGER" if f in INT_FIELDS
                 else "REAL" if f in FLOAT_FIELDS else "TEXT")
            cols.append(f"    {f} {t}")
        print("CREATE TABLE IF NOT EXISTS llama_bench (\n"
              + ",\n".join(cols) + "\n);")
        for r in rows:
            vals = []
            for f in FIELDS:
                v = r[f]
                vals.append(str(v) if f in INT_FIELDS or f in FLOAT_FIELDS
                            else "'" + str(v).replace("'", "''") + "'")
            print(f"INSERT INTO llama_bench ({', '.join(FIELDS)}) "
                  f"VALUES ({', '.join(vals)});")
    else:
        raise SystemExit(f"unknown output format {fmt!r}")


def run(args):
    import jax
    import jax.numpy as jnp

    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.parallel.distributed import maybe_initialize, mesh_from_args

    maybe_initialize(args)
    mesh = mesh_from_args(args)
    reps = max(1, args.reps)
    fmt = "jsonl" if getattr(args, "json", False) else args.output_format

    models = [(m, None) for m in (args.model or [])]
    if not models:
        models = [(None, p) for p in (args.preset or ["qwen3-4b"])]

    pg = []
    for spec in args.pg or []:
        pp_s, tg_s = spec.split(",")
        pg.append((int(pp_s), int(tg_s)))
    tests = ([(pp, 0) for pp in args.pp] + [(0, tg) for tg in args.tg] + pg)

    dev = jax.devices()[0]
    base = {
        "build_commit": _build_commit(), "build_number": 0,
        "cpu_info": "host", "gpu_info": dev.device_kind,
        "backends": "XLA/Pallas TPU", "flash_attn": 1,
        "tensor_split":
            f"tp{mesh.shape['tp']}/dp{mesh.shape['dp']}" if mesh else "1",
    }

    rows = []
    for model_path, preset in models:
        if model_path:
            from rrs_tpu.models.loader import load_model

            cfg, weights, _ = load_model(model_path, fuse=mesh is None)
            mname, mtype = model_path, cfg.arch
        else:
            cfg = PRESETS[preset]
            weights = llama_model.fabricated_tcq4_weights(
                cfg, seed=0, fuse=mesh is None)
            mname, mtype = f"{preset} (fabricated)", f"{preset} TCQ4_K32"
        size, params = _tree_stats(weights)

        lcfg, wspecs, kvp = cfg, None, None
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from rrs_tpu.parallel import sharding as sh

            weights = sh.shard_weights(weights, mesh)
            lcfg = sh._local_cfg(cfg, mesh.shape["tp"])
            wspecs = sh.weight_pspecs(weights)
            kvp = P("dp", None, None, None) if cfg.is_mla \
                else P("dp", "tp", None, None)

        def gather_logits(lo):
            lo = jax.lax.all_gather(lo, "tp", axis=-1, tiled=True)
            return lo[..., : cfg.vocab_size]

        for b in args.batch:
            for ct in args.ctk:
                for pp, tg in tests:
                    for depth in args.depth:
                        r = _run_one(
                            jax, jnp, llama_model, cfg, lcfg, weights,
                            mesh, wspecs, kvp, gather_logits,
                            b, ct, args.ctv or ct, pp, tg, depth, reps)
                        rows.append({
                            **base, "model_filename": mname,
                            "model_type": mtype, "model_size": size,
                            "model_n_params": params, "n_batch": b,
                            "type_k": ct, "type_v": args.ctv or ct,
                            "n_prompt": pp, "n_gen": tg, "n_depth": depth,
                            **r,
                        })

    _write(rows, fmt)


def _run_one(jax, jnp, llama_model, cfg, lcfg, weights, mesh, wspecs, kvp,
             gather_logits, b, ctk, ctv, pp, tg, depth, reps):
    s = depth + pp + tg + 8
    mk_k = _kv_maker(ctk, b, cfg.kv_cache_heads, s, cfg.kv_k_dim)
    mk_v = _kv_maker(ctv, b, cfg.kv_cache_heads, s, cfg.kv_v_dim)

    def kv_fresh():
        kc = [mk_k() for _ in range(cfg.n_layers)]
        vc = [mk_v() for _ in range(cfg.n_layers)]
        if mesh is not None:
            from jax.sharding import NamedSharding

            ns = NamedSharding(mesh, kvp)
            put = lambda x: (jax.device_put(x, ns) if not isinstance(x, tuple)
                             else tuple(jax.device_put(y, ns) for y in x))
            kc = [put(x) for x in kc]
            vc = [put(x) for x in vc]
        return kc, vc

    n_work = (pp + tg) * b

    def prefill_body(w, t, pos, kc, vc):
        return llama_model.forward(lcfg, w, t, pos, kc, vc, pos, pos)

    def make_fn():
        """One jitted callable covering the (depth-prefill +) pp + tg test."""

        def fn(w, toks, kc, vc):
            pos_off = depth
            val = None
            if pp:
                pos = pos_off + jnp.arange(pp, dtype=jnp.int32)[None, :]
                lo, kc, vc = prefill_body(w, toks, pos, kc, vc)
                pos_off += pp
                val = lo.sum() * 0.0 + 1.0
            if tg:
                first = (toks[:, 0] if pp == 0
                         else jnp.zeros((b,), jnp.int32))
                p0 = jnp.full((b,), pos_off, jnp.int32)
                fix = gather_logits if mesh is not None else None
                toks_out, last, kc, vc = llama_model.decode_scan(
                    lcfg, w, first, p0, kc, vc, tg, logits_fixup=fix)
                val = toks_out.sum() * 1.0
            if mesh is not None:
                # replicate the readback scalar (dp shards differ)
                val = jax.lax.psum(val, ("dp", "tp"))
            return val

        if mesh is None:
            return jax.jit(fn)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        return jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(wspecs, P("dp", None),
                      [kvp] * cfg.n_layers, [kvp] * cfg.n_layers),
            out_specs=P(),
            check_vma=False))

    fn = make_fn()
    toks = jnp.zeros((b, max(pp, 1)), jnp.int32)
    kc, vc = kv_fresh()
    out = fn(weights, toks, kc, vc)
    float(out)   # value readback: block_until_ready can ACK early (PERF.md)
    times = []
    for rep in range(reps):
        kc, vc = kv_fresh()
        t0 = time.time()
        out = fn(weights, toks + rep + 1, kc, vc)
        float(out)
        times.append(time.time() - t0)
    avg = statistics.mean(times)
    std = statistics.stdev(times) if len(times) > 1 else 0.0
    ts = [n_work / t for t in times]
    return {
        "test_time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "avg_ns": int(avg * 1e9), "stddev_ns": int(std * 1e9),
        "avg_ts": round(statistics.mean(ts), 2),
        "stddev_ts": round(statistics.stdev(ts) if len(ts) > 1 else 0.0, 2),
    }
