"""pp/tg throughput sweeps (tools/llama-bench/llama-bench.cpp analog).

Measures prefill (pp) tokens/s and device-side greedy decode (tg) tokens/s,
printing a markdown table or JSON lines.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run(args):
    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.parallel.distributed import maybe_initialize, mesh_from_args

    maybe_initialize(args)
    mesh = mesh_from_args(args)

    if args.model:
        from rrs_tpu.models.loader import load_model

        cfg, weights, _ = load_model(args.model, fuse=mesh is None)
        name = args.model
    else:
        cfg = PRESETS[args.preset]
        weights = llama_model.fabricated_tcq4_weights(
            cfg, seed=0, fuse=mesh is None)
        name = f"{args.preset} (fabricated TCQ4)"

    lcfg = cfg
    wspecs = kvp = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rrs_tpu.parallel import sharding as sh

        weights = sh.shard_weights(weights, mesh)
        lcfg = sh._local_cfg(cfg, mesh.shape["tp"])
        wspecs = sh.weight_pspecs(weights)
        kvp = P("dp", None, None, None) if cfg.is_mla \
            else P("dp", "tp", None, None)
        name += f" tp={mesh.shape['tp']}"

    def gather_logits(l):
        l = jax.lax.all_gather(l, "tp", axis=-1, tiled=True)
        return l[..., : cfg.vocab_size]

    rows = []
    max_pp = max(args.pp) if args.pp else 512
    max_tg = max(args.tg) if args.tg else 128
    s = max_pp + max_tg + 8
    kshape = (1, cfg.kv_cache_heads, s, cfg.kv_k_dim)
    vshape = (1, cfg.kv_cache_heads, s, cfg.kv_v_dim)

    def kv_fresh():
        kc = [jnp.zeros(kshape, jnp.bfloat16) for _ in range(cfg.n_layers)]
        vc = [jnp.zeros(vshape, jnp.bfloat16) for _ in range(cfg.n_layers)]
        if mesh is not None:
            from jax.sharding import NamedSharding

            ns = NamedSharding(mesh, kvp)
            kc = [jax.device_put(x, ns) for x in kc]
            vc = [jax.device_put(x, ns) for x in vc]
        return kc, vc

    for pp in args.pp:
        tokens = jnp.zeros((1, pp), jnp.int32)
        kc, vc = kv_fresh()
        pos = jnp.arange(pp, dtype=jnp.int32)[None, :]

        body = lambda w, t, kc, vc: llama_model.forward(
            lcfg, w, t, pos, kc, vc, pos, pos)
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            body = shard_map(
                lambda w, t, kc, vc: (lambda lo, nk, nv:
                                      (gather_logits(lo), nk, nv))(
                    *llama_model.forward(lcfg, w, t, pos, kc, vc, pos, pos)),
                mesh=mesh,
                in_specs=(wspecs, P("dp", None),
                          [kvp] * cfg.n_layers, [kvp] * cfg.n_layers),
                out_specs=(P("dp", None, None),
                           [kvp] * cfg.n_layers, [kvp] * cfg.n_layers),
                check_vma=False)
        fn = jax.jit(body)
        out = fn(weights, tokens, kc, vc)
        jax.block_until_ready(out[0])
        t0 = time.time()
        # varied inputs: the axon relay caches identical executions
        out = fn(weights, tokens + 1, kc, vc)
        jax.block_until_ready(out[0])
        dt = time.time() - t0
        rows.append({"test": f"pp{pp}", "t/s": round(pp / dt, 2)})

    for tg in args.tg:
        kc, vc = kv_fresh()
        first = jnp.zeros((1,), jnp.int32)
        pos0 = jnp.zeros((1,), jnp.int32)
        body = lambda w, f, p, k, v: llama_model.decode_scan(
            lcfg, w, f, p, k, v, tg)
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            body = shard_map(
                lambda w, f, p, k, v: llama_model.decode_scan(
                    lcfg, w, f, p, k, v, tg, logits_fixup=gather_logits),
                mesh=mesh,
                in_specs=(wspecs, P("dp"), P("dp"),
                          [kvp] * cfg.n_layers, [kvp] * cfg.n_layers),
                out_specs=(P("dp", None), P("dp"),
                           [kvp] * cfg.n_layers, [kvp] * cfg.n_layers),
                check_vma=False)
        fn = jax.jit(body)
        out = fn(weights, first, pos0, kc, vc)
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = fn(weights, first + 1, pos0, kc, vc)
        jax.block_until_ready(out[0])
        dt = time.time() - t0
        rows.append({"test": f"tg{tg}", "t/s": round(tg / dt, 2)})

    if args.json:
        for r in rows:
            print(json.dumps({"model": name, **r}))
    else:
        print(f"| model | test | t/s |")
        print(f"|---|---|---|")
        for r in rows:
            print(f"| {name} | {r['test']} | {r['t/s']} |")
