"""Llama-3-70B sharding evidence: lower + compile the FULL tp=8 SPMD
decode step at real 70B shapes WITHOUT materializing weights.

The ≥85%-scaling north-star names Llama-3-70B on multi-host TPU; no
multi-chip hardware exists in this environment, so what CAN be proven is
that the product sharding plan (parallel/sharding.py::make_sharded_step —
megatron col/row splits, KV heads on tp, vocab-sharded head + all_gather)
partitions and compiles for the real model at tp=8: every weight is
abstract (jax.ShapeDtypeStruct), so this validates shapes, layouts,
PartitionSpecs and the collective schedule, not numerics.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python benchmarks/compile_70b_tp8.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import ShapeDtypeStruct as SDS

from rrs_tpu.models import llama as lm
from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.linear import Q8Linear, TCQ4Linear
from rrs_tpu.parallel.sharding import make_mesh, make_sharded_step


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def abstract_weights(cfg):
    """70B TCQ4 weights as ShapeDtypeStructs (the quantizer's type policy:
    TCQ4 body, Q8_0 lm_head, bf16 embed)."""

    def tcq4(k, n):
        return TCQ4Linear(qs=SDS((k // 2, n), jnp.uint8),
                          eff=SDS((k // 32, n), jnp.bfloat16), gather=None)

    def q8(k, n):
        npad = (n + 2047) // 2048 * 2048
        return Q8Linear(q=SDS((k, npad), jnp.int8),
                        scale=SDS((k // 32, npad), jnp.float32),
                        n_logical=n)

    e, f = cfg.n_embd, cfg.n_ff
    layers = [
        lm.LayerWeights(
            attn_norm=SDS((e,), jnp.bfloat16),
            wq=tcq4(e, cfg.n_q_dim), wk=tcq4(e, cfg.n_kv_dim),
            wv=tcq4(e, cfg.n_kv_dim), wo=tcq4(cfg.n_q_dim, e),
            q_norm=None, k_norm=None,
            ffn_norm=SDS((e,), jnp.bfloat16),
            w_gate=tcq4(e, f), w_up=tcq4(e, f), w_down=tcq4(f, e),
        )
        for _ in range(cfg.n_layers)
    ]
    return lm.ModelWeights(
        embed=SDS((cfg.vocab_size, e), jnp.bfloat16),
        layers=layers,
        final_norm=SDS((e,), jnp.bfloat16),
        lm_head=q8(e, cfg.vocab_size),
    )


def main():
    cfg = PRESETS["llama-3-70b"]
    mesh = make_mesh(8, dp=1)
    w = abstract_weights(cfg)
    step = make_sharded_step(cfg, mesh)(w)

    b, t, s = 8, 1, 4096
    kv = [SDS((b, cfg.n_kv_heads, s, cfg.head_dim), jnp.bfloat16)
          for _ in range(cfg.n_layers)]
    args = (w, SDS((b, t), jnp.int32), SDS((b,), jnp.int32), kv, list(kv))

    t0 = time.time()
    lowered = step.lower(*args)
    log(f"lower (SPMD partitioning + shape flow) OK in {time.time()-t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    log(f"XLA compile OK in {time.time()-t0:.1f}s")
    mem = compiled.memory_analysis()
    if mem is not None:
        log(f"per-device argument bytes: {mem.argument_size_in_bytes/2**30:.2f} GiB, "
            f"temp: {mem.temp_size_in_bytes/2**20:.1f} MiB")
    print("llama-3-70b tp=8 decode step: lower+compile OK")


if __name__ == "__main__":
    main()
