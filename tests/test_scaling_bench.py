"""Scaling-efficiency harness: collective schedule + end-to-end run.

Pins the SPMD decode-scan collective schedule (the multi-chip perf
contract: exactly 2 all-reduces per layer from the row-parallel o/down
psums, 1 logits all-gather per step, nothing else — any extra collective
is a sharding-plan regression that silently costs ICI bandwidth), and
runs benchmarks/bench_scaling.py end-to-end on the virtual CPU mesh.

Reference analog: the scaling numbers in the reference's benches
(/root/reference/benches/dgx-spark/dgx-spark.md) are produced by
llama-bench over -ngl/-ts splits; here the harness is
benchmarks/bench_scaling.py over a jax Mesh.
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import llama as llama_model
from rrs_tpu.parallel.sharding import (make_mesh, make_sharded_scan,
                                       shard_weights)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _tiny_cfg(**kw):
    return ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=512, context_length=128,
        qk_norm=True, **kw)


def _lowered_text(cfg, dp):
    w = llama_model.random_weights(cfg, seed=3, quantize=True)
    mesh = make_mesh(8, dp=dp)
    ws = shard_weights(w, mesh)
    kv = NamedSharding(mesh, P("dp", "tp", None, None))
    b = dp
    shape = (b, cfg.n_kv_heads, 32, cfg.head_dim)
    kc = [jax.device_put(jnp.zeros(shape, jnp.bfloat16), kv)
          for _ in range(cfg.n_layers)]
    vc = [jax.device_put(jnp.zeros(shape, jnp.bfloat16), kv)
          for _ in range(cfg.n_layers)]
    lane = NamedSharding(mesh, P("dp"))
    first = jax.device_put(jnp.zeros((b,), jnp.int32), lane)
    run = make_sharded_scan(cfg, mesh, 4)(ws)
    return run.lower(ws, first, first, kc, vc).as_text()


def test_tp_collective_schedule():
    from benchmarks.bench_scaling import collective_schedule

    sched = collective_schedule(_lowered_text(_tiny_cfg(), dp=2))
    ar = sched.get("all_reduce", {"count": 0, "bytes": 0})
    ag = sched.get("all_gather", {"count": 0, "bytes": 0})
    # 2 row-parallel psums per layer (o + down), 1 logits all-gather per
    # step; dp lanes never communicate
    assert ar["count"] == 2 * 2, sched
    assert ag["count"] == 1, sched
    assert not sched.get("reduce_scatter"), sched
    assert not sched.get("all_to_all"), sched
    assert not sched.get("collective_permute"), sched
    # psum payloads: [B_local=1, 1, n_embd] f32 per shard
    assert 0 < ar["bytes"] <= 4 * (256 * 4 + 16), sched


def test_scaling_bench_end_to_end():
    """The harness runs as the product command on a virtual mesh and
    reports efficiency (numbers meaningless on CPU; plumbing real)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))])
    script = os.path.join(os.path.dirname(__file__), "..",
                          "benchmarks", "bench_scaling.py")
    out = subprocess.run(
        [sys.executable, script, "--tp", "2", "--dp", "2", "--virtual", "4",
         "--steps", "4", "--seq", "16", "--reps", "1", "--preset",
         "qwen3-0.6b"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["n_devices"] == 4 and res["virtual_cpu_mesh"]
    assert res["toks_aggregate"] > 0
    assert "efficiency" in res, res
