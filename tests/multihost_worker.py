"""Worker process for test_multihost.py: one simulated host of N.

Runs the REAL multi-host product path — parallel.distributed.maybe_initialize
(the jax.distributed entry used by --dist-coordinator on generate/serve/bench,
replacing the reference's rpc-server role, ggml-rpc.cpp:92-113) followed by
mesh_from_args over the aggregated global device set and a TP
InferenceContext prefill+greedy decode. Prints the greedy tokens on one line
so the parent test can compare them with the single-process reference.

Usage: python multihost_worker.py <pid> <nprocs> <port> <local_devices> <tp>
"""

import os
import sys
from types import SimpleNamespace


def main():
    pid, nprocs, port, local, tp = (int(v) for v in sys.argv[1:6])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local}")
    import jax
    # the axon sitecustomize hook sets jax_platforms="axon,cpu" via
    # jax.config, which beats the env var; force cpu before backend init
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.clear_backends()
    except Exception:
        pass

    from rrs_tpu.parallel.distributed import maybe_initialize, mesh_from_args

    args = SimpleNamespace(
        dist_coordinator=f"127.0.0.1:{port}", dist_procs=nprocs,
        dist_id=pid, tp=tp, dp=1)
    assert maybe_initialize(args), "distributed flags must trigger init"
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs * local

    import numpy as np
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.runtime.context import InferenceContext

    cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=512, context_length=128,
        qk_norm=True)
    w = llama_model.random_weights(cfg, seed=3, quantize=True)
    mesh = mesh_from_args(args)
    assert mesh is not None and mesh.devices.size == tp

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64, mesh=mesh)
    seq = ctx.new_sequence()
    logits = ctx.prefill(seq, [1, 2, 3, 4, 5])
    toks = [int(np.asarray(logits[-1]).argmax())]
    for _ in range(4):
        d = ctx.decode({seq: toks[-1]})[seq]
        toks.append(int(np.asarray(d).argmax()))
    print("TOKENS:" + ",".join(str(t) for t in toks), flush=True)


if __name__ == "__main__":
    main()
