"""Multi-host (multi-process) validation of the distributed entry.

The reference scales across hosts with rpc-server + --rpc (ggml-rpc.cpp);
the TPU-native replacement is SPMD: every host runs the same program,
jax.distributed.initialize aggregates the devices, and XLA emits the
collectives. One physical TPU host exists in this environment, so this
test simulates 2 hosts as 2 OS processes, each with 2 virtual CPU devices
(Gloo collectives across processes), and checks the product path
(maybe_initialize -> mesh_from_args -> InferenceContext(mesh) prefill +
greedy decode) agrees with the single-process reference.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_tp_matches_single_process():
    nprocs, local, tp = 2, 2, 4
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nprocs), str(port),
             str(local), str(tp)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(WORKER.parent.parent),
            env={**os.environ,
                 "PYTHONPATH": str(WORKER.parent.parent) + os.pathsep
                 + os.environ.get("PYTHONPATH", "")})
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-4000:]}"
        outs.append(out)

    tok_lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("TOKENS:")
    ]
    assert len(tok_lines) == nprocs
    # all processes computed the same SPMD result
    assert len(set(tok_lines)) == 1
    got = [int(t) for t in tok_lines[0].split(":", 1)[1].split(",")]

    # single-process reference through the same public API
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.runtime.context import InferenceContext

    cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=512, context_length=128,
        qk_norm=True)
    w = llama_model.random_weights(cfg, seed=3, quantize=True)
    ref = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    seq = ref.new_sequence()
    logits = ref.prefill(seq, [1, 2, 3, 4, 5])
    want = [int(np.asarray(logits[-1]).argmax())]
    for _ in range(4):
        d = ref.decode({seq: want[-1]})[seq]
        want.append(int(np.asarray(d).argmax()))

    assert got == want
