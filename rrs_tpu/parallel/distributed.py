"""Multi-host entry: jax.distributed + mesh construction from CLI flags.

TPU-native replacement for the reference's ggml-rpc transport
(ggml-rpc/ggml-rpc.cpp:92-113 command protocol + rpc-server): instead of a
host-orchestrated star topology shipping serialized graphs over TCP, every
host runs the same SPMD program and XLA emits ICI/DCN collectives. The
"rpc-server" role disappears; coordination is jax.distributed.initialize.

Flags (on generate/serve/bench):
  --tp N                tensor-parallel ways (row-split analog, llama.h:196)
  --dp N                data-parallel ways over KV lanes
  --dist-coordinator H:P  multi-host coordinator address (host 0's)
  --dist-procs N          total process count
  --dist-id I             this process's index

Environment fallbacks: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID (and cloud-TPU autodetection when none are set).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize(args) -> bool:
    """Initialize jax.distributed when multi-host flags/env are present.
    Returns True when running distributed."""
    coord = getattr(args, "dist_coordinator", None) or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    nprocs = getattr(args, "dist_procs", None) or os.environ.get(
        "JAX_NUM_PROCESSES")
    pid = getattr(args, "dist_id", None)
    if pid is None:
        pid = os.environ.get("JAX_PROCESS_ID")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nprocs) if nprocs is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    return True


def mesh_from_args(args) -> Optional["jax.sharding.Mesh"]:
    """Build the (dp, tp) mesh requested by --tp/--dp, or None for the
    single-device path. Uses all visible devices (local + remote when
    jax.distributed is initialized)."""
    tp = int(getattr(args, "tp", 1) or 1)
    dp = int(getattr(args, "dp", 1) or 1)
    if tp * dp <= 1:
        return None
    from rrs_tpu.parallel.sharding import make_mesh

    devices = jax.devices()
    if len(devices) < tp * dp:
        raise SystemExit(
            f"--tp {tp} --dp {dp} needs {tp * dp} devices; "
            f"only {len(devices)} visible. For a CPU dry run set "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={tp * dp}.")
    return make_mesh(tp * dp, dp=dp, devices=devices[: tp * dp])


def add_parallel_args(parser) -> None:
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel ways over the device mesh "
                             "(row-split analog)")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel ways over KV lanes")
    parser.add_argument("--dist-coordinator", default=None,
                        help="multi-host coordinator host:port "
                             "(jax.distributed)")
    parser.add_argument("--dist-procs", type=int, default=None,
                        help="total process count for multi-host")
    parser.add_argument("--dist-id", type=int, default=None,
                        help="this process's index for multi-host")
