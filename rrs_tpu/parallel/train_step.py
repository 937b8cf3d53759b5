"""SPMD training step over a ("dp", "ep", "tp") mesh — GSPMD-partitioned.

Inference decode runs under shard_map with explicit collectives
(sharding.py) because the quantized compute path is Pallas custom calls
that GSPMD cannot partition. Training runs dense weights — a pure-jnp
graph — so GSPMD propagation is the idiomatic fit: annotate parameter and
batch shardings, and XLA inserts the psum / all_gather / reduce_scatter
collectives over ICI.

Axes:
  dp — batch; gradients all-reduce over dp automatically
  ep — MoE expert stacks ([E, ...] sharded on E): each device computes its
       local experts' dense einsums, the routed combine psums over ep
  tp — attention heads / ffn columns (megatron col->row pairing), reused
       for sequence parallelism: the [B, S, V] loss region is constrained
       to P(dp, tp, None), sharding the log-softmax over sequence
       (sp-over-tp)

The reference trains single-device (ggml-opt.cpp: ggml_opt_fit); its only
multi-device story is the CUDA split-buffer TP for inference
(ggml-cuda.cu:778-870). This module is the part of SURVEY §2.7 the
reference does NOT have: a multi-chip training step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.parallel.sharding import weight_pspecs
from rrs_tpu.train.finetune import (TrainConfig, _loss_fn, combine,
                                    make_optimizer, partition)


def make_train_mesh(n_devices: int = 0, dp: int = 1, ep: int = 1,
                    devices=None) -> Mesh:
    """3-axis mesh ("dp", "ep", "tp"); tp takes the remaining devices."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    assert n % (dp * ep) == 0, (n, dp, ep)
    arr = np.asarray(devices).reshape(dp, ep, n // (dp * ep))
    return Mesh(arr, ("dp", "ep", "tp"))


def shard_train_weights(weights, mesh: Mesh):
    """device_put every weight leaf per the tp/ep plan (dp-replicated)."""
    ep = "ep" if "ep" in mesh.axis_names else None
    specs = weight_pspecs(weights, ep_axis=ep)
    return jax.tree.map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)),
        weights, specs)


def shard_batch(batch, mesh: Mesh):
    """[B, T+1] int32 token batch sharded over dp."""
    return jax.device_put(jnp.asarray(batch, jnp.int32),
                          NamedSharding(mesh, P("dp", None)))


def make_sharded_train_step(cfg: ModelConfig, mesh: Mesh, weights,
                            tc: Optional[TrainConfig] = None):
    """Build the jitted SPMD train step.

    Returns (step, params, static, opt_state) where
    ``step(params, opt_state, batch) -> (params, opt_state, loss)``;
    pass batches through :func:`shard_batch`. Weights are sharded here
    (tp on head/ffn dims, ep on expert stacks); optimizer state inherits
    the parameter shardings through the jitted init.
    """
    tc = tc or TrainConfig()
    weights = shard_train_weights(weights, mesh)
    params, static = partition(weights)
    opt = make_optimizer(tc)
    opt_state = jax.jit(opt.init)(params)
    sp_logits = NamedSharding(mesh, P("dp", "tp", None))

    @jax.jit
    def step(params, opt_state, batch):
        def loss_of(p):
            return _loss_fn(cfg, combine(p, static), batch,
                            logits_sharding=sp_logits)

        loss, grads = jax.value_and_grad(loss_of)(params)
        grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return step, params, static, opt_state
