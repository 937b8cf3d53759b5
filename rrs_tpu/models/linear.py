"""Linear-layer abstraction: dense bf16 or TCQ4 W4A4 with RRS rotation.

This is the single seam through which all projection matmuls in the model go —
the analog of ggml's MUL_MAT dispatch choosing MMQ/MMVQ/cuBLAS vs the fused
TCQ4 path (ggml-cuda.cu:2188-2310 -> rrs.cu:241).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.formats.fwht import RRS_BLOCK, hadamard_matrix
from rrs_tpu.formats.tcq4 import (
    TCQ4Tensor,
    dequantize_activations_rrs,
    effective_scales,
    quantize_activations_rrs,
)
from rrs_tpu.ops import tcq4_matmul as tcq4_mm


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["w", "bias"],
    meta_fields=[],
)
@dataclasses.dataclass
class DenseLinear:
    """Unquantized linear; w is [K, N] (already transposed for x @ w)."""

    w: jnp.ndarray
    bias: Optional[jnp.ndarray] = None

    @property
    def shape(self):
        return self.w.shape


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "eff", "gather", "bias"],
    meta_fields=[],
)
@dataclasses.dataclass
class TCQ4Linear:
    """TCQ4 W4A4 linear. Device arrays in the K-major kernel layout.

    ``gather`` is the optional int32 [K] channel permutation (block-local)
    applied to activations before rotation — the device analog of the CUDA
    perm registry (rrs.cu:82-127).
    """

    qs: jnp.ndarray                  # uint8 [K//2, N]
    eff: jnp.ndarray                 # f32 [K//32, N] effective group scales
    gather: Optional[jnp.ndarray]    # int32 [K] or None
    bias: Optional[jnp.ndarray] = None

    @property
    def shape(self):
        return (self.qs.shape[0] * 2, self.qs.shape[1])

    @classmethod
    def from_tensor(cls, t: TCQ4Tensor, bias=None) -> "TCQ4Linear":
        # perms are block-local (quantize.cpp:127-164 sorts within 256-blocks);
        # store them as within-block offsets => K-shard-invariant
        gather = None
        if t.perm is not None:
            gather = jnp.asarray(np.asarray(t.perm, np.int64) % 256, jnp.int32)
        return cls(
            qs=jnp.asarray(t.qs),
            eff=jnp.asarray(effective_scales(t)),
            gather=gather,
            bias=None if bias is None else jnp.asarray(bias),
        )


def _hadamard_f32():
    # hadamard_matrix is lru_cached; jnp.asarray here is constant-folded by
    # jit (a fresh conversion per trace avoids leaking tracers via globals)
    return jnp.asarray(hadamard_matrix(RRS_BLOCK), dtype=jnp.float32)


def rotate_activations(x: jnp.ndarray, gather: Optional[jnp.ndarray]) -> jnp.ndarray:
    """perm-gather + per-256-block FWHT via one MXU matmul (f32)."""
    k = x.shape[-1]
    lead = x.shape[:-1]
    assert k % RRS_BLOCK == 0, (
        f"TCQ4 activation width {k} not a multiple of {RRS_BLOCK}; for "
        f"row-parallel TP shards, (K / tp) must stay 256-aligned")
    xb = x.reshape(*lead, k // RRS_BLOCK, RRS_BLOCK).astype(jnp.float32)
    if gather is not None:
        # block-local offsets (perm % 256): invariant under K-sharding at
        # 256-boundaries, so row-parallel TP shards gather correctly
        idx = jnp.broadcast_to(gather.reshape(k // RRS_BLOCK, RRS_BLOCK), xb.shape)
        xb = jnp.take_along_axis(xb, idx, axis=-1)
    rot = jnp.einsum(
        "...bi,ij->...bj",
        xb,
        _hadamard_f32(),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return rot.reshape(*lead, k)


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def linear_apply(layer, x: jnp.ndarray, reduce_axis=None) -> jnp.ndarray:
    """y = x @ W^T (+ bias). x: [..., K] -> [..., N].

    ``reduce_axis``: mesh axis to psum partial products over (row-parallel
    TP). The reduction happens in f32 BEFORE the output cast so sharded and
    single-device execution round identically.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    if isinstance(layer, DenseLinear):
        y = jnp.dot(x2, layer.w, preferred_element_type=jnp.float32)
    elif isinstance(layer, TCQ4Linear):
        rot = rotate_activations(x2, layer.gather)
        a_q, a_s = quantize_activations_rrs(rot)
        a = dequantize_activations_rrs(a_q, a_s)   # XLA fuses quant+dequant
        y = tcq4_mm.tcq4_matmul(
            a, layer.qs, layer.eff, interpret=_auto_interpret()
        )
    else:
        raise TypeError(f"unknown linear layer {type(layer)}")
    if reduce_axis is not None:
        y = jax.lax.psum(y.astype(jnp.float32), reduce_axis)
    if layer.bias is not None:
        y = y + layer.bias.astype(y.dtype)
    y = y.astype(x.dtype if x.dtype != jnp.float32 else jnp.float32)
    return y.reshape(*lead, y.shape[-1])
