"""Fast Walsh–Hadamard transform (the "R" of Rotated Runtime Smooth).

Reference semantics (reimplemented, not ported): the reference implements an
in-place iterative butterfly FWHT with fused 1/sqrt(n) normalization on the
last stage (ggml/src/ggml-cpu/rrs.c:41-123) and asserts two invariants
(verify-rrs.c:28-92):

  * self-inverse:        fwht(fwht(x)) == x
  * norm preservation:   ||fwht(x)|| == ||x||

i.e. the normalized transform is a real orthogonal involution.

TPU-native design: on TPU the 256-point FWHT is expressed as a 256x256 matmul
on the MXU (``x_blocks @ H``), NOT as butterflies — 256 MACs/element is free
next to the int4 GEMM it feeds, it vectorizes perfectly, and the per-tensor
channel permutation of the reorder path folds into the same matrix
(``rotation_matrix``): (x P) H == x (P H), so permute+FWHT+normalize is ONE
matmul. The butterfly form is kept (``fwht``/``fwht_np``) as the reference
oracle for property tests and for host-side weight quantization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# The RRS block width: FWHT is applied independently to each 256-wide chunk of
# the K (input-channel) axis. Mirrors the reference's fixed 256 chunking
# (ggml/src/ggml-cuda/tcq4_k32.cu:71-277, ggml/src/ggml-quants.c:1355-1660).
RRS_BLOCK = 256


def fwht_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Normalized FWHT over ``axis`` (length must be a power of two). NumPy, host-side."""
    x = np.moveaxis(np.asarray(x, dtype=np.float64), axis, -1)
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FWHT length must be a power of two, got {n}")
    h = 1
    while h < n:
        x = x.reshape(*x.shape[:-1], n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = np.concatenate([a + b, a - b], axis=-1).reshape(*x.shape[:-3], n)
        h *= 2
    x = x / np.sqrt(n)
    return np.moveaxis(x, -1, axis)


def fwht(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Normalized FWHT over ``axis`` — jnp butterfly version (any power of two)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FWHT length must be a power of two, got {n}")
    shape = x.shape
    h = 1
    while h < n:
        x = x.reshape(*shape[:-1], n // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.concatenate([a + b, a - b], axis=-1)
        h *= 2
    x = x.reshape(shape) * (1.0 / np.sqrt(n))
    return jnp.moveaxis(x, -1, axis)


@functools.lru_cache(maxsize=8)
def _hadamard_np(n: int) -> np.ndarray:
    """Sylvester Hadamard matrix of order n (power of two), entries ±1, float64."""
    if n & (n - 1):
        raise ValueError(f"Hadamard order must be a power of two, got {n}")
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_matrix(n: int = RRS_BLOCK, normalized: bool = True) -> np.ndarray:
    """Dense Hadamard matrix; ``x @ hadamard_matrix(n)`` == ``fwht(x)`` when normalized.

    Note the Sylvester H is symmetric, so left/right application agree.
    """
    h = _hadamard_np(n).copy()
    if normalized:
        h /= np.sqrt(n)
    return h


def rotation_matrix(perm: np.ndarray | None = None, n: int = RRS_BLOCK) -> np.ndarray:
    """Per-tensor activation rotation matrix R with the channel permutation folded in.

    The reference applies (1) an optional within-block channel-permutation
    gather then (2) the normalized FWHT to each 256-chunk of the activations
    (tcq4_rrs_fused_activation_kernel, ggml/src/ggml-cuda/tcq4_k32.cu:71-277).
    Both fold into one matrix:  with y = fwht(x[perm]),
        y_j = sum_i x[perm[i]] H[i, j] = sum_k x[k] H[inv[k], j]
    so ``y = x @ R`` with ``R = H[inv, :]`` where ``inv`` is the inverse
    permutation. One MXU matmul replaces the gather + 8 butterfly stages +
    normalization of the CUDA kernel.

    ``perm`` uses the reference convention (tools/quantize/quantize.cpp:127-164):
    ``perm[i]`` = source channel index gathered into position ``i``.
    """
    h = hadamard_matrix(n, normalized=True)
    if perm is None:
        return h
    perm = np.asarray(perm, dtype=np.int64)
    if perm.shape != (n,):
        raise ValueError(f"perm must have shape ({n},), got {perm.shape}")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    return h[inv, :]


def block_rotate(x: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-256-block rotation matrix to the last axis of ``x``.

    x: [..., K] with K % RRS_BLOCK == 0; rot: [RRS_BLOCK, RRS_BLOCK].
    Equivalent to the fused perm-gather + FWHT + 1/16 normalization of the
    reference's activation pipeline, expressed as an MXU matmul.
    """
    n = rot.shape[0]
    k = x.shape[-1]
    if k % n:
        raise ValueError(f"last axis {k} not a multiple of block {n}")
    lead = x.shape[:-1]
    xb = x.reshape(*lead, k // n, n)
    out = jnp.einsum("...bi,ij->...bj", xb, rot.astype(x.dtype),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*lead, k).astype(x.dtype)
