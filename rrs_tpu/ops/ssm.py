"""Selective state-space ops (Mamba-1) — the GGML_OP_SSM_CONV /
GGML_OP_SSM_SCAN analogs (reference: ggml_ssm_conv / ggml_ssm_scan usage in
src/models/graph-context-mamba.cpp:5-140; op kernels ggml/src/ggml.c and
ggml-cuda/ssm-scan.cu).

TPU-native design: the recurrence
    h_t = exp(softplus(dt_t) * A) * h_{t-1} + softplus(dt_t) * B_t * x_t
    y_t = C_t . h_t
is a first-order linear scan, so prefill uses ``jax.lax.associative_scan``
(the parallel-scan formulation from the Mamba paper's Annex D, which the
reference implements as a CUDA kernel) and decode is the closed-form single
step. Everything is plain jnp — XLA fuses the elementwise pipeline; the
contraction-heavy parts (in/out projections) go through the normal linear
kernels outside these functions.

Shapes (batch-major, unlike ggml's column-major views):
    x   [B, T, D]        D = d_inner
    dt  [B, T, D]        (pre-softplus, after ssm_dt projection + bias)
    A   [D, N]           N = d_state  (log-space negative decay)
    Bc  [B, T, N]
    Cc  [B, T, N]
    h0  [B, D, N]        carried recurrent state
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ssm_conv(
    x: jnp.ndarray,            # [B, T, D]
    conv_state: jnp.ndarray,   # [B, d_conv-1, D] trailing columns of history
    weight: jnp.ndarray,       # [d_conv, D] depthwise filter
    bias: jnp.ndarray,         # [D]
):
    """Depthwise causal 1-D conv over the token axis (ggml_ssm_conv analog).
    Returns (y [B, T, D], new_conv_state [B, d_conv-1, D])."""
    d_conv = weight.shape[0]
    b, t, d = x.shape
    ctx = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # [B, K-1+T, D]
    # self-overlapping window view: y_t = sum_k w[k] * ctx[t + k]
    y = jnp.zeros((b, t, d), jnp.float32)
    for k in range(d_conv):                       # d_conv is tiny (4): unroll
        y = y + ctx[:, k : k + t, :].astype(jnp.float32) * weight[k][None, None, :]
    y = y + bias[None, None, :]
    new_state = ctx[:, t:, :] if t >= 1 else conv_state
    # keep exactly the last d_conv-1 columns
    new_state = ctx[:, ctx.shape[1] - (d_conv - 1):, :]
    return y, new_state.astype(conv_state.dtype)


def ssm_scan(
    h0: jnp.ndarray,     # [B, D, N] f32
    x: jnp.ndarray,      # [B, T, D]
    dt: jnp.ndarray,     # [B, T, D] pre-softplus
    A: jnp.ndarray,      # [D, N]
    Bc: jnp.ndarray,     # [B, T, N]
    Cc: jnp.ndarray,     # [B, T, N]
):
    """Selective scan (ggml_ssm_scan analog, n_group=1 / head_dim=1 layout).
    Returns (y [B, T, D] f32, h_T [B, D, N] f32)."""
    dtp = jax.nn.softplus(dt.astype(jnp.float32))              # [B, T, D]
    decay = jnp.exp(dtp[..., None] * A[None, None])            # [B, T, D, N]
    drive = (dtp * x.astype(jnp.float32))[..., None] \
        * Bc.astype(jnp.float32)[:, :, None, :]                # [B, T, D, N]

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    a_cum, b_cum = jax.lax.associative_scan(combine, (decay, drive), axis=1)
    h = a_cum * h0[:, None] + b_cum                            # [B, T, D, N]
    y = jnp.einsum("btdn,btn->btd", h, Cc.astype(jnp.float32))
    return y, h[:, -1]


def ssm_step(
    h0: jnp.ndarray,     # [B, D, N]
    x: jnp.ndarray,      # [B, D]
    dt: jnp.ndarray,     # [B, D]
    A: jnp.ndarray,      # [D, N]
    Bc: jnp.ndarray,     # [B, N]
    Cc: jnp.ndarray,     # [B, N]
):
    """Single-token recurrence (decode path). Returns (y [B, D], h1)."""
    dtp = jax.nn.softplus(dt.astype(jnp.float32))
    decay = jnp.exp(dtp[..., None] * A[None])                  # [B, D, N]
    h1 = decay * h0 + (dtp * x.astype(jnp.float32))[..., None] \
        * Bc.astype(jnp.float32)[:, None, :]
    y = jnp.einsum("bdn,bn->bd", h1, Cc.astype(jnp.float32))
    return y, h1


def ssm_scan_ref(h0, x, dt, A, Bc, Cc):
    """Sequential oracle with identical semantics (the CPU ggml_ssm_scan)."""
    import numpy as np

    h = np.asarray(h0, np.float64)
    b, t, d = x.shape
    ys = []
    xf = np.asarray(x, np.float64)
    dtf = np.log1p(np.exp(np.asarray(dt, np.float64)))
    Af = np.asarray(A, np.float64)
    Bf = np.asarray(Bc, np.float64)
    Cf = np.asarray(Cc, np.float64)
    for i in range(t):
        decay = np.exp(dtf[:, i][..., None] * Af[None])
        h = decay * h + (dtf[:, i] * xf[:, i])[..., None] * Bf[:, i][:, None, :]
        ys.append(np.einsum("bdn,bn->bd", h, Cf[:, i]))
    return np.stack(ys, 1), h
