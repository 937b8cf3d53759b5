"""RWKV6 linear-attention ops — GGML_OP_RWKV_WKV6 analog
(ggml/src/ggml-cpu/ops.cpp:9475-9669).

Per head with state S[i, j] (i = key dim, j = value dim):
    out[t, j] = sum_i r[t,i] * (S[i,j] + tf[i] * k[t,i] * v[t,j])
    S[i, j]  <- td[t,i] * S[i,j] + k[t,i] * v[t,j]
where td is already exp(-exp(w)) (computed in the graph builder).

The recurrence is not associative-scannable in this form (the tf bonus reads
the pre-update state), so prefill runs a lax.scan over T — chunked prefill
keeps T small; decode is the closed-form single step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wkv6(
    k: jnp.ndarray,      # [B, T, H, D]
    v: jnp.ndarray,      # [B, T, H, D]
    r: jnp.ndarray,      # [B, T, H, D]
    tf: jnp.ndarray,     # [H, D]   time_mix_first ("u"/faaaa bonus)
    td: jnp.ndarray,     # [B, T, H, D] per-token decay exp(-exp(w))
    state: jnp.ndarray,  # [B, H, D, D] f32
):
    """Returns (out [B, T, H, D] f32, new_state [B, H, D, D] f32)."""
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    tdf = td.astype(jnp.float32)
    tff = tf.astype(jnp.float32)

    def step(S, inp):
        k_t, v_t, r_t, td_t = inp                        # [B, H, D]
        kv = k_t[..., :, None] * v_t[..., None, :]       # [B, H, D, D]
        bonus = tff[None, :, :, None] * kv
        out = jnp.einsum("bhi,bhij->bhj", r_t, S + bonus)
        S = td_t[..., :, None] * S + kv
        return S, out

    xs = (kf.transpose(1, 0, 2, 3), vf.transpose(1, 0, 2, 3),
          rf.transpose(1, 0, 2, 3), tdf.transpose(1, 0, 2, 3))
    new_state, outs = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return outs.transpose(1, 0, 2, 3), new_state


def wkv6_ref(k, v, r, tf, td, state):
    """NumPy sequential oracle (the CPU ggml_rwkv_wkv6 loop)."""
    import numpy as np

    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    r = np.asarray(r, np.float64)
    tf = np.asarray(tf, np.float64)
    td = np.asarray(td, np.float64)
    S = np.asarray(state, np.float64).copy()
    b, t, h, d = k.shape
    out = np.zeros((b, t, h, d))
    for bb in range(b):
        for tt in range(t):
            for hh in range(h):
                for i in range(d):
                    kv = k[bb, tt, hh, i] * v[bb, tt, hh]        # [D_j]
                    temp = S[bb, hh, i] + tf[hh, i] * kv
                    out[bb, tt, hh] += r[bb, tt, hh, i] * temp
                    S[bb, hh, i] = td[bb, tt, hh, i] * S[bb, hh, i] + kv
    return out, S
