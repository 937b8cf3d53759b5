"""TCQ4_K32 — the W4A4 (4-bit weight / 4-bit activation) RRS quantization format.

Reimplements the *semantics* of the reference's TCQ4 tile format with a
TPU-native physical layout. Reference semantics (studied, not ported):

  * Tile  = 8 output channels x 256 K  (ggml/src/ggml-common.h:308-348).
  * Weights are quantized in the FWHT-rotated domain: per 8-row group the
    quantizer applies a normalized 256-point FWHT per K-chunk, then per
    channel c and per 32-wide group g computes
        scale[c,g] = absmax/7            (floor: <1e-10 -> 1.0)
        q          = clamp(roundf(w/scale), -8, 7)        # round half away
        S[c]       = max_g scale[c,g]    (0 -> 1.0), stored fp16
        sc[c,g]    = clamp(roundf(scale/S_f32 * 127), -127, 127)  int8
        Z = 0, zc = 0 (symmetric)
    (ggml/src/ggml-quants.c:1530-1640)
  * Dequant: w = (fp16(S) * sc / 127) * q + (Z * zc / 127)
    (ggml/src/ggml-common.h:315, dequantize_row_tcq4_tile ggml-quants.c:1425).
  * Activations at runtime: optional channel-perm gather, normalized FWHT per
    256-block, per-block a_scale = max|x| (floor 1e-10 -> 1.0),
    q_a = clamp(rintf(x * 7 / a_scale), -7, 7)   # round half to even
    dequant a = q_a * a_scale / 7
    (tcq4_rrs_fused_activation_kernel, ggml/src/ggml-cuda/tcq4_k32.cu:71-277).
  * GEMM epilogue: C += dot * (a_scale/7) * (S*sc/127) + sum_a * (a_scale/7) * (Z*zc/127)
    (tcq4_k32.cu:11).
  * Constraints K % 256 == 0 and N % 8 == 0, else fall back to Q4_K
    (src/llama-quant.cpp:473-496). Effective 4.625 bits/weight.

TPU-native physical layout (replaces the IMMA m16n8k32 fragment packing of
tcq4_pack_imma_tile, ggml-quants.c:1362-1420, which encodes CUDA warp-lane
ownership and is meaningless on TPU): weights live K-major so they can feed
the MXU as the B operand directly,

    qs : uint8 [K//2, N]   two nibbles per byte, packed per 256-superblock:
                           byte (kb*128 + j, n) holds q[kb*256 + j]      (low)
                           and                   q[kb*256 + 128 + j]     (high)
                           so a superblock unpacks into two contiguous
                           [128, N] int8 slabs — no sublane interleave.
    sc : int8  [K//32, N]  per-group scale codes
    S  : fp16  [K//256, N] per-channel-per-superblock super-scales
    (Z/zc omitted when symmetric — the reference always writes zeros)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from rrs_tpu.formats.fwht import RRS_BLOCK, fwht_np

TILE_K = 256          # K per superblock
TILE_CHANNELS = 8     # rows quantized together (row-group granularity)
GROUP_SIZE = 32       # elements per scale group
GROUPS_PER_TILE = TILE_K // GROUP_SIZE
SCALE_EPS = 1e-10


def round_half_away(x: np.ndarray) -> np.ndarray:
    """C roundf(): round half away from zero (numpy rounds half to even)."""
    return np.trunc(x + np.copysign(0.5, x))


@dataclasses.dataclass
class TCQ4Tensor:
    """A TCQ4-quantized 2-D weight, K-major device layout (see module docstring).

    Logical weight is [N, K] (N output channels); arrays are stored so that the
    dequantized matmul operand is [K, N].
    """

    qs: np.ndarray          # uint8 [K//2, N]
    sc: np.ndarray          # int8  [K//32, N]
    S: np.ndarray           # fp16  [K//256, N]
    perm: Optional[np.ndarray] = None   # int32 [K], block-local channel perm
    zc: Optional[np.ndarray] = None     # int8  [K//32, N] (zero codes; rarely used)
    Z: Optional[np.ndarray] = None      # fp16  [K//256, N]

    @property
    def K(self) -> int:
        return self.qs.shape[0] * 2

    @property
    def N(self) -> int:
        return self.qs.shape[1]

    @property
    def nbytes(self) -> int:
        n = self.qs.nbytes + self.sc.nbytes + self.S.nbytes
        if self.zc is not None:
            n += self.zc.nbytes + self.Z.nbytes
        return n


def effective_scales(t: "TCQ4Tensor") -> np.ndarray:
    """f32 [K//32, N] per-group effective scale fp32(fp16(S))*sc/127 — exactly
    the value the reference dequant derives per group (ggml-common.h:315)."""
    S_rep = np.repeat(t.S.astype(np.float32), GROUPS_PER_TILE, axis=0)
    return S_rep * t.sc.astype(np.float32) / 127.0


def pack_nibbles(q: np.ndarray) -> np.ndarray:
    """Pack int4 values q [K, N] (in [-8, 7]) into uint8 [K//2, N] per-superblock.

    Within each 256-superblock, row j of the packed block holds k-offset j in
    the low nibble and k-offset j+128 in the high nibble.
    """
    k, n = q.shape
    assert k % TILE_K == 0
    u = (q.astype(np.int16) & 0xF).astype(np.uint8)
    u = u.reshape(k // TILE_K, 2, TILE_K // 2, n)
    return (u[:, 0] | (u[:, 1] << 4)).reshape(k // 2, n)


def unpack_nibbles(qs: np.ndarray) -> np.ndarray:
    """Inverse of pack_nibbles: uint8 [K//2, N] -> int8 [K, N] in [-8, 7]."""
    kh, n = qs.shape
    k = kh * 2
    assert k % TILE_K == 0
    b = qs.reshape(k // TILE_K, TILE_K // 2, n)
    lo = (b & 0xF).astype(np.int8)
    hi = (b >> 4).astype(np.int8)
    out = np.stack([lo, hi], axis=1).reshape(k // TILE_K, TILE_K, n)
    out = np.where(out >= 8, out - 16, out)
    return out.reshape(k, n).astype(np.int8)


def _tcq4_search_encode(g: np.ndarray, scales0: np.ndarray):
    """Least-squares scale search per 32-group (make_qx_quants-style,
    ggml-quants.c:705-776, applied to TCQ4's rotated groups — an ENCODER
    improvement only: the emitted bytes stay reference-decodable). For
    each trial scale, quantize, refit the scale in closed form
    (s* = <x,q>/<q,q>), and keep the minimum-MSE assignment. The FWHT is
    orthogonal, so minimizing L2 here minimizes true weight-space L2.
    Returns (q [..,8,32] i8, sc [..,8] i8, S [..] f32) with the tile's
    int8-sc/f16-S coupling already applied, plus the end-to-end tile
    error for best-of selection against the reference RTN formula."""
    absmax = np.abs(g).max(axis=-1)
    best_err = None
    best_q = None
    best_s = None
    for d in np.linspace(-1.0, 1.0, 21):
        s_t = absmax / (7.0 + d)
        s_t = np.where(s_t < SCALE_EPS, 1.0, s_t)
        q_t = np.clip(round_half_away(g / s_t[..., None]), -8, 7)
        num = (g * q_t).sum(axis=-1)
        den = (q_t * q_t).sum(axis=-1)
        s_star = np.where(den > 0, num / np.maximum(den, 1e-12), scales0)
        s_star = np.where(s_star > SCALE_EPS, s_star, scales0)
        err = ((g - s_star[..., None] * q_t) ** 2).sum(axis=-1)
        if best_err is None:
            best_err, best_q, best_s = err, q_t, s_star
        else:
            take = err < best_err
            best_err = np.where(take, err, best_err)
            best_q = np.where(take[..., None], q_t, best_q)
            best_s = np.where(take, s_star, best_s)
    # tile coupling: S = max group scale (f16), sc = int8 ratio; then
    # requantize against the REPRESENTABLE effective scale
    S = best_s.max(axis=-1)
    S = np.where(S > 0.0, S, 1.0).astype(np.float32)
    S = S.astype(np.float16).astype(np.float32)       # f16 storage rounding
    sc = np.clip(round_half_away(best_s / S[..., None] * 127.0), -127, 127)
    sc = np.where((sc == 0) & (absmax > 0), 1.0, sc).astype(np.int8)
    eff = S[..., None] * sc.astype(np.float32) / 127.0
    safe = np.where(np.abs(eff) < SCALE_EPS, 1.0, eff)
    q = np.clip(round_half_away(g / safe[..., None]), -8, 7).astype(np.int8)
    err = ((g - eff[..., None] * q) ** 2).sum(axis=(-1, -2))
    return q, sc, S, err


def quantize_tcq4(
    w: np.ndarray,
    perm: Optional[np.ndarray] = None,
    imatrix: Optional[np.ndarray] = None,
    use_native: bool = True,
    search: bool = False,
) -> TCQ4Tensor:
    """Quantize a weight [N, K] to TCQ4 (host-side).

    ``perm`` (int [K], block-local) is applied to the K axis BEFORE rotation,
    matching apply_channel_perm_to_weights (src/llama-quant.cpp:26-37).
    ``imatrix`` is accepted for API parity but ignored by the tile quantizer,
    exactly like the reference (ggml-quants.c:1533 GGML_UNUSED(quant_weights));
    the imatrix influences only the derivation of ``perm``.

    ``search`` enables the least-squares scale-search encoder
    (_tcq4_search_encode) and keeps whichever of {search, reference RTN
    formula} has the lower end-to-end error per tile — output bytes stay
    bit-compatible with the reference decoder either way (measured on the
    trained-model PPL pipeline: 30% lower quantization dNLL, 0.0158
    vs 0.0227 nats/byte).

    When the native lib is available the C++ path is used (f32 FWHT — the
    same precision as the reference's ggml_fwht_impl; the NumPy fallback
    computes the FWHT in f64).
    """
    del imatrix
    w = np.asarray(w, dtype=np.float32)
    if use_native and not search and w.shape[0] % TILE_CHANNELS == 0:
        from rrs_tpu import native

        if native.available():
            wp = w if perm is None else w[:, np.asarray(perm, np.int64)]
            qs, sc, S = native.tcq4_quantize(wp)
            return TCQ4Tensor(
                qs=qs, sc=sc, S=S,
                perm=None if perm is None else np.asarray(perm, np.int32),
            )
    n_rows, k = w.shape
    if k % TILE_K:
        raise ValueError(f"TCQ4 requires K % 256 == 0, got K={k}")
    if n_rows % TILE_CHANNELS:
        # Reference zero-pads partial 8-row groups (ggml-quants.c:1558-1568);
        # we do the same and drop the padding on dequant via the stored N.
        pad = TILE_CHANNELS - n_rows % TILE_CHANNELS
        w = np.concatenate([w, np.zeros((pad, k), np.float32)], axis=0)

    if perm is not None:
        perm = np.asarray(perm, dtype=np.int32)
        w = w[:, perm]

    # Rotate: normalized FWHT per 256-chunk of K (computed in f64, cast f32).
    rot = fwht_np(w.reshape(w.shape[0], k // TILE_K, TILE_K), axis=-1)
    rot = rot.astype(np.float32)                     # [Npad, KB, 256]

    g = rot.reshape(w.shape[0], k // TILE_K, GROUPS_PER_TILE, GROUP_SIZE)
    absmax = np.abs(g).max(axis=-1)                   # [Npad, KB, 8]
    scales = absmax / 7.0
    scales = np.where(scales < SCALE_EPS, 1.0, scales).astype(np.float32)

    S_f = scales.max(axis=-1)                         # [Npad, KB]
    S_f = np.where(S_f > 0.0, S_f, 1.0).astype(np.float32)
    sc_f = scales / S_f[..., None] * 127.0
    sc = np.clip(round_half_away(sc_f), -127, 127).astype(np.int8)

    q = round_half_away(g / scales[..., None])
    q = np.clip(q, -8, 7).astype(np.int8)             # [Npad, KB, 8, 32]

    if search:
        qs2, sc2, S2, err2 = _tcq4_search_encode(g, scales)
        eff_b = (S_f.astype(np.float16).astype(np.float32)[..., None]
                 * sc.astype(np.float32) / 127.0)
        err_b = ((g - eff_b[..., None] * q.astype(np.float32)) ** 2
                 ).sum(axis=(-1, -2))
        take = err2 < err_b                           # [Npad, KB] per tile
        q = np.where(take[..., None, None], qs2, q)
        sc = np.where(take[..., None], sc2, sc)
        S_f = np.where(take, S2, S_f).astype(np.float32)

    # To device layout: [K, N] major.
    n_pad = w.shape[0]
    q_kn = q.reshape(n_pad, k).T                      # [K, Npad]
    sc_kn = np.ascontiguousarray(sc.reshape(n_pad, k // GROUP_SIZE).T)
    S_kn = np.ascontiguousarray(S_f.reshape(n_pad, k // TILE_K).T)

    del n_pad
    return TCQ4Tensor(
        qs=np.ascontiguousarray(pack_nibbles(q_kn)[:, :n_rows]),
        sc=np.ascontiguousarray(sc_kn[:, :n_rows]),
        S=np.ascontiguousarray(S_kn[:, :n_rows]).astype(np.float16),
        perm=perm,
    )


def dequantize_tcq4(t: TCQ4Tensor, rotated: bool = True) -> np.ndarray:
    """Dequantize to f32 [K, N].

    With ``rotated=True`` (default) the result stays in the FWHT domain — the
    domain in which the runtime matmul consumes it. ``rotated=False``
    additionally applies the inverse FWHT (self-inverse) and un-permutes,
    recovering the original-domain weight (the GET_ROWS / embedding path,
    reference F13: ggml-cpu/ops.cpp:4800-4824).
    """
    q = unpack_nibbles(t.qs).astype(np.float32)                    # [K, N]
    k, n = q.shape
    sc = t.sc.astype(np.float32).reshape(k // GROUP_SIZE, 1, n)
    S = np.repeat(t.S.astype(np.float32), GROUPS_PER_TILE, axis=0).reshape(k // GROUP_SIZE, 1, n)
    w = q.reshape(k // GROUP_SIZE, GROUP_SIZE, n) * (S * sc / 127.0)
    if t.zc is not None:
        zc = t.zc.astype(np.float32).reshape(k // GROUP_SIZE, 1, n)
        Z = np.repeat(t.Z.astype(np.float32), GROUPS_PER_TILE, axis=0).reshape(k // GROUP_SIZE, 1, n)
        w = w + Z * zc / 127.0
    w = w.reshape(k, n)
    if not rotated:
        w = fwht_np(w.reshape(k // TILE_K, TILE_K, n), axis=1).astype(np.float32).reshape(k, n)
        if t.perm is not None:
            inv = np.empty_like(t.perm)
            inv[t.perm] = np.arange(k, dtype=t.perm.dtype)
            w = w[inv, :]
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# Runtime activation quantization (jnp; the XLA-fused analog of
# tcq4_rrs_fused_activation_kernel). The Pallas fused matmul ingests these.
# ---------------------------------------------------------------------------

def quantize_activations_rrs(x_rot: jnp.ndarray):
    """Quantize already-rotated activations [..., K] to int4-in-int8 + scales.

    Returns (q [..., K] int8 in [-7, 7], a_scale [..., K//256] f32).
    Rotation (perm gather + block FWHT) is a separate matmul — see
    rrs_tpu.formats.fwht.block_rotate — so XLA can fuse it with the producer.
    """
    k = x_rot.shape[-1]
    assert k % TILE_K == 0, k
    lead = x_rot.shape[:-1]
    xb = x_rot.reshape(*lead, k // TILE_K, TILE_K).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    amax = jnp.where(amax < SCALE_EPS, 1.0, amax)
    q = jnp.rint(xb * (7.0 / amax)[..., None])
    q = jnp.clip(q, -7, 7).astype(jnp.int8)
    return q.reshape(*lead, k), amax


def dequantize_activations_rrs(q: jnp.ndarray, a_scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quantize_activations_rrs (rotated domain): a = q * scale / 7."""
    k = q.shape[-1]
    lead = q.shape[:-1]
    qb = q.reshape(*lead, k // TILE_K, TILE_K).astype(jnp.float32)
    return (qb * (a_scale / 7.0)[..., None]).reshape(*lead, k)
