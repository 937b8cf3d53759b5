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
    data_fields=["qs", "eff", "gather", "bias", "i8p"],
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
    # optional int8-superblock PREFILL pack (round 5; ops/tcq4_matmul.py
    # pack_i8p): (qs_sbi u8 [K/2, N], f8 i8 [K/32, N], e2 f32 [K/256, N]).
    # ~2x the TCQ4 weight bytes when present; buys 1.06-1.24x prefill
    # GEMM (bench_prefill_int8.py). Disable with RRS_PREFILL_I8=0.
    i8p: Optional[tuple] = None

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
        # eff at bf16: group scales are 25% of the weight stream at f32
        # (4 B per 32 weights vs 0.5 B/weight); bf16 rounding (<=0.4%) is
        # far below the int4 quantization noise
        import os

        qs_dev = jnp.asarray(t.qs)
        eff_dev = jnp.asarray(effective_scales(t), jnp.bfloat16)
        i8p = None
        if os.environ.get("RRS_PREFILL_I8", "1") != "0":
            i8p = tuple(tcq4_mm.pack_i8p(qs_dev, eff_dev))
        return cls(
            qs=qs_dev,
            eff=eff_dev,
            gather=gather,
            bias=None if bias is None else jnp.asarray(bias),
            i8p=i8p,
        )


def _pad_n(a: np.ndarray, mult: int = 0) -> np.ndarray:
    """Pad axis 1 (N) to a tile-friendly multiple. Big-vocab N values are
    often 128*prime (e.g. 151936 = 128*1187), which would force tiny kernel
    tiles — those pad to 2048-multiples (<=2% waste at vocab scale). Small
    N pads only to the 128-lane tile: a fixed 2048 multiple would waste
    42% on a 2880-wide projection (gpt-oss) while bn=128 tiles cost these
    streaming-bound kernels almost nothing (PERF.md block-size sweep).
    Padded columns produce garbage outputs that the caller slices off."""
    n_pad = n_pad_width(a.shape[1], mult)
    if n_pad == a.shape[1]:
        return a
    return np.pad(a, ((0, 0), (0, n_pad - a.shape[1])))


def n_pad_width(n: int, mult: int = 0) -> int:
    """The padded-N policy of _pad_n as a pure width formula, shared with
    fabricated-weight builders so benchmarks measure real-load tiling."""
    if mult == 0:
        mult = 2048 if n > 8192 else 128
    return (n + mult - 1) // mult * mult


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scale", "bias"],
    meta_fields=["n_logical", "k_logical"],
)
@dataclasses.dataclass
class Q8Linear:
    """Q8_0 linear (output.weight policy, llama-quant.cpp:260-262).

    q int8 [Kpad, Npad] K-major; scale f32 [Kpad//32, Npad] = fp32 of the
    block fp16 d. N is padded to a tile multiple (n_logical = true width);
    K is padded to the kernel's 256-multiple with zero-scale rows when the
    model dim isn't 256-aligned (gpt-oss E=2880; k_logical = true depth —
    linear_apply zero-pads the activations to match).
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    bias: Optional[jnp.ndarray] = None
    n_logical: int = 0
    k_logical: int = 0

    @property
    def shape(self):
        return (self.k_logical or self.q.shape[0],
                self.n_logical or self.q.shape[1])

    @classmethod
    def from_q8_gguf(cls, raw: np.ndarray, shape, bias=None) -> "Q8Linear":
        """Build from a Q8_0 GGUF payload for a logical [N, K] weight."""
        from rrs_tpu.formats.kquants import q8_blocks

        n, k = shape
        q, d = q8_blocks(raw, shape)
        q_kn = q.T                                        # [K, N]
        kpad = -(-k // 256) * 256
        q_kn = np.pad(np.ascontiguousarray(q_kn), ((0, kpad - k), (0, 0)))
        d_kn = np.pad(np.ascontiguousarray(d.T),
                      ((0, kpad // 32 - k // 32), (0, 0)))
        return cls(
            q=jnp.asarray(_pad_n(q_kn)),
            scale=jnp.asarray(_pad_n(d_kn)),
            bias=None if bias is None else jnp.asarray(bias),
            n_logical=n,
            k_logical=k if kpad != k else 0,
        )

    @classmethod
    def quantize(cls, w: np.ndarray, bias=None) -> "Q8Linear":
        """Quantize an [N, K] f32 weight with quantize_row_q8_0 semantics."""
        from rrs_tpu.formats.kquants import quantize_q8_0

        raw = quantize_q8_0(np.asarray(w, np.float32))
        return cls.from_q8_gguf(raw, w.shape, bias=bias)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "scale", "bias"],
    meta_fields=["n_logical"],
)
@dataclasses.dataclass
class MXFP4Linear:
    """MXFP4 linear (gpt-oss native format): packed e2m1 nibbles + E8M0
    block scales stay in HBM; dequant happens in VMEM inside the matmul
    kernel (ops/mxfp4_matmul.py). qs uint8 [K//2, Npad] in the 64-superblock
    pair layout, scale uint8 [K//32, Npad] f32-exponent-field form (the
    kernels fold the power-of-two scale into the decoded bit pattern).
    Activations stay bf16: MXFP4 is a weights-only format (no RRS
    rotation/activation quant, unlike TCQ4)."""

    qs: jnp.ndarray
    scale: jnp.ndarray
    bias: Optional[jnp.ndarray] = None
    n_logical: int = 0

    @property
    def shape(self):
        return (self.qs.shape[0] * 2, self.n_logical or self.qs.shape[1])

    @classmethod
    def from_gguf(cls, raw: np.ndarray, shape, bias=None) -> "MXFP4Linear":
        from rrs_tpu.ops.mxfp4_matmul import pack_mxfp4_device

        qs, sexp = pack_mxfp4_device(raw, shape)
        return cls(
            qs=jnp.asarray(qs),
            scale=jnp.asarray(sexp),
            bias=None if bias is None else jnp.asarray(bias),
            n_logical=shape[0],
        )


def fuse_linears(layers: list) -> object:
    """Concatenate same-K linears along N (QKV / gate-up fusion): one kernel
    launch instead of three, wider N tiles. All inputs must share type and K.
    NOTE: fused layers cannot be column-sharded for TP (the N concatenation
    crosses shard boundaries) — fuse only on unsharded load paths."""
    first = layers[0]
    if isinstance(first, DenseLinear):
        w = jnp.concatenate([l.w for l in layers], axis=1)
        bias = None
        if any(l.bias is not None for l in layers):
            bias = jnp.concatenate([
                l.bias if l.bias is not None
                else jnp.zeros((l.shape[1],), w.dtype)
                for l in layers
            ])
        return DenseLinear(w=w, bias=bias)
    if isinstance(first, TCQ4Linear):
        gathers = [l.gather for l in layers]
        g0 = gathers[0]
        same = all(
            (g is None and g0 is None)
            or (g is not None and g0 is not None and bool(jnp.array_equal(g, g0)))
            for g in gathers
        )
        if not same:
            return None    # different perms -> can't share one rotation
        bias = None
        if any(l.bias is not None for l in layers):
            bias = jnp.concatenate([
                l.bias if l.bias is not None
                else jnp.zeros((l.shape[1],), jnp.float32)
                for l in layers
            ])
        return TCQ4Linear(
            qs=jnp.concatenate([l.qs for l in layers], axis=1),
            eff=jnp.concatenate([l.eff for l in layers], axis=1),
            gather=g0,
            bias=bias,
        )
    if isinstance(first, MXFP4Linear):
        # only fusable when no segment carries N padding (the pad columns
        # would land mid-concat and shift later segments' outputs)
        if any(l.n_logical and l.n_logical != l.qs.shape[1] for l in layers):
            return None
        bias = None
        if any(l.bias is not None for l in layers):
            bias = jnp.concatenate([
                l.bias if l.bias is not None
                else jnp.zeros((l.qs.shape[1],), jnp.float32)
                for l in layers
            ])
        return MXFP4Linear(
            qs=jnp.concatenate([l.qs for l in layers], axis=1),
            scale=jnp.concatenate([l.scale for l in layers], axis=1),
            bias=bias,
        )
    if isinstance(first, Q8Linear):
        if any(l.n_logical and l.n_logical != l.q.shape[1] for l in layers):
            return None
        bias = None
        if any(l.bias is not None for l in layers):
            bias = jnp.concatenate([
                l.bias if l.bias is not None
                else jnp.zeros((l.q.shape[1],), jnp.float32)
                for l in layers
            ])
        return Q8Linear(
            q=jnp.concatenate([l.q for l in layers], axis=1),
            scale=jnp.concatenate([l.scale for l in layers], axis=1),
            bias=bias,
            k_logical=first.k_logical,   # same K across fused segments
        )
    return None


def _hadamard_f32():
    # hadamard_matrix is lru_cached; jnp.asarray here is constant-folded by
    # jit (a fresh conversion per trace avoids leaking tracers via globals)
    return jnp.asarray(hadamard_matrix(RRS_BLOCK), dtype=jnp.float32)


def rotate_activations(x: jnp.ndarray, gather: Optional[jnp.ndarray],
                       precision=None) -> jnp.ndarray:
    """perm-gather + per-256-block FWHT via one MXU matmul (f32).

    Default precision is bf16x3 (jax "high"): the Hadamard entries are
    ±2^-4 so products round once at ~2^-8 relative — 1/20 of the int4
    activation-quantization step the result immediately feeds. HIGHEST
    (bf16x6) costs 6 MXU passes on every rotation in the decode loop; pass
    it explicitly where exactness matters (oracles/tests).
    """
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
        precision=precision or jax.lax.Precision.HIGH,
    )
    return rot.reshape(*lead, k)


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def dequantize_w_jnp(qs: jnp.ndarray, eff: jnp.ndarray) -> jnp.ndarray:
    """jnp weight dequant (differentiation/backward path; the kernel does
    the same in VMEM). [K//2,N] uint8 + [K//32,N] -> [K,N] f32."""
    k2, n = qs.shape
    nsb = k2 // 128
    q3 = qs.reshape(nsb, 128, n).astype(jnp.int32)
    lo = (q3 << 28) >> 28
    hi = (q3 << 24) >> 28
    w_q = jnp.concatenate([lo, hi], axis=1).reshape(2 * k2, n)
    return w_q.astype(jnp.float32) * jnp.repeat(eff, GROUP_SIZE_, axis=0)


GROUP_SIZE_ = 32


_HAD_NP = None


def _had_dev():
    # cache NUMPY (a device/tracer cached under a custom_vjp trace leaks);
    # jnp.asarray at use site folds to a jit constant
    global _HAD_NP
    if _HAD_NP is None:
        _HAD_NP = hadamard_matrix(RRS_BLOCK).astype(np.float32)
    return jnp.asarray(_HAD_NP)


def _gx3_on() -> bool:
    import os

    return os.environ.get("RRS_GX3", "0") != "0"


@jax.custom_vjp
def _tcq4_apply(x2: jnp.ndarray, qs: jnp.ndarray, eff: jnp.ndarray,
                i8p=None):
    """Full W4A4 pipeline (rotate -> quantize -> matmul) with a
    straight-through backward: the quantizers are treated as identity and
    dL/dx = rotate(g @ W_deq^T) (H is symmetric + self-inverse). Training
    through frozen quantized layers needs this; inference never calls the
    bwd.

    NOTE: tcq4_matmul_fused (rotation inside the kernel) measured 10x SLOWER
    end-to-end — interleaving a second MXU dot (the Hadamard) with the
    weight dot per superblock stalls the pipeline, same signature as the
    int8 group-dot kernel. XLA-side rotation + ONE dot per superblock wins.
    """
    if (_gx3_on() and not _auto_interpret()
            and tcq4_mm.gx_viable(x2.shape[0], x2.shape[1], qs.shape[1])):
        # gx3: rotation + quantization fused into the kernel prologue
        # (RRS_GX3 flag; exact vs rotate+gx2 at HIGHEST precision)
        return tcq4_mm.tcq4_matmul_gx3(x2.astype(jnp.float32), _had_dev(),
                                       qs, eff)
    rot = rotate_activations(x2, None)
    return _tcq4_matmul_route_rot(rot, qs, eff, i8p=i8p)


def _tcq4_matmul_route_rot(rot, qs, eff, i8p=None):
    """Decode-sized M takes the group-expanded int8 kernel WITH fused
    activation quantization in its prologue (tcq4_matmul_gx2, round 5 —
    the reference fuses absmax+quant into the GEMV the same way,
    tcq4_k32.cu:71-277; bit-exact vs quantize_activations_rrs + gx);
    larger M keeps the dequant+bf16-dot kernel whose MXU cost does not
    scale with the group count."""
    m, k = rot.shape
    if tcq4_mm.gx_viable(m, k, qs.shape[1]):
        return tcq4_mm.tcq4_matmul_gx2(rot, qs, eff,
                                       interpret=_auto_interpret())
    a_q, a_s = quantize_activations_rrs(rot)
    if i8p is not None and m >= 256 and not _auto_interpret():
        # prefill M: int8-superblock MXU kernel (1.06-1.24x the dequant
        # kernel at M in {512, 1024}; bench_prefill_int8.py round 5)
        return tcq4_mm.tcq4_matmul_i8p(
            tcq4_mm.prep_a_sbi(a_q), a_s, *i8p, bm=512)
    a = dequantize_activations_rrs(a_q, a_s)
    return tcq4_mm.tcq4_matmul(a, qs, eff, interpret=_auto_interpret())


def _tcq4_matmul_route(a_q, a_s, qs, eff):
    """Pre-quantized entry (kept for oracles/tests): same routing as
    _tcq4_matmul_route_rot."""
    m, k = a_q.shape
    if tcq4_mm.gx_viable(m, k, qs.shape[1]):
        return tcq4_mm.tcq4_matmul_gx(a_q, a_s, qs, eff,
                                      interpret=_auto_interpret())
    a = dequantize_activations_rrs(a_q, a_s)
    return tcq4_mm.tcq4_matmul(a, qs, eff, interpret=_auto_interpret())


def _tcq4_apply_fwd(x2, qs, eff, i8p=None):
    # dtype token: residuals must be jax types, so carry an empty array
    return _tcq4_apply(x2, qs, eff, i8p), (qs, eff,
                                           jnp.zeros((0,), x2.dtype))


def _tcq4_apply_bwd(res, g):
    qs, eff, dtype_token = res
    x_dtype = dtype_token.dtype
    w = dequantize_w_jnp(qs, eff)                       # [K, N]
    gr = jnp.dot(g.astype(jnp.float32), w.T)            # rotated-domain grad
    gx = rotate_activations(gr, None)                   # H^T = H, H H = I
    return gx.astype(x_dtype), None, None, None


_tcq4_apply.defvjp(_tcq4_apply_fwd, _tcq4_apply_bwd)


def linear_apply(layer, x: jnp.ndarray, reduce_axis=None) -> jnp.ndarray:
    """y = x @ W^T (+ bias). x: [..., K] -> [..., N].

    ``reduce_axis``: mesh axis to psum partial products over (row-parallel
    TP). The reduction happens in f32 BEFORE the output cast so sharded and
    single-device execution round identically.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    lora = None
    if type(layer).__name__ == "LoraLinear":
        lora = layer
        layer = layer.base
    if isinstance(layer, DenseLinear):
        y = jnp.dot(x2, layer.w, preferred_element_type=jnp.float32)
    elif isinstance(layer, Q8Linear):
        from rrs_tpu.ops import q8_matmul as q8_mm

        if layer.k_logical and layer.q.shape[0] != x2.shape[-1]:
            # K padded to the kernel's 256-multiple (zero-scale rows):
            # zero-pad the activations to match
            x2 = jnp.pad(x2, ((0, 0), (0, layer.q.shape[0] - x2.shape[-1])))
        if _auto_interpret():
            y = q8_mm.q8_matmul_ref(x2, layer.q, layer.scale)
        else:
            y = q8_mm.q8_matmul(x2, layer.q, layer.scale)
        if layer.n_logical and layer.n_logical != y.shape[-1]:
            y = y[:, : layer.n_logical]
    elif isinstance(layer, MXFP4Linear):
        from rrs_tpu.ops import mxfp4_matmul as mx_mm

        if _auto_interpret():
            y = mx_mm.mxfp4_matmul_ref(x2, layer.qs, layer.scale)
        else:
            y = mx_mm.mxfp4_matmul(x2, layer.qs, layer.scale)
        if layer.n_logical and layer.n_logical != y.shape[-1]:
            y = y[:, : layer.n_logical]
    elif isinstance(layer, TCQ4Linear):
        if layer.gather is None:
            y = _tcq4_apply(x2, layer.qs, layer.eff,
                            layer.i8p)                 # differentiable (STE)
        else:
            rot = rotate_activations(x2, layer.gather)
            y = _tcq4_matmul_route_rot(rot, layer.qs, layer.eff,
                                       i8p=layer.i8p)
    else:
        raise TypeError(f"unknown linear layer {type(layer)}")
    if lora is not None:
        from rrs_tpu.models.adapter import apply_lora_delta

        y = apply_lora_delta(lora, x2, y)
    if reduce_axis is not None:
        y = jax.lax.psum(y.astype(jnp.float32), reduce_axis)
    if layer.bias is not None:
        y = y + layer.bias.astype(y.dtype)
    y = y.astype(x.dtype if x.dtype != jnp.float32 else jnp.float32)
    return y.reshape(*lead, y.shape[-1])
