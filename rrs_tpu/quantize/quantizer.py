"""Model quantizer: GGUF -> TCQ4_K32 GGUF (tools/quantize + llama-quant.cpp analog).

Type policy mirrors llama_tensor_get_type for the TCQ4 ftype
(src/llama-quant.cpp:265-530):
  * token_embd.weight -> Q4_K in the reference; we store Q8_0 (the loader
    keeps Q8_0 tables PACKED on device and dequantizes looked-up rows —
    models/llama.py::embed_rows) — output.weight -> Q8_0 (reference :260-262)
  * 1-D tensors (norms, biases) -> F32
  * 2-D matmul weights with K % 256 == 0 and N % 8 == 0 -> TCQ4_K32,
    else fallback (reference falls to Q4_K; we use Q8_0 for the same reason)
  * channel perms derived from imatrix applied pre-quant and stored as
    ``tcq4.{name}.perm`` int32 arrays + ``tcq4.reorder.enabled``
    (llama-quant.cpp:840-855)
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from rrs_tpu.formats import kquants
from rrs_tpu.formats.tcq4 import quantize_tcq4
from rrs_tpu.formats.tile_codec import encode_tcq4_gguf
from rrs_tpu.gguf.constants import (
    GGMLType,
    KEY_TCQ4_REORDER_ENABLED,
    tcq4_perm_key,
)
from rrs_tpu.gguf.reader import read_gguf
from rrs_tpu.gguf.writer import GGUFWriter


def _is_tcq4_eligible(name: str, shape) -> bool:
    if len(shape) != 2:
        return False
    n, k = shape
    if k % 256 or n % 8:
        return False
    if name in ("token_embd.weight", "output.weight", "per_layer_token_embd.weight"):
        return False
    return name.endswith(".weight") and "norm" not in name


def _is_tcq4_exps_eligible(name: str, shape) -> bool:
    """Stacked MoE expert tensors ([E, N, K], llama.cpp *_exps layout):
    eligible when each expert slice is — both matmul dims must also be
    FWHT-rotatable (% 256) since MoE runs W4A4 on both projections."""
    if len(shape) != 3 or "_exps." not in name:
        return False
    _, n, k = shape
    return (k % 256 == 0 and n % 256 == 0
            and name.endswith(".weight") and "norm" not in name)


# non-TCQ4 output types (the llama-quantize ftype menu analog; reference
# tools/quantize/quantize.cpp type table). Each entry: (GGMLType for
# eligible 2D/3D weights, block width the last dim must divide,
# quantize fn name in formats.kquants, general.file_type code).
_OUT_TYPES = {
    "q4_k": (GGMLType.Q4_K, 256, "quantize_q4_k", 15),   # MOSTLY_Q4_K_M
    "q8_0": (GGMLType.Q8_0, 32, "quantize_q8_0", 7),
    "mxfp4": (GGMLType.MXFP4, 32, "quantize_mxfp4", 38),
    "f16": (GGMLType.F16, 1, None, 1),
}


def quantize_model(
    src_path: str | Path,
    dst_path: str | Path,
    perms: Optional[dict[str, np.ndarray]] = None,
    verbose: bool = True,
    out_type: str = "tcq4",
) -> dict:
    """Quantize every eligible tensor to ``out_type`` (default TCQ4_K32);
    returns a summary dict. Non-default quantized types follow the same
    tensor policy: 2D/3D .weight tensors get the target type (falling
    back to Q8_0 then F32 on block-width mismatch), token_embd/output
    stay Q8_0, norms/1D stay F32. ``f16`` converts every eligible weight
    (embed/head included — the reference's F16 ftype is a full-precision
    interchange format, not a quantization policy)."""
    if out_type != "tcq4":
        return _quantize_model_simple(src_path, dst_path, out_type, verbose)
    g = read_gguf(src_path)
    w = GGUFWriter(dst_path)

    for key, value in g.metadata.items():
        if key == "general.file_type":
            continue
        # preserve original value types for llama.cpp interop
        w.add_kv(key, value, vtype=g.metadata_types.get(key))
    w.add_uint32("general.file_type", 40)  # GGML_FTYPE_MOSTLY_TCQ4_K32 (ggml.h:478)

    if perms:
        w.add_bool(KEY_TCQ4_REORDER_ENABLED, True)
        for name, perm in perms.items():
            w.add_array(tcq4_perm_key(name), np.asarray(perm, np.int32))

    stats = {"tcq4": 0, "q8_0": 0, "f32": 0, "kept": 0, "bytes_in": 0, "bytes_out": 0}
    for name, info in g.tensors.items():
        stats["bytes_in"] += info.nbytes
        if _is_tcq4_eligible(name, info.shape):
            f32 = g.tensor(name).astype(np.float32)
            perm = perms.get(name) if perms else None
            t = quantize_tcq4(f32, perm=perm)
            payload = encode_tcq4_gguf(t)
            w.add_tensor(name, payload, shape=info.shape, ggml_type=GGMLType.TCQ4_K32)
            stats["tcq4"] += 1
            stats["bytes_out"] += len(payload)
            if verbose:
                bpw = len(payload) * 8 / f32.size
                print(f"  {name}: {info.shape} {info.ggml_type.name} -> TCQ4_K32 ({bpw:.3f} bpw)")
        elif _is_tcq4_exps_eligible(name, info.shape):
            # per-expert TCQ4 payloads, concatenated in expert order (the
            # mul_mat_id weights; llama-quant.cpp quantizes *_exps per type
            # policy the same way)
            f32 = g.tensor(name).astype(np.float32)
            payload = b"".join(
                bytes(encode_tcq4_gguf(quantize_tcq4(f32[ei])))
                for ei in range(info.shape[0]))
            w.add_tensor(name, np.frombuffer(payload, np.uint8),
                         shape=info.shape, ggml_type=GGMLType.TCQ4_K32)
            stats["tcq4"] += 1
            stats["bytes_out"] += len(payload)
            if verbose:
                bpw = len(payload) * 8 / f32.size
                print(f"  {name}: {info.shape} {info.ggml_type.name} -> TCQ4_K32 x{info.shape[0]} experts ({bpw:.3f} bpw)")
        elif len(info.shape) == 2 and info.shape[-1] % 32 == 0:
            f32 = g.tensor(name).astype(np.float32)
            payload = kquants.quantize_q8_0(f32).tobytes()
            w.add_tensor(name, payload, shape=info.shape, ggml_type=GGMLType.Q8_0)
            stats["q8_0"] += 1
            stats["bytes_out"] += len(payload)
        else:
            f32 = g.tensor(name).astype(np.float32)
            w.add_tensor(name, f32, shape=info.shape, ggml_type=GGMLType.F32)
            stats["f32"] += 1
            stats["bytes_out"] += f32.nbytes
    g.close()
    w.write()
    return stats


def _quantize_model_simple(src_path, dst_path, out_type: str,
                           verbose: bool) -> dict:
    """Non-TCQ4 requantization (``--type q4_k|q8_0|mxfp4|f16``)."""
    gt, blk, fn_name, ftype = _OUT_TYPES[out_type]
    qfn = getattr(kquants, fn_name) if fn_name else None
    g = read_gguf(src_path)
    w = GGUFWriter(dst_path)
    for key, value in g.metadata.items():
        if key == "general.file_type":
            continue
        w.add_kv(key, value, vtype=g.metadata_types.get(key))
    w.add_uint32("general.file_type", ftype)

    # "converted" = tensors that got the target type; "q8_0_fallback" =
    # embed/head + block-width fallbacks (distinct keys: --type q8_0 would
    # otherwise conflate them)
    stats = {"type": out_type, "converted": 0, "q8_0_fallback": 0,
             "f32": 0, "bytes_in": 0, "bytes_out": 0}
    for name, info in g.tensors.items():
        stats["bytes_in"] += info.nbytes
        eligible = (len(info.shape) in (2, 3) and name.endswith(".weight")
                    and "norm" not in name and info.shape[-1] % blk == 0)
        f32 = g.tensor(name).astype(np.float32)
        if eligible and out_type == "f16":
            w.add_tensor(name, f32.astype(np.float16), shape=info.shape,
                         ggml_type=GGMLType.F16)
            stats["converted"] += 1
            stats["bytes_out"] += f32.size * 2
        elif eligible and name not in ("token_embd.weight",
                                       "output.weight"):
            # embed/head stay Q8_0 below (the reference keeps them at
            # higher precision than the body, llama-quant.cpp:260-285;
            # also: a vocab-padded MXFP4 head could not be column-sharded)
            # row codecs never cross rows, so 3D expert stacks quantize as
            # flattened [E*N, K]
            payload = qfn(f32.reshape(-1, info.shape[-1])).tobytes()
            w.add_tensor(name, np.frombuffer(payload, np.uint8),
                         shape=info.shape, ggml_type=gt)
            stats["converted"] += 1
            stats["bytes_out"] += len(payload)
            if verbose:
                print(f"  {name}: {info.shape} {info.ggml_type.name} -> "
                      f"{gt.name} ({len(payload) * 8 / f32.size:.3f} bpw)")
        elif len(info.shape) == 2 and info.shape[-1] % 32 == 0:
            # embed/head under q4_k (reference keeps them higher-precision:
            # llama-quant.cpp:260-285 — we use Q8_0), plus block-width
            # fallbacks
            payload = kquants.quantize_q8_0(f32).tobytes()
            w.add_tensor(name, payload, shape=info.shape,
                         ggml_type=GGMLType.Q8_0)
            stats["q8_0_fallback"] += 1
            stats["bytes_out"] += len(payload)
        else:
            w.add_tensor(name, f32, shape=info.shape,
                         ggml_type=GGMLType.F32)
            stats["f32"] += 1
            stats["bytes_out"] += f32.nbytes
    g.close()
    w.write()
    return stats
