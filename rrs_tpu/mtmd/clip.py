"""Vision encoder + multimodal projector (tools/mtmd clip.cpp analog).

CLIP/SigLIP-style ViT: patch embedding (expressed as one matmul over
flattened patches — the TPU-native form of the conv2d stem), learned
position embeddings, pre-LN transformer blocks (GELU MLP), then an
LLaVA-style 2-layer MLP projector (``mm.0`` / ``mm.2``) mapping patch
features into the language model's embedding space, OR the gemma3
projector (models/siglip.cpp PROJECTOR_TYPE_GEMMA3: avg-pool the patch
grid by n_merge per side, RMSNorm with mm.soft_emb_norm, project with
mm.input_projection). The resulting [n_tokens, n_embd_llm] chunk is
injected into decode as raw input embeddings (the llama_batch.embd
path, tools/mtmd/mtmd.h:110-210).

GGUF layout follows clip-impl.h conventions: KVs ``clip.vision.*``,
tensors ``v.patch_embd.weight``, ``v.position_embd.weight``,
``v.blk.{i}.{attn_q,attn_k,attn_v,attn_out,ln1,ln2,ffn_up,ffn_down}``,
``v.pre_ln`` / ``v.post_ln``, ``mm.{0,2}.{weight,bias}``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    image_size: int = 224
    patch_size: int = 14
    n_embd: int = 1024
    n_layers: int = 12
    n_heads: int = 16
    n_ff: int = 4096
    n_embd_llm: int = 2048
    eps: float = 1e-5
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    use_gelu: bool = True            # quick-gelu vs gelu: use tanh approx
    projector_type: str = "mlp"      # "mlp" | "gemma3" | "qwen2vl_merger"
    n_merge: int = 4                 # gemma3: patches-per-side pool factor
    # qwen2vl (clip.cpp PROJECTOR_TYPE_QWEN2VL / models/qwen2vl.cpp)
    spatial_merge: int = 2           # merger pools 2x2 patch blocks
    temporal_patch: int = 2          # conv3d temporal depth (image = 2 frames)
    ffn_act: str = "gelu"            # "gelu" | "quick_gelu" | "silu_gated"
    rope_theta: float = 10000.0      # 2D vision rotary base
    # qwen2.5vl (clip-impl.h:219 PROJECTOR_TYPE_QWEN25VL): window
    # attention everywhere except every n_wa_pattern-th layer
    n_wa_pattern: int = 0            # 0 = full attention (qwen2vl)
    attn_window_size: int = 112      # pixels (clip.cpp:3518 default)
    # minicpmv (clip-impl.h:210 PROJECTOR_TYPE_MINICPMV "resampler")
    query_num: int = 64              # learned resampler queries

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_output_tokens(self) -> int:
        if self.projector_type == "gemma3":
            return (self.image_size // self.patch_size // self.n_merge) ** 2
        if self.projector_type == "qwen2vl_merger":
            return self.n_patches // self.spatial_merge ** 2
        return self.n_patches

    @staticmethod
    def from_gguf(md: dict) -> "ClipConfig":
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        mean = g("image_mean")
        std = g("image_std")
        return ClipConfig(
            image_size=int(g("image_size", 224)),
            patch_size=int(g("patch_size", 14)),
            n_embd=int(g("embedding_length", 1024)),
            n_layers=int(g("block_count", 12)),
            n_heads=int(g("attention.head_count", 16)),
            n_ff=int(g("feed_forward_length", 4096)),
            n_embd_llm=int(md.get("clip.vision.projection_dim",
                                  md.get("clip.projector.output_dim", 2048))),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            image_mean=tuple(mean) if mean is not None else
            ClipConfig.image_mean,
            image_std=tuple(std) if std is not None else ClipConfig.image_std,
            projector_type=str(md.get("clip.projector_type", "mlp")),
            n_merge=int(md.get("clip.vision.projector.scale_factor", 4)),
            spatial_merge=int(g("spatial_merge_size",
                                1 if md.get("clip.projector_type")
                                == "pixtral" else 2)),
            # qwen2-VL's ViT uses quick-gelu (HF hidden_act); qwen2.5-VL
            # moves to gated silu + RMS norms + window attention
            ffn_act=("quick_gelu"
                     if md.get("clip.projector_type") == "qwen2vl_merger"
                     else "silu_gated"
                     if md.get("clip.projector_type") == "qwen2.5vl_merger"
                     else "gelu"),
            n_wa_pattern=int(g("n_wa_pattern", 0)),
            attn_window_size=int(g("attn_window_size", 112)),
            query_num=int(md.get("clip.minicpmv_query_num", 64)),
        )


@partial(jax.tree_util.register_dataclass,
         data_fields=["ln1_w", "ln1_b", "wq", "bq", "wk", "bk", "wv", "bv",
                      "wo", "bo", "ln2_w", "ln2_b", "w_up", "b_up",
                      "w_down", "b_down", "w_gate", "b_gate", "ls1",
                      "ls2"],
         meta_fields=[])
@dataclasses.dataclass
class ClipLayer:
    ln1_w: jnp.ndarray
    ln1_b: jnp.ndarray
    wq: jnp.ndarray
    bq: jnp.ndarray
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray
    ln2_w: jnp.ndarray
    ln2_b: jnp.ndarray
    w_up: jnp.ndarray
    b_up: jnp.ndarray
    w_down: jnp.ndarray
    b_down: jnp.ndarray
    w_gate: Optional[jnp.ndarray] = None   # pixtral/qwen2.5: silu-gated MLP
    b_gate: Optional[jnp.ndarray] = None   # qwen2.5vl gate bias
    ls1: Optional[jnp.ndarray] = None      # layer scale after attn
    ls2: Optional[jnp.ndarray] = None      # layer scale after ffn
                                           # (clip.cpp:396-422, internvl)


@partial(jax.tree_util.register_dataclass,
         data_fields=["patch_w", "patch_b", "pos_embd", "pre_ln_w",
                      "pre_ln_b", "post_ln_w", "post_ln_b", "layers",
                      "mm0_w", "mm0_b", "mm2_w", "mm2_b",
                      "mm_input_proj", "mm_soft_emb_norm", "img_break",
                      "cls_embd", "mm_ln_w", "mm_ln_b", "mm_fc", "rs"],
         meta_fields=[])
@dataclasses.dataclass
class ClipWeights:
    patch_w: jnp.ndarray        # [patch*patch*3, E] flattened conv stem
    patch_b: Optional[jnp.ndarray]
    pos_embd: jnp.ndarray       # [n_patches, E]
    pre_ln_w: Optional[jnp.ndarray]
    pre_ln_b: Optional[jnp.ndarray]
    post_ln_w: Optional[jnp.ndarray]
    post_ln_b: Optional[jnp.ndarray]
    layers: list
    mm0_w: Optional[jnp.ndarray]          # [E, mm_hidden] (LLaVA mlp)
    mm0_b: Optional[jnp.ndarray]
    mm2_w: Optional[jnp.ndarray]          # [mm_hidden, n_embd_llm]
    mm2_b: Optional[jnp.ndarray]
    # gemma3 projector (mm.input_projection / mm.soft_emb_norm)
    mm_input_proj: Optional[jnp.ndarray] = None   # [E, n_embd_llm]
    mm_soft_emb_norm: Optional[jnp.ndarray] = None  # [E]
    # pixtral: learned [IMG_BREAK] embedding row (v.token_embd.img_break)
    img_break: Optional[jnp.ndarray] = None       # [n_embd_llm]
    cls_embd: Optional[jnp.ndarray] = None        # internvl CLS row
    mm_ln_w: Optional[jnp.ndarray] = None         # internvl mm.model.mlp.0
    mm_ln_b: Optional[jnp.ndarray] = None
    mm_fc: Optional[jnp.ndarray] = None           # idefics3 mm.model.fc
    # minicpmv resampler weights (resampler.* tensors), dict pytree:
    # query [Q, Ep], kv_w, ln_q_{w,b}, ln_kv_{w,b}, q_w/q_b/k_w/k_b/
    # v_w/v_b/o_w/o_b, ln_post_{w,b}, proj
    rs: Optional[dict] = None


def _layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def preprocess_image(img, cfg: ClipConfig) -> np.ndarray:
    """PIL image / HWC uint8 array -> [n_patches, patch*patch*3] f32
    (bicubic resize to the square input, CLIP mean/std normalization,
    flattened non-overlapping patches)."""
    try:
        from PIL import Image

        if isinstance(img, Image.Image):
            img = img.convert("RGB").resize(
                (cfg.image_size, cfg.image_size), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
        else:
            arr = np.asarray(img, np.float32)
            if arr.max() > 2.0:
                arr = arr / 255.0
    except ImportError:
        arr = np.asarray(img, np.float32)
    if arr.shape[:2] != (cfg.image_size, cfg.image_size):
        raise ValueError(f"image must be {cfg.image_size}x{cfg.image_size} "
                         f"(got {arr.shape}); PIL required for resize")
    arr = (arr - np.asarray(cfg.image_mean)) / np.asarray(cfg.image_std)
    p = cfg.patch_size
    g = cfg.image_size // p
    # [g, p, g, p, 3] -> [g*g, 3*p*p] in conv-weight order (C, ph, pw)
    patches = arr.reshape(g, p, g, p, 3).transpose(0, 2, 4, 1, 3)
    return patches.reshape(g * g, 3 * p * p).astype(np.float32)


def _vit_forward(cfg: ClipConfig, weights: ClipWeights, x: jnp.ndarray,
                 rms: bool = False) -> jnp.ndarray:
    """The shared pre-LN ViT body (clip.cpp build_vit): learned positions
    already added by the caller; optional per-layer ls1/ls2 scales
    (clip.cpp:396-422) and RMS norms (internvl 6B variants)."""
    n, e = x.shape
    h, d = cfg.n_heads, cfg.n_embd // cfg.n_heads
    norm = (lambda v_, w_, b_: _rms(v_, w_, cfg.eps)) if rms \
        else (lambda v_, w_, b_: _layer_norm(v_, w_, b_, cfg.eps))
    if weights.pre_ln_w is not None:
        x = norm(x, weights.pre_ln_w, weights.pre_ln_b)
    for lw in weights.layers:
        y = norm(x, lw.ln1_w, lw.ln1_b)
        q = (y @ lw.wq + lw.bq).reshape(n, h, d)
        k = (y @ lw.wk + lw.bk).reshape(n, h, d)
        v = (y @ lw.wv + lw.bv).reshape(n, h, d)
        att = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, e)
        ctx = ctx @ lw.wo + lw.bo
        if lw.ls1 is not None:
            ctx = ctx * lw.ls1
        x = x + ctx
        y = norm(x, lw.ln2_w, lw.ln2_b)
        y = y @ lw.w_up + lw.b_up
        y = jax.nn.gelu(y, approximate=cfg.use_gelu)
        y = y @ lw.w_down + lw.b_down
        if lw.ls2 is not None:
            y = y * lw.ls2
        x = x + y
    if weights.post_ln_w is not None:
        x = norm(x, weights.post_ln_w, weights.post_ln_b)
    return x


def pixel_shuffle(x: jnp.ndarray, gh: int, gw: int, s: int) -> jnp.ndarray:
    """[gh*gw, E] raster -> [gh/s * gw/s, E*s*s]: the idefics3/internvl
    patch-merge permute (clip.cpp:741 build_patch_merge_permute — w
    groups fold into channels first, then h groups)."""
    e = x.shape[-1]
    x = x.reshape(gh, gw // s, s * e)               # merge s along w
    x = jnp.swapaxes(x, 0, 1)                       # [gw/s, gh, s*e]
    x = x.reshape(gw // s, gh // s, s * s * e)      # merge s along h
    x = jnp.swapaxes(x, 0, 1)                       # [gh/s, gw/s, E*s*s]
    return x.reshape((gh // s) * (gw // s), s * s * e)


def encode_image(cfg: ClipConfig, weights: ClipWeights,
                 patches: jnp.ndarray) -> jnp.ndarray:
    """[n_patches, 3*p*p] -> [n_tokens, n_embd_llm] projected embeddings.
    Projector branches: LLaVA mlp, gemma3, idefics3 (pixel shuffle + fc,
    models/siglip.cpp:41-46), internvl (CLS + pixel shuffle + LN + MLP,
    models/internvl.cpp)."""
    x = (patches @ weights.patch_w).astype(jnp.float32)
    if weights.patch_b is not None:
        x = x + weights.patch_b
    is_internvl = cfg.projector_type == "internvl"
    if is_internvl and weights.cls_embd is not None:
        x = jnp.concatenate([weights.cls_embd[None, :], x], axis=0)
    if cfg.projector_type == "idefics3":
        # HF Idefics3VisionEmbeddings buckets fractional coords scaled by
        # (1 - 1e-6) with bucketize(right=True) — pos ids come out
        # [0, 0, 1, ..., g-2] per axis, NOT arange; checkpoints were
        # trained with exactly this table usage, so mirror it
        g = cfg.image_size // cfg.patch_size
        bounds = np.arange(1, g) / g
        f = np.arange(g) / g * (1 - 1e-6)
        b = np.searchsorted(bounds, f, side="right")
        ids = (b[:, None] * g + b[None, :]).reshape(-1)
        x = x + weights.pos_embd.astype(jnp.float32)[ids]
    else:
        x = x + weights.pos_embd.astype(jnp.float32)[: x.shape[0]]
    # the 6B InternVL ViT uses RMS norms (internvl.cpp:16-18 heuristic)
    rms = is_internvl and cfg.n_embd == 3200 and cfg.n_layers == 45
    x = _vit_forward(cfg, weights, x, rms=rms)
    e = x.shape[-1]
    if cfg.projector_type == "idefics3":
        g = cfg.image_size // cfg.patch_size
        x = pixel_shuffle(x, g, g, cfg.n_merge)
        return x @ weights.mm_fc
    if is_internvl:
        x = x[1:]                                   # drop CLS
        g = cfg.image_size // cfg.patch_size
        x = pixel_shuffle(x, g, g, cfg.n_merge)
        # mm.model.mlp.0 = LayerNorm (pytorch default eps 1e-5), then
        # mlp.1 -> GELU -> mlp.3 (internvl.cpp:55-62)
        x = _layer_norm(x, weights.mm_ln_w, weights.mm_ln_b, 1e-5)
        x = jax.nn.gelu(x @ weights.mm0_w + weights.mm0_b,
                        approximate=False)
        return x @ weights.mm2_w + weights.mm2_b
    if cfg.projector_type == "gemma3":
        # gemma3 projector (models/siglip.cpp PROJECTOR_TYPE_GEMMA3):
        # avg-pool the square patch grid by n_merge per side, RMSNorm
        # scaled by mm.soft_emb_norm, project with mm.input_projection
        ppi = cfg.image_size // cfg.patch_size
        m_ = cfg.n_merge
        grid = x.reshape(ppi // m_, m_, ppi // m_, m_, e)
        pooled = grid.mean(axis=(1, 3)).reshape(-1, e)     # [tokens, E]
        var = (pooled ** 2).mean(-1, keepdims=True)
        normed = pooled * jax.lax.rsqrt(var + cfg.eps) \
            * weights.mm_soft_emb_norm
        return normed @ weights.mm_input_proj
    # LLaVA MLP projector: mm.0 -> GELU -> mm.2
    x = jax.nn.gelu(x @ weights.mm0_w + weights.mm0_b, approximate=True)
    return x @ weights.mm2_w + weights.mm2_b


def _sincos_2d(n_embd_proj: int, gh: int, gw: int) -> np.ndarray:
    """MiniCPM-V resampler 2D sinusoidal position table [gh*gw, Ep]
    (models/minicpmv.cpp:47-68: per axis [sin | cos] over Ep/4
    frequencies, x block then y block)."""
    q = n_embd_proj // 4
    omega = 1.0 / (10000.0 ** (np.arange(q, dtype=np.float32) / q))
    hpos = (np.arange(gh * gw) // gw).astype(np.float32)
    wpos = (np.arange(gh * gw) % gw).astype(np.float32)
    tx = wpos[:, None] * omega[None, :]
    ty = hpos[:, None] * omega[None, :]
    return np.concatenate([np.sin(tx), np.cos(tx),
                           np.sin(ty), np.cos(ty)], axis=1)


def encode_image_minicpmv(cfg: ClipConfig, weights: ClipWeights,
                          patches: jnp.ndarray, grid_hw=None) -> jnp.ndarray:
    """MiniCPM-V perceiver resampler (clip-impl.h:210
    PROJECTOR_TYPE_MINICPMV "resampler" / models/minicpmv.cpp): standard
    LN ViT with learned positions, then a single cross-attention block —
    ``query_num`` learned queries attend the kv-projected patch
    embeddings (+ 2D sincos positions on K only) — LN + final
    projection. Output is always [query_num, n_embd_llm] regardless of
    image resolution (the Q-Former-style token-count compressor)."""
    x = (patches @ weights.patch_w).astype(jnp.float32)
    if weights.patch_b is not None:
        x = x + weights.patch_b
    n = x.shape[0]
    if grid_hw is None:
        g = cfg.image_size // cfg.patch_size
        grid_hw = (g, g)
    x = x + weights.pos_embd.astype(jnp.float32)[:n]
    x = _vit_forward(cfg, weights, x)
    rs = weights.rs
    q = _layer_norm(rs["query"], rs["ln_q_w"], rs["ln_q_b"], cfg.eps)
    v = x @ rs["kv_w"]                                   # [N, Ep]
    v = _layer_norm(v, rs["ln_kv_w"], rs["ln_kv_b"], cfg.eps)
    k = v + jnp.asarray(_sincos_2d(v.shape[-1], *grid_hw))[:n]
    ep = v.shape[-1]
    d = 128 if ep % 128 == 0 else ep // max(1, cfg.n_heads)
    h = ep // d                                          # minicpmv.cpp:77
    nq = q.shape[0]
    Q = (q @ rs["q_w"] + rs["q_b"]).reshape(nq, h, d)
    K = (k @ rs["k_w"] + rs["k_b"]).reshape(n, h, d)
    V = (v @ rs["v_w"] + rs["v_b"]).reshape(n, h, d)
    att = jnp.einsum("qhd,khd->hqk", Q, K) / np.sqrt(d)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", att, V).reshape(nq, ep)
    out = out @ rs["o_w"] + rs["o_b"]
    out = _layer_norm(out, rs["ln_post_w"], rs["ln_post_b"], cfg.eps)
    return out @ rs["proj"]


def qwen2vl_block_order(gh: int, gw: int, m: int = 2) -> np.ndarray:
    """Token order of the qwen2vl ViT: raster patches regrouped so every
    consecutive m*m tokens form one spatial merge block (the in-graph
    permute chain of models/qwen2vl.cpp:29-41 / the HF image processor's
    patch rearrangement)."""
    idx = np.arange(gh * gw).reshape(gh // m, m, gw // m, m)
    return idx.transpose(0, 2, 1, 3).reshape(-1)


def _vision_rope_2d(cfg: ClipConfig, hpos, wpos, d: int):
    """[T] h/w patch coords -> (cos, sin) [T, d] for the qwen2vl ViT's
    2D rotary (HF VisionRotaryEmbedding / ggml_rope_multi
    GGML_ROPE_TYPE_VISION, models/qwen2vl.cpp:110-115): the d/2 angle
    vector is [h * invf | w * invf] with d/4 inverse frequencies, applied
    neox-style over the full head dim."""
    invf = 1.0 / (cfg.rope_theta ** (np.arange(0, d // 2, 2,
                                               dtype=np.float32) / (d // 2)))
    ang_h = hpos[:, None].astype(np.float32) * invf[None, :]   # [T, d/4]
    ang_w = wpos[:, None].astype(np.float32) * invf[None, :]
    ang = np.concatenate([ang_h, ang_w], axis=1)               # [T, d/2]
    ang = np.concatenate([ang, ang], axis=1)                   # [T, d]
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def preprocess_image_qwen2vl(img, cfg: ClipConfig,
                             max_pixels: int = 1024 * 1024):
    """PIL image / HWC array -> (patches [gh*gw, 3*p*p] f32 raster order,
    (gh, gw)). Dynamic resolution: the image resizes (preserving aspect)
    to H/W multiples of patch_size * spatial_merge
    (clip.cpp:2833-2845 calc_size_preserved_ratio)."""
    unit = cfg.patch_size * cfg.spatial_merge
    try:
        from PIL import Image

        if isinstance(img, Image.Image):
            w0, h0 = img.size
            scale = min(1.0, (max_pixels / (w0 * h0)) ** 0.5)
            w1 = max(unit, int(round(w0 * scale / unit)) * unit)
            h1 = max(unit, int(round(h0 * scale / unit)) * unit)
            img = img.convert("RGB").resize((w1, h1), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
        else:
            arr = np.asarray(img, np.float32)
            if arr.max() > 2.0:
                arr = arr / 255.0
    except ImportError:
        arr = np.asarray(img, np.float32)
    hh, ww = arr.shape[:2]
    if hh % unit or ww % unit:
        raise ValueError(f"qwen2vl image dims must be multiples of {unit}, "
                         f"got {arr.shape} (PIL required for resize)")
    arr = (arr - np.asarray(cfg.image_mean)) / np.asarray(cfg.image_std)
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    patches = arr.reshape(gh, p, gw, p, 3).transpose(0, 2, 4, 1, 3)
    return patches.reshape(gh * gw, 3 * p * p).astype(np.float32), (gh, gw)


def qwen25vl_window_order(gh: int, gw: int, m: int, window_units: int):
    """Qwen2.5-VL window grouping (clip.cpp:3520-3550 get_window_index):
    merged units (m*m patch blocks) regroup so each attention window's
    units are contiguous. Returns (units [U] raster unit index per
    window-ordered slot, seglens [n_windows] token counts)."""
    ph, pw = gh // m, gw // m
    units, seglens = [], []
    for y in range(0, ph, window_units):
        for x in range(0, pw, window_units):
            wh = min(window_units, ph - y)
            ww = min(window_units, pw - x)
            for dy in range(wh):
                for dx in range(ww):
                    units.append((y + dy) * pw + (x + dx))
            seglens.append(wh * ww * m * m)
    return np.asarray(units, np.int64), np.asarray(seglens, np.int64)


def encode_image_qwen2vl(cfg: ClipConfig, weights: ClipWeights,
                         patches: jnp.ndarray, grid_hw) -> jnp.ndarray:
    """Qwen2-VL / Qwen2.5-VL ViT + 2x2 merger (models/qwen2vl.cpp build
    graph): dual-temporal conv stem (both slices see the same frame,
    summed at load into patch_w), NO learned positions — 2D rotary over
    each patch's (h, w) in every attention — then the merger MLP on
    concatenated 2x2 blocks (mm.0 -> GELU -> mm.2). patches arrive
    raster-order; the block reorder happens here.

    Qwen2.5-VL (PROJECTOR_TYPE_QWEN25VL, clip-impl.h:219): RMS norms,
    silu-GATED FFN, and window attention — merged units regroup into
    contiguous attn_window_size windows (block-diagonal mask); only
    every n_wa_pattern-th layer attends globally (qwen2vl.cpp:82); the
    merger output un-permutes back to raster unit order."""
    gh, gw = grid_hw
    m = cfg.spatial_merge
    order = qwen2vl_block_order(gh, gw, m)
    win_units = None
    win_mask = None
    is25 = cfg.projector_type == "qwen2.5vl_merger"
    if is25 and cfg.n_wa_pattern > 0:
        wu = max(1, cfg.attn_window_size // cfg.patch_size // m)
        win_units, seglens = qwen25vl_window_order(gh, gw, m, wu)
        # compose: window-ordered token i*m2+j <- block-order token
        # win_units[i]*m2+j <- raster token order[...]
        m2 = m * m
        tok_sel = (win_units[:, None] * m2
                   + np.arange(m2)[None, :]).reshape(-1)
        order = order[tok_sel]
        seg_id = np.repeat(np.arange(len(seglens)), seglens)
        win_mask = jnp.asarray(
            np.where(seg_id[:, None] == seg_id[None, :], 0.0,
                     -np.inf).astype(np.float32))
    hpos = (np.arange(gh * gw) // gw)[order]
    wpos = (np.arange(gh * gw) % gw)[order]

    x = (patches @ weights.patch_w).astype(jnp.float32)[order]
    if weights.patch_b is not None:
        x = x + weights.patch_b
    norm = (lambda v_, w_, b_: _rms(v_, w_, cfg.eps)) if is25 \
        else (lambda v_, w_, b_: _layer_norm(v_, w_, b_, cfg.eps))
    if weights.pre_ln_w is not None:
        x = norm(x, weights.pre_ln_w, weights.pre_ln_b)
    n, e = x.shape
    h, d = cfg.n_heads, cfg.n_embd // cfg.n_heads
    cos, sin = _vision_rope_2d(cfg, hpos, wpos, d)
    cos, sin = cos[:, None, :], sin[:, None, :]        # [T, 1, d]
    for li, lw in enumerate(weights.layers):
        full_attn = (win_mask is None
                     or (li + 1) % cfg.n_wa_pattern == 0)
        y = norm(x, lw.ln1_w, lw.ln1_b)
        q = (y @ lw.wq + lw.bq).reshape(n, h, d)
        k = (y @ lw.wk + lw.bk).reshape(n, h, d)
        v = (y @ lw.wv + lw.bv).reshape(n, h, d)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        att = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
        if not full_attn and win_mask is not None:
            att = att + win_mask[None, :, :]
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, e)
        x = x + (ctx @ lw.wo + lw.bo)
        y = norm(x, lw.ln2_w, lw.ln2_b)
        if cfg.ffn_act == "silu_gated":
            gate = y @ lw.w_gate + (lw.b_gate if lw.b_gate is not None
                                    else 0.0)
            up = y @ lw.w_up + lw.b_up
            y = jax.nn.silu(gate) * up
        else:
            y = y @ lw.w_up + lw.b_up
            if cfg.ffn_act == "quick_gelu":
                y = y * jax.nn.sigmoid(1.702 * y)
            else:
                y = jax.nn.gelu(y, approximate=cfg.use_gelu)
        x = x + (y @ lw.w_down + lw.b_down)
    if weights.post_ln_w is not None:
        x = norm(x, weights.post_ln_w, weights.post_ln_b)
    m2 = cfg.spatial_merge ** 2
    x = x.reshape(n // m2, m2 * e)                     # 2x2 block concat
    x = jax.nn.gelu(x @ weights.mm0_w + weights.mm0_b, approximate=False)
    x = x @ weights.mm2_w + weights.mm2_b
    if win_units is not None:
        # un-permute merged units back to raster order (qwen2vl.cpp:167
        # window_idx get_rows after the merger)
        inv = np.empty(len(win_units), np.int64)
        inv[win_units] = np.arange(len(win_units))
        x = x[inv]
    return x


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = (x32 * x32).mean(-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _vision_rope_2d_pixtral(cfg: ClipConfig, hpos, wpos, d: int):
    """Pixtral's 2D rotary (HF PixtralRotaryEmbedding / clip.cpp
    PROJECTOR_TYPE_PIXTRAL rope): the d/2 frequency ladder is split
    INTERLEAVED between axes — h takes freqs[::2], w takes freqs[1::2] —
    then the [h-angles | w-angles] halves concatenate (unlike qwen2vl,
    which reuses one d/4 ladder for both axes)."""
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2,
                                                dtype=np.float32) / d))
    ang_h = hpos[:, None].astype(np.float32) * freqs[0::2][None, :]
    ang_w = wpos[:, None].astype(np.float32) * freqs[1::2][None, :]
    ang = np.concatenate([ang_h, ang_w], axis=1)               # [T, d/2]
    ang = np.concatenate([ang, ang], axis=1)                   # [T, d]
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def encode_image_pixtral(cfg: ClipConfig, weights: ClipWeights,
                         patches: jnp.ndarray, grid_hw,
                         insert_breaks: bool = True) -> jnp.ndarray:
    """Pixtral ViT + MLP projector (clip-impl.h PROJECTOR_TYPE_PIXTRAL /
    HF PixtralVisionModel): RMSNorm everywhere (pre-LN + per-layer, no
    biases), silu-GATED MLP, NO learned positions — interleaved-ladder 2D
    rotary per patch (raster order; no block merge) — then the LLaVA-
    style mm.1 -> GELU -> mm.2 projector. With ``insert_breaks`` the
    learned [IMG_BREAK] embedding row (v.token_embd.img_break) is
    appended after every patch row EXCEPT the last (mtmd's pixtral
    stream, tools/mtmd/models/pixtral.cpp:70: n_tokens_output =
    p_total + p_y - 1 — the final row is followed by the [IMG_END]
    text token instead), giving gh*gw + gh - 1 rows."""
    gh, gw = grid_hw
    hpos = np.arange(gh * gw) // gw
    wpos = np.arange(gh * gw) % gw

    x = (patches @ weights.patch_w).astype(jnp.float32)
    if weights.patch_b is not None:
        x = x + weights.patch_b
    x = _rms(x, weights.pre_ln_w, cfg.eps)
    n, e = x.shape
    h, d = cfg.n_heads, cfg.n_embd // cfg.n_heads
    cos, sin = _vision_rope_2d_pixtral(cfg, hpos, wpos, d)
    cos, sin = cos[:, None, :], sin[:, None, :]
    for lw in weights.layers:
        y = _rms(x, lw.ln1_w, cfg.eps)
        q = (y @ lw.wq + lw.bq).reshape(n, h, d)
        k = (y @ lw.wk + lw.bk).reshape(n, h, d)
        v = (y @ lw.wv + lw.bv).reshape(n, h, d)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        att = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, e)
        x = x + (ctx @ lw.wo + lw.bo)
        y = _rms(x, lw.ln2_w, cfg.eps)
        gate = y @ lw.w_gate
        up = y @ lw.w_up + lw.b_up
        y = jax.nn.silu(gate) * up
        x = x + (y @ lw.w_down + lw.b_down)
    out = jax.nn.gelu(x @ weights.mm0_w + weights.mm0_b, approximate=False)
    out = out @ weights.mm2_w + weights.mm2_b                  # [gh*gw, D]
    if insert_breaks and weights.img_break is not None:
        rows = out.reshape(gh, gw, -1)
        brk = jnp.broadcast_to(weights.img_break[None, None, :],
                               (gh, 1, rows.shape[-1]))
        out = jnp.concatenate([rows, brk], axis=1).reshape(
            gh * (gw + 1), -1)[:-1]  # no break after the last row
    return out


def load_mmproj(path: str | Path):
    """Load a multimodal projector GGUF (mmproj-*.gguf, clip.cpp format).
    Returns (ClipConfig, ClipWeights)."""
    from rrs_tpu.gguf.reader import read_gguf

    with read_gguf(path) as g:
        md = g.metadata
        cfg = ClipConfig.from_gguf(md)

        def t(name, required=True):
            if name not in g.tensors:
                if required:
                    raise KeyError(name)
                return None
            return jnp.asarray(g.tensor(name).astype(np.float32))

        def lin(name):
            """[out, in] -> [in, out] for x @ w."""
            w = t(f"{name}.weight")
            return w.T, (t(f"{name}.bias", required=False)
                         if f"{name}.bias" in g.tensors
                         else jnp.zeros((w.shape[0],), jnp.float32))

        # conv stem [E, 3, p, p] -> [3*p*p, E]. qwen2vl ships TWO temporal
        # conv slices (v.patch_embd.weight + .weight.1, conv3d over the
        # duplicated frame — models/qwen2vl.cpp:20-28); both see the same
        # pixels for still images, so they fold into one summed matmul.
        pw = g.tensor("v.patch_embd.weight").astype(np.float32)
        e = pw.shape[0]
        if "v.patch_embd.weight.1" in g.tensors:
            pw = pw.reshape(e, -1) + g.tensor(
                "v.patch_embd.weight.1").astype(np.float32).reshape(e, -1)
        patch_w = jnp.asarray(pw.reshape(e, -1).T)
        layers = []
        for i in range(cfg.n_layers):
            p = f"v.blk.{i}"
            wq, bq = lin(f"{p}.attn_q")
            wk, bk = lin(f"{p}.attn_k")
            wv, bv = lin(f"{p}.attn_v")
            wo, bo = lin(f"{p}.attn_out")
            wu, bu = lin(f"{p}.ffn_up")
            wd, bd = lin(f"{p}.ffn_down")
            ln1_b = t(f"{p}.ln1.bias", required=False)
            ln2_b = t(f"{p}.ln2.bias", required=False)
            ln1_w = t(f"{p}.ln1.weight")
            layers.append(ClipLayer(
                ln1_w=ln1_w,
                ln1_b=ln1_b if ln1_b is not None else jnp.zeros_like(ln1_w),
                wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv, wo=wo, bo=bo,
                ln2_w=t(f"{p}.ln2.weight"),
                ln2_b=ln2_b if ln2_b is not None else jnp.zeros_like(ln1_w),
                w_up=wu, b_up=bu, w_down=wd, b_down=bd,
                w_gate=(lin(f"{p}.ffn_gate")[0]
                        if f"{p}.ffn_gate.weight" in g.tensors else None),
                b_gate=(lin(f"{p}.ffn_gate")[1]
                        if f"{p}.ffn_gate.weight" in g.tensors else None),
                ls1=t(f"{p}.ls1.weight", required=False),
                ls2=t(f"{p}.ls2.weight", required=False),
            ))
        mm0w = mm0b = mm2w = mm2b = mm_ip = mm_sen = None
        mm_lnw = mm_lnb = mm_fc = rs = None
        if cfg.projector_type == "gemma3":
            # HF stores mm_input_projection as [vision_dim, text_dim];
            # orient for x @ W by matching the vision dim
            ip = np.asarray(g.tensor("mm.input_projection.weight"),
                            np.float32)
            if ip.shape[0] != cfg.n_embd:
                ip = ip.T
            mm_ip = jnp.asarray(ip)
            mm_sen = t("mm.soft_emb_norm.weight")
        elif cfg.projector_type == "idefics3":
            mm_fc = lin("mm.model.fc")[0]          # clip-impl.h:103
        elif cfg.projector_type == "internvl":
            # mm.model.mlp.0 = LayerNorm, .1/.3 = Linear (clip.cpp:1738)
            mm_lnw = t("mm.model.mlp.0.weight")
            mm_lnb = t("mm.model.mlp.0.bias")
            mm0w, mm0b = lin("mm.model.mlp.1")
            mm2w, mm2b = lin("mm.model.mlp.3")
        elif cfg.projector_type == "resampler":
            # minicpmv perceiver resampler (clip-impl.h:113-118)
            rs = {
                "query": t("resampler.query"),
                "kv_w": t("resampler.kv.weight").T,
                "ln_q_w": t("resampler.ln_q.weight"),
                "ln_q_b": t("resampler.ln_q.bias"),
                "ln_kv_w": t("resampler.ln_kv.weight"),
                "ln_kv_b": t("resampler.ln_kv.bias"),
                "ln_post_w": t("resampler.ln_post.weight"),
                "ln_post_b": t("resampler.ln_post.bias"),
                "proj": t("resampler.proj.weight"),
            }
            for nm in ("q", "k", "v"):
                w_, b_ = lin(f"resampler.attn.{nm}")
                rs[f"{nm}_w"], rs[f"{nm}_b"] = w_, b_
            w_, b_ = lin("resampler.attn.out")
            rs["o_w"], rs["o_b"] = w_, b_
        else:
            # pixtral writes the projector as mm.1/mm.2 (clip.cpp); the
            # LLaVA MLP as mm.0/mm.2
            mm0w, mm0b = lin("mm.1" if "mm.1.weight" in g.tensors
                             else "mm.0")
            mm2w, mm2b = lin("mm.2")
        brk = t("v.token_embd.img_break", required=False)
        pos = t("v.position_embd.weight", required=cfg.projector_type
                not in ("qwen2vl_merger", "qwen2.5vl_merger",
                        "pixtral"))                    # rotary: no table
        weights = ClipWeights(
            patch_w=patch_w,
            patch_b=t("v.patch_embd.bias", required=False),
            # internvl keeps its CLS row at index 0 (n_pos = n_patches+1);
            # CLIP-style tables drop leading class rows
            pos_embd=(None if pos is None
                      else pos if cfg.projector_type == "internvl"
                      else pos[-cfg.n_patches:]),
            pre_ln_w=t("v.pre_ln.weight", required=False),
            pre_ln_b=t("v.pre_ln.bias", required=False),
            post_ln_w=t("v.post_ln.weight", required=False),
            post_ln_b=t("v.post_ln.bias", required=False),
            layers=layers,
            mm0_w=mm0w, mm0_b=mm0b, mm2_w=mm2w, mm2_b=mm2b,
            mm_input_proj=mm_ip, mm_soft_emb_norm=mm_sen,
            img_break=None if brk is None else brk.reshape(-1),
            cls_embd=(None if "v.class_embd" not in g.tensors
                      else t("v.class_embd").reshape(-1)),
            mm_ln_w=mm_lnw, mm_ln_b=mm_lnb, mm_fc=mm_fc, rs=rs,
        )
    return cfg, weights


def random_clip_weights(cfg: ClipConfig, seed: int = 0,
                        mm_hidden: int = 0) -> ClipWeights:
    rng = np.random.default_rng(seed)
    e, f = cfg.n_embd, cfg.n_ff
    mm_hidden = mm_hidden or cfg.n_embd_llm

    def m(k, n, s=0.02):
        return jnp.asarray(rng.standard_normal((k, n)) * s, jnp.float32)

    def b(n):
        return jnp.zeros((n,), jnp.float32)

    layers = [ClipLayer(
        ln1_w=jnp.ones((e,), jnp.float32), ln1_b=b(e),
        wq=m(e, e), bq=b(e), wk=m(e, e), bk=b(e), wv=m(e, e), bv=b(e),
        wo=m(e, e), bo=b(e),
        ln2_w=jnp.ones((e,), jnp.float32), ln2_b=b(e),
        w_up=m(e, f), b_up=b(f), w_down=m(f, e), b_down=b(e),
    ) for _ in range(cfg.n_layers)]
    gemma3 = cfg.projector_type == "gemma3"
    return ClipWeights(
        patch_w=m(3 * cfg.patch_size ** 2, e),
        patch_b=b(e),
        pos_embd=m(cfg.n_patches, e),
        pre_ln_w=jnp.ones((e,), jnp.float32), pre_ln_b=b(e),
        post_ln_w=jnp.ones((e,), jnp.float32), post_ln_b=b(e),
        layers=layers,
        mm0_w=None if gemma3 else m(e, mm_hidden),
        mm0_b=None if gemma3 else b(mm_hidden),
        mm2_w=None if gemma3 else m(mm_hidden, cfg.n_embd_llm),
        mm2_b=None if gemma3 else b(cfg.n_embd_llm),
        mm_input_proj=m(e, cfg.n_embd_llm) if gemma3 else None,
        mm_soft_emb_norm=jnp.ones((e,), jnp.float32) if gemma3 else None,
    )
