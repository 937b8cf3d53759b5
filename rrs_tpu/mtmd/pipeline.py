"""Multimodal prompt pipeline (tools/mtmd/mtmd.cpp analog): split a prompt
on image markers, encode each image to embedding chunks, and drive a context
with interleaved token-prefill and embedding-prefill calls."""

from __future__ import annotations

import base64
import io
from typing import Optional

import jax.numpy as jnp
import numpy as np

from rrs_tpu.mtmd.clip import (ClipConfig, ClipWeights, encode_image,
                               encode_image_pixtral, encode_image_qwen2vl,
                               preprocess_image, preprocess_image_qwen2vl)

IMAGE_MARKER = "<__image__>"     # mtmd's default media marker


def decode_image_b64(data: str):
    """base64 (optionally a data: URL) -> PIL image."""
    from PIL import Image

    if data.startswith("data:"):
        data = data.split(",", 1)[1]
    return Image.open(io.BytesIO(base64.b64decode(data)))


def decode_audio_b64(data: str, fmt: str = "wav") -> np.ndarray:
    """base64 (optionally data: URL) WAV -> mono f32 PCM @16kHz.
    Stdlib-only decode (PCM16/PCM8/f32 WAV); naive linear resample."""
    import struct
    import wave

    if data.startswith("data:"):
        data = data.split(",", 1)[1]
    raw = base64.b64decode(data)
    with wave.open(io.BytesIO(raw)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(-1)
    if sr != 16000:
        n_out = int(round(x.size * 16000 / sr))
        x = np.interp(np.linspace(0, x.size - 1, n_out),
                      np.arange(x.size), x).astype(np.float32)
    return x


def embed_images(cfg: ClipConfig, weights: ClipWeights, images) -> list:
    """Encode images -> list of [n_patches, n_embd_llm] numpy chunks.
    qwen2vl_merger projectors return (chunk, (gh, gw)) tuples instead —
    the MERGED llm grid rides along for M-RoPE positions."""
    out = []
    for img in images:
        if cfg.projector_type in ("qwen2vl_merger", "qwen2.5vl_merger"):
            patches, (gh, gw) = preprocess_image_qwen2vl(img, cfg)
            emb = encode_image_qwen2vl(cfg, weights, jnp.asarray(patches),
                                       (gh, gw))
            m = cfg.spatial_merge
            out.append((np.asarray(emb), (gh // m, gw // m)))
        elif cfg.projector_type == "pixtral":
            # dynamic resolution, no merge (spatial_merge=1); [IMG_BREAK]
            # rows ride inside the chunk, positions stay sequential
            patches, grid = preprocess_image_qwen2vl(img, cfg)
            out.append(np.asarray(encode_image_pixtral(
                cfg, weights, jnp.asarray(patches), grid)))
        elif cfg.projector_type == "resampler":
            from rrs_tpu.mtmd.clip import encode_image_minicpmv

            patches = jnp.asarray(preprocess_image(img, cfg))
            out.append(np.asarray(encode_image_minicpmv(
                cfg, weights, patches)))
        else:
            patches = jnp.asarray(preprocess_image(img, cfg))
            out.append(np.asarray(encode_image(cfg, weights, patches)))
    return out


def _prefill_chunk(ctx, seq_id: int, chunk):
    """One image chunk -> prefill_embeds, with the M-RoPE grid when the
    chunk carries one (qwen2vl)."""
    if isinstance(chunk, tuple):
        emb, grid = chunk
        return ctx.prefill_embeds(seq_id, emb, mrope_grid=grid)
    return ctx.prefill_embeds(seq_id, chunk)


def multimodal_prefill(ctx, vocab, seq_id: int, prompt: str,
                       image_chunks: list) -> np.ndarray:
    """Tokenize the prompt around IMAGE_MARKERs and interleave token and
    embedding prefill chunks. Returns the final logits row [V]."""
    parts = prompt.split(IMAGE_MARKER)
    if len(parts) - 1 != len(image_chunks):
        raise ValueError(
            f"prompt has {len(parts) - 1} image markers but "
            f"{len(image_chunks)} images were provided")
    logits = None
    for i, part in enumerate(parts):
        if part:
            toks = vocab.encode(part, add_special=(i == 0))
            if toks:
                logits = ctx.prefill(seq_id, toks)
        if i < len(image_chunks):
            logits = _prefill_chunk(ctx, seq_id, image_chunks[i])
    if logits is None:
        raise ValueError("empty multimodal prompt")
    return logits[-1]


def generate_with_images(ctx, vocab, prompt: str, images,
                         clip_cfg: ClipConfig, clip_weights: ClipWeights,
                         max_new_tokens: int = 64,
                         stop_tokens: tuple = ()) -> list[int]:
    """Greedy multimodal generation (mtmd-cli analog)."""
    chunks = embed_images(clip_cfg, clip_weights, images)
    seq = ctx.new_sequence()
    try:
        last = multimodal_prefill(ctx, vocab, seq, prompt, chunks)
        out = []
        for _ in range(max_new_tokens):
            tok = int(np.argmax(last))
            if tok in stop_tokens:
                break
            out.append(tok)
            last = ctx.decode({seq: tok})[seq]
        return out
    finally:
        ctx.kv.seq_rm(seq)
