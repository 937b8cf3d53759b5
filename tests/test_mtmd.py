"""Multimodal (mtmd/clip.cpp analog) tests: vision encoder shapes, GGUF
round-trip, embedding injection, end-to-end image + text generation."""

import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.llama import random_weights
from rrs_tpu.mtmd.clip import (ClipConfig, encode_image, load_mmproj,
                               preprocess_image, random_clip_weights)
from rrs_tpu.mtmd.pipeline import IMAGE_MARKER, embed_images, generate_with_images
from rrs_tpu.runtime.context import InferenceContext


def _clip_cfg(n_embd_llm=128):
    return ClipConfig(image_size=28, patch_size=14, n_embd=64, n_layers=2,
                      n_heads=4, n_ff=128, n_embd_llm=n_embd_llm)


def test_preprocess_and_encode_shapes():
    import jax.numpy as jnp

    cfg = _clip_cfg()
    w = random_clip_weights(cfg, seed=0)
    img = np.random.default_rng(0).integers(
        0, 256, (28, 28, 3)).astype(np.uint8)
    patches = preprocess_image(img, cfg)
    assert patches.shape == (cfg.n_patches, 3 * 14 * 14) == (4, 588)
    emb = np.asarray(encode_image(cfg, w, jnp.asarray(patches)))
    assert emb.shape == (4, 128)
    assert np.isfinite(emb).all()


def test_mmproj_gguf_roundtrip(tmp_path):
    from rrs_tpu.gguf.writer import GGUFWriter

    cfg = _clip_cfg()
    rng = np.random.default_rng(1)
    w = GGUFWriter(tmp_path / "mmproj.gguf")
    w.add_string("general.architecture", "clip")
    w.add_uint32("clip.vision.image_size", cfg.image_size)
    w.add_uint32("clip.vision.patch_size", cfg.patch_size)
    w.add_uint32("clip.vision.embedding_length", cfg.n_embd)
    w.add_uint32("clip.vision.block_count", cfg.n_layers)
    w.add_uint32("clip.vision.attention.head_count", cfg.n_heads)
    w.add_uint32("clip.vision.feed_forward_length", cfg.n_ff)
    w.add_uint32("clip.vision.projection_dim", cfg.n_embd_llm)

    def t(name, shape):
        w.add_tensor(name, (rng.standard_normal(shape) * 0.05).astype(np.float32))

    e, f = cfg.n_embd, cfg.n_ff
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((e, 3, 14, 14)) * 0.05).astype(np.float32))
    t("v.patch_embd.bias", (e,))
    t("v.position_embd.weight", (cfg.n_patches, e))
    for nm in ("v.pre_ln", "v.post_ln"):
        t(f"{nm}.weight", (e,))
        t(f"{nm}.bias", (e,))
    for i in range(cfg.n_layers):
        p = f"v.blk.{i}"
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            t(f"{p}.{nm}.weight", (e, e))
            t(f"{p}.{nm}.bias", (e,))
        for nm in ("ln1", "ln2"):
            t(f"{p}.{nm}.weight", (e,))
            t(f"{p}.{nm}.bias", (e,))
        t(f"{p}.ffn_up.weight", (f, e))
        t(f"{p}.ffn_up.bias", (f,))
        t(f"{p}.ffn_down.weight", (e, f))
        t(f"{p}.ffn_down.bias", (e,))
    t("mm.0.weight", (cfg.n_embd_llm, e))
    t("mm.0.bias", (cfg.n_embd_llm,))
    t("mm.2.weight", (cfg.n_embd_llm, cfg.n_embd_llm))
    t("mm.2.bias", (cfg.n_embd_llm,))
    w.write()

    import jax.numpy as jnp

    cfg2, weights = load_mmproj(tmp_path / "mmproj.gguf")
    assert cfg2.n_patches == 4 and cfg2.n_embd_llm == cfg.n_embd_llm
    img = np.zeros((28, 28, 3), np.uint8)
    emb = np.asarray(encode_image(
        cfg2, weights, jnp.asarray(preprocess_image(img, cfg2))))
    assert emb.shape == (4, cfg.n_embd_llm) and np.isfinite(emb).all()


def test_multimodal_generation():
    """Image chunks injected via prefill_embeds steer generation."""
    lm_cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=96, context_length=128,
        qk_norm=True)
    lm_w = random_weights(lm_cfg, seed=0)
    clip_cfg = _clip_cfg(n_embd_llm=lm_cfg.n_embd)
    clip_w = random_clip_weights(clip_cfg, seed=1)

    class CharVocab:
        def encode(self, text, add_special=False):
            return [min(ord(c), 95) for c in text]

    rng = np.random.default_rng(2)
    img1 = rng.integers(0, 256, (28, 28, 3)).astype(np.uint8)
    img2 = rng.integers(0, 256, (28, 28, 3)).astype(np.uint8)

    out = generate_with_images(
        InferenceContext(lm_cfg, lm_w, n_lanes=1, max_seq=128),
        CharVocab(), f"look: {IMAGE_MARKER} what?", [img1],
        clip_cfg, clip_w, max_new_tokens=6)
    assert len(out) == 6 and all(0 <= t < 96 for t in out)

    # different images -> different final prefill logits (the chunk really
    # entered the KV cache)
    from rrs_tpu.mtmd.pipeline import embed_images, multimodal_prefill

    def last_logits(img):
        ctx = InferenceContext(lm_cfg, lm_w, n_lanes=1, max_seq=128)
        seq = ctx.new_sequence()
        chunks = embed_images(clip_cfg, clip_w, [img])
        return multimodal_prefill(ctx, CharVocab(), seq,
                                  f"look: {IMAGE_MARKER}", chunks)

    l1, l2 = last_logits(img1), last_logits(img2)
    assert np.abs(l1 - l2).max() > 1e-4


def test_marker_count_mismatch():
    lm_cfg = ModelConfig(
        arch="qwen3", n_layers=1, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=96, context_length=64,
        qk_norm=True)
    ctx = InferenceContext(lm_cfg, random_weights(lm_cfg, seed=3),
                           n_lanes=1, max_seq=64)
    from rrs_tpu.mtmd.pipeline import multimodal_prefill

    class V:
        def encode(self, text, add_special=False):
            return [1, 2]

    seq = ctx.new_sequence()
    with pytest.raises(ValueError):
        multimodal_prefill(ctx, V(), seq, f"a {IMAGE_MARKER} b", [])
