"""Qwen2-VL parity tests (clip-impl.h:212 PROJECTOR_TYPE_QWEN2VL +
LLM_ARCH_QWEN2VL): vision tower + merger vs the HF
Qwen2VLForConditionalGeneration oracle, M-RoPE vs standard rope, and the
full text+image+text pipeline (HF -> GGUF conversion for both the LLM and
the mmproj, loaded through the product loaders)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rrs_tpu.models.loader import load_model
from rrs_tpu.tools.convert_hf import convert_hf_mmproj, convert_hf_to_gguf

VC = dict(embed_dim=32, depth=2, num_heads=2, mlp_ratio=4, patch_size=4,
          spatial_merge_size=2, temporal_patch_size=2, in_channels=3,
          hidden_size=64)


def _tiny_qwen2vl(tmp_path):
    cfg = transformers.Qwen2VLConfig(
        vision_config=VC, vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_start_token_id=100, vision_end_token_id=102,
        image_token_id=101,
    )
    torch.manual_seed(0)
    model = transformers.Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))
    return d, model, cfg


def _hf_pixel_values(arr, p=4, merge=2, temporal=2):
    """HF Qwen2VLImageProcessor patch rearrangement for ONE image (already
    normalized, HWC): -> (flatten_patches [gh*gw, C*temporal*p*p],
    grid_thw [1, 3])."""
    hh, ww, c = arr.shape
    gh, gw = hh // p, ww // p
    chw = arr.transpose(2, 0, 1)                      # [C, H, W]
    pat = np.tile(chw[None, None], (1, temporal, 1, 1, 1))  # [1,T,C,H,W]
    pat = pat.reshape(1, temporal, c, gh // merge, merge, p,
                      gw // merge, merge, p)
    pat = pat.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = pat.reshape(gh * gw, c * temporal * p * p)
    return flat.astype(np.float32), np.array([[1, gh, gw]], np.int64)


def _norm_image(rng, hh, ww):
    """Random image, CLIP-normalized both for our path and HF's."""
    from rrs_tpu.mtmd.clip import ClipConfig

    raw = rng.uniform(0, 1, (hh, ww, 3)).astype(np.float32)
    cc = ClipConfig()
    normed = (raw - np.asarray(cc.image_mean)) / np.asarray(cc.image_std)
    return raw, normed.astype(np.float32)


def test_apply_mrope_uniform_equals_rope():
    """With all channels equal, M-RoPE is exactly standard (neox) rope."""
    import jax.numpy as jnp

    from rrs_tpu.ops.basic import RopeParams, apply_mrope, apply_rope

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, 4, 16)), jnp.float32)
    pos = jnp.asarray([[3, 4, 5, 6, 7]], jnp.int32)
    p = RopeParams(head_dim=16, theta=10000.0, neox=True)
    ref = apply_rope(x, pos, p)
    pos3 = jnp.broadcast_to(pos[..., None], (1, 5, 3))
    got = apply_mrope(x, pos3, p, (2, 3, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_qwen2vl_text_logits_parity(tmp_path):
    """Pure-text qwen2vl: conversion + loader + (uniform) M-RoPE vs HF."""
    d, model, _ = _tiny_qwen2vl(tmp_path)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "qwen2vl"
    assert cfg.rope_sections == (2, 3, 3, 0)
    assert cfg.attn_bias

    import jax.numpy as jnp

    from rrs_tpu.models import llama as lm

    toks = [3, 17, 42, 5, 99]
    with torch.no_grad():
        hf = model(torch.tensor([toks])).logits[0].float().numpy()
    t = len(toks)
    ks, vs = lm.scratch_caches(cfg, 1, 32, dtype=jnp.float32)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _, _ = lm.forward(
        cfg, weights, jnp.asarray([toks], jnp.int32), pos, ks, vs, pos, pos)
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got - got.max(-1, keepdims=True),
                               hf - hf.max(-1, keepdims=True),
                               atol=2e-2, rtol=0.05)


def test_qwen2vl_vision_tower_parity(tmp_path):
    """Our ViT + 2x2 merger (raster patches + in-graph reorder + 2D rotary)
    matches HF model.visual on the same pixels."""
    d, model, _ = _tiny_qwen2vl(tmp_path)
    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")

    from rrs_tpu.mtmd.clip import (encode_image_qwen2vl, load_mmproj,
                                   preprocess_image_qwen2vl)

    ccfg, cw = load_mmproj(mm)
    assert ccfg.projector_type == "qwen2vl_merger"
    assert ccfg.n_embd == 32 and ccfg.n_embd_llm == 64

    rng = np.random.default_rng(1)
    raw, normed = _norm_image(rng, 16, 24)           # gh=4, gw=6
    patches, (gh, gw) = preprocess_image_qwen2vl(raw, ccfg)
    assert (gh, gw) == (4, 6)
    ours = np.asarray(encode_image_qwen2vl(ccfg, cw, patches, (gh, gw)))

    flat, grid = _hf_pixel_values(normed, p=4, merge=2, temporal=2)
    with torch.no_grad():
        hf = model.model.visual(torch.tensor(flat),
                                grid_thw=torch.tensor(grid)).float().numpy()
    assert ours.shape == hf.shape == (6, 64)
    np.testing.assert_allclose(ours, hf, atol=2e-4, rtol=1e-3)


def test_qwen2vl_image_chat_parity(tmp_path):
    """Full text + image + text prefill through InferenceContext (M-RoPE
    grid positions + trailing text delta) vs the HF end-to-end forward."""
    d, model, hf_cfg = _tiny_qwen2vl(tmp_path)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)

    from rrs_tpu.mtmd.clip import load_mmproj
    from rrs_tpu.mtmd.pipeline import embed_images
    from rrs_tpu.runtime.context import InferenceContext

    ccfg, cw = load_mmproj(mm)
    rng = np.random.default_rng(2)
    raw, normed = _norm_image(rng, 16, 24)           # 6 merged tokens
    (chunk, grid), = embed_images(ccfg, cw, [raw])
    assert grid == (2, 3)

    pre, post = [3, 17, 42], [5, 99, 7, 23]
    # HF: <pre> <vision_start> <image>*6 <post>; image placeholders are
    # replaced by visual embeddings, get_rope_index derives the M-RoPE grid
    ids = pre + [100] + [101] * 6 + post
    flat, gthw = _hf_pixel_values(normed, p=4, merge=2, temporal=2)
    with torch.no_grad():
        hf = model(torch.tensor([ids]), pixel_values=torch.tensor(flat),
                   image_grid_thw=torch.tensor(gthw)).logits[0]
        hf = hf.float().numpy()

    import jax.numpy as jnp

    ctx = InferenceContext(cfg, weights, n_lanes=1, max_seq=64,
                           kv_dtype=jnp.float32)
    seq = ctx.new_sequence()
    l_pre = ctx.prefill(seq, pre + [100])
    l_img = ctx.prefill_embeds(seq, chunk, mrope_grid=grid)
    l_post = ctx.prefill(seq, post)
    got = np.concatenate([l_pre, l_img, l_post], axis=0)

    assert got.shape == hf.shape
    np.testing.assert_allclose(got - got.max(-1, keepdims=True),
                               hf - hf.max(-1, keepdims=True),
                               atol=2e-2, rtol=0.05)
    # decode after the image continues at max(t,h,w)+1, trailing the slot
    assert ctx.kv.mrope_delta[0] == -3               # 6 tokens vs max grid 3
