"""Qwen2.5-VL parity tests (clip-impl.h:219 PROJECTOR_TYPE_QWEN25VL):
RMS-norm ViT with silu-gated MLP and WINDOW ATTENTION (clip.cpp:3506
n_wa_pattern + get_window_index regrouping) vs the HF
Qwen2_5_VLForConditionalGeneration oracle, plus the full
text+image+text pipeline through the product converters/loaders."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rrs_tpu.models.loader import load_model
from rrs_tpu.tools.convert_hf import convert_hf_mmproj, convert_hf_to_gguf

# window_size=16px -> grid_window = 16/4/2 = 2 merged units, so a 16x24
# image (ph=2, pw=3) gets 2x2-unit windows WITH a ragged remainder column
# — exercising the uneven-window path. fullatt_block_indexes=[1, 3] <->
# n_wa_pattern=2: layers 0/2 window-masked, layers 1/3 full.
VC = dict(hidden_size=32, out_hidden_size=64, intermediate_size=48,
          depth=4, num_heads=2, patch_size=4, spatial_merge_size=2,
          temporal_patch_size=2, in_channels=3, window_size=16,
          fullatt_block_indexes=[1, 3], hidden_act="silu")


def _tiny_qwen25vl(tmp_path):
    cfg = transformers.Qwen2_5_VLConfig(
        vision_config=VC, vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_start_token_id=100, vision_end_token_id=102,
        image_token_id=101,
    )
    torch.manual_seed(0)
    model = transformers.Qwen2_5_VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))
    return d, model, cfg


def _hf_pixel_values(arr, p=4, merge=2, temporal=2):
    hh, ww, c = arr.shape
    gh, gw = hh // p, ww // p
    chw = arr.transpose(2, 0, 1)
    pat = np.tile(chw[None, None], (1, temporal, 1, 1, 1))
    pat = pat.reshape(1, temporal, c, gh // merge, merge, p,
                      gw // merge, merge, p)
    pat = pat.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = pat.reshape(gh * gw, c * temporal * p * p)
    return flat.astype(np.float32), np.array([[1, gh, gw]], np.int64)


def _norm_image(rng, hh, ww):
    from rrs_tpu.mtmd.clip import ClipConfig

    raw = rng.uniform(0, 1, (hh, ww, 3)).astype(np.float32)
    cc = ClipConfig()
    normed = (raw - np.asarray(cc.image_mean)) / np.asarray(cc.image_std)
    return raw, normed.astype(np.float32)


def test_qwen25vl_vision_tower_parity(tmp_path):
    """Our windowed RMS ViT + merger matches HF model.visual bit-close on
    the same pixels, including the window regroup/ungroup permutes."""
    d, model, _ = _tiny_qwen25vl(tmp_path)
    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")

    from rrs_tpu.mtmd.clip import (encode_image_qwen2vl, load_mmproj,
                                   preprocess_image_qwen2vl)

    ccfg, cw = load_mmproj(mm)
    assert ccfg.projector_type == "qwen2.5vl_merger"
    assert ccfg.n_wa_pattern == 2 and ccfg.attn_window_size == 16
    assert ccfg.ffn_act == "silu_gated"

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
    np.testing.assert_allclose(ours, hf, atol=3e-4, rtol=1e-3)


def test_qwen25vl_image_chat_parity(tmp_path):
    """Full text + image + text prefill through InferenceContext (M-RoPE
    grid + trailing delta) vs the HF end-to-end forward."""
    d, model, hf_cfg = _tiny_qwen25vl(tmp_path)
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
    assert ctx.kv.mrope_delta[0] == -3
