"""Pixtral vision tower parity (clip-impl.h PROJECTOR_TYPE_PIXTRAL):
RMSNorm ViT + interleaved-ladder 2D rotary + silu-gated MLP + the LLaVA
mm.1/mm.2 projector, converted from an HF Llava(Pixtral) checkpoint and
compared against PixtralVisionModel + LlavaMultiModalProjector."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rrs_tpu.tools.convert_hf import convert_hf_mmproj


def _tiny_llava_pixtral(tmp_path):
    vc = dict(model_type="pixtral", hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=2, num_channels=3,
              image_size=64, patch_size=4, rope_theta=10000.0, head_dim=16)
    tc = dict(model_type="llama", vocab_size=64, hidden_size=48,
              intermediate_size=96, num_hidden_layers=1,
              num_attention_heads=4, num_key_value_heads=2,
              max_position_embeddings=128)
    cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=32,
        vision_feature_layer=-1, vision_feature_select_strategy="full",
        projector_hidden_act="gelu")
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))
    return d, model


def test_pixtral_tower_and_projector_parity(tmp_path):
    d, model = _tiny_llava_pixtral(tmp_path)
    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")

    from rrs_tpu.mtmd.clip import (encode_image_pixtral, load_mmproj,
                                   preprocess_image_qwen2vl)

    ccfg, cw = load_mmproj(mm)
    assert ccfg.projector_type == "pixtral"
    assert ccfg.n_embd == 32 and ccfg.n_embd_llm == 48
    assert cw.layers[0].w_gate is not None

    rng = np.random.default_rng(3)
    raw = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    # pixtral: patch raster, no merge (spatial_merge=1 -> unit=patch)
    assert ccfg.spatial_merge == 1
    patches, (gh, gw) = preprocess_image_qwen2vl(raw, ccfg)
    assert (gh, gw) == (4, 6)
    import jax.numpy as jnp

    ours = np.asarray(encode_image_pixtral(
        ccfg, cw, jnp.asarray(patches), (gh, gw), insert_breaks=False))

    normed = (raw - np.asarray(ccfg.image_mean)) / np.asarray(ccfg.image_std)
    px = torch.tensor(normed.transpose(2, 0, 1)[None], dtype=torch.float32)
    with torch.no_grad():
        tower = model.model.vision_tower(
            px, image_sizes=torch.tensor([[16, 24]]))
        hidden = tower.last_hidden_state if hasattr(
            tower, "last_hidden_state") else tower[0]
        hf = model.model.multi_modal_projector(
            hidden.reshape(-1, 32)).float().numpy()
    assert ours.shape == hf.shape == (24, 48)
    np.testing.assert_allclose(ours, hf, atol=3e-4, rtol=1e-3)


def test_pixtral_img_break_rows(tmp_path):
    """insert_breaks appends the learned [IMG_BREAK] row after each patch
    row (the mtmd pixtral token stream)."""
    d, model = _tiny_llava_pixtral(tmp_path)
    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")

    from rrs_tpu.mtmd.clip import (encode_image_pixtral, load_mmproj,
                                   preprocess_image_qwen2vl)
    import dataclasses
    import jax.numpy as jnp

    ccfg, cw = load_mmproj(mm)
    rng = np.random.default_rng(4)
    raw = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    patches, (gh, gw) = preprocess_image_qwen2vl(raw, ccfg)
    brk = jnp.asarray(np.linspace(-1, 1, ccfg.n_embd_llm), jnp.float32)
    cw = dataclasses.replace(cw, img_break=brk)
    out = np.asarray(encode_image_pixtral(
        ccfg, cw, jnp.asarray(patches), (gh, gw)))
    # reference count (pixtral.cpp:70): gh*gw patches + gh-1 breaks — no
    # break after the final row (the [IMG_END] text token follows it)
    assert out.shape == (gh * gw + gh - 1, ccfg.n_embd_llm)
    for r in range(gh - 1):
        np.testing.assert_allclose(out[r * (gw + 1) + gw], np.asarray(brk))
