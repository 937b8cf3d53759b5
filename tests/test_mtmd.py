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


def test_gemma3_projector_roundtrip(tmp_path):
    """gemma3-projector mmproj GGUF (models/siglip.cpp
    PROJECTOR_TYPE_GEMMA3): avg-pool n_merge^2 patches per output token,
    RMSNorm * mm.soft_emb_norm, mm.input_projection."""
    from rrs_tpu.gguf.writer import GGUFWriter
    import jax.numpy as jnp

    e, f, dllm = 32, 64, 48
    rng = np.random.default_rng(3)
    w = GGUFWriter(tmp_path / "mmproj_g3.gguf")
    w.add_string("general.architecture", "clip")
    w.add_string("clip.projector_type", "gemma3")
    w.add_uint32("clip.vision.image_size", 56)
    w.add_uint32("clip.vision.patch_size", 14)
    w.add_uint32("clip.vision.projector.scale_factor", 2)
    w.add_uint32("clip.vision.embedding_length", e)
    w.add_uint32("clip.vision.block_count", 1)
    w.add_uint32("clip.vision.attention.head_count", 4)
    w.add_uint32("clip.vision.feed_forward_length", f)
    w.add_uint32("clip.vision.projection_dim", dllm)

    def t(name, shape):
        w.add_tensor(name,
                     (rng.standard_normal(shape) * 0.05).astype(np.float32))

    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((e, 3, 14, 14)) * 0.05
                  ).astype(np.float32))
    t("v.patch_embd.bias", (e,))
    t("v.position_embd.weight", (16, e))
    for nm in ("v.pre_ln", "v.post_ln"):
        t(f"{nm}.weight", (e,))
        t(f"{nm}.bias", (e,))
    p = "v.blk.0"
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
    t("mm.input_projection.weight", (e, dllm))   # [vision, text] (HF)
    t("mm.soft_emb_norm.weight", (e,))
    w.write()

    cfg, weights = load_mmproj(tmp_path / "mmproj_g3.gguf")
    assert cfg.projector_type == "gemma3" and cfg.n_merge == 2
    assert cfg.n_output_tokens == 4                  # (56/14/2)^2
    img = np.zeros((56, 56, 3), np.uint8)
    emb = np.asarray(encode_image(
        cfg, weights, jnp.asarray(preprocess_image(img, cfg))))
    assert emb.shape == (4, dllm) and np.isfinite(emb).all()


def test_gemma3_projector_hf_parity():
    """Full gemma3 vision path vs transformers: a tiny SiglipVisionModel
    tower + Gemma3MultiModalProjector must match encode_image to f32
    tolerance (the clip.cpp gemma3 graph, models/siglip.cpp:18-40)."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers import SiglipVisionConfig, SiglipVisionModel
    try:
        from transformers.models.gemma3.modeling_gemma3 import (
            Gemma3MultiModalProjector)
        from transformers import Gemma3Config
        from transformers.models.gemma3.configuration_gemma3 import (
            Gemma3TextConfig)
    except ImportError:
        pytest.skip("no gemma3 in transformers")
    import jax.numpy as jnp
    from rrs_tpu.mtmd.clip import ClipLayer, ClipWeights

    e, f, heads, img_sz, patch = 32, 64, 4, 56, 14
    dllm, n_merge = 48, 2
    vcfg = SiglipVisionConfig(
        hidden_size=e, intermediate_size=f, num_hidden_layers=1,
        num_attention_heads=heads, image_size=img_sz, patch_size=patch,
        hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(0)
    tower = SiglipVisionModel._from_config(
        vcfg, attn_implementation="eager").eval()

    gcfg = Gemma3Config(
        text_config=Gemma3TextConfig(
            hidden_size=dllm, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, num_key_value_heads=1, head_dim=8,
            vocab_size=64),
        # NOTE: pass a COPY — Gemma3Config mutates the vision config's
        # attn-implementation field, which would break the live tower
        vision_config=SiglipVisionConfig(**vcfg.to_dict()),
        mm_tokens_per_image=(img_sz // patch // n_merge) ** 2)
    proj = Gemma3MultiModalProjector(gcfg).eval()
    with torch.no_grad():
        proj.mm_input_projection_weight.normal_(0, 0.05)
        proj.mm_soft_emb_norm.weight.normal_(0, 0.1)

    # torch reference
    px = torch.randn(1, 3, img_sz, img_sz)
    with torch.no_grad():
        hs = tower(px).last_hidden_state                  # [1, P, e]
        want = proj(hs)[0].numpy()                        # [tokens, dllm]

    # our weights from the HF state dict
    sd = {k: v.numpy() for k, v in tower.state_dict().items()}
    pre = "vision_model.encoder.layers.0."
    def lw(k):
        return jnp.asarray(sd[pre + k])
    layer = ClipLayer(
        ln1_w=lw("layer_norm1.weight"), ln1_b=lw("layer_norm1.bias"),
        wq=lw("self_attn.q_proj.weight").T, bq=lw("self_attn.q_proj.bias"),
        wk=lw("self_attn.k_proj.weight").T, bk=lw("self_attn.k_proj.bias"),
        wv=lw("self_attn.v_proj.weight").T, bv=lw("self_attn.v_proj.bias"),
        wo=lw("self_attn.out_proj.weight").T,
        bo=lw("self_attn.out_proj.bias"),
        ln2_w=lw("layer_norm2.weight"), ln2_b=lw("layer_norm2.bias"),
        w_up=lw("mlp.fc1.weight").T, b_up=lw("mlp.fc1.bias"),
        w_down=lw("mlp.fc2.weight").T, b_down=lw("mlp.fc2.bias"))
    pw = sd["vision_model.embeddings.patch_embedding.weight"]  # [e,3,p,p]
    weights = ClipWeights(
        patch_w=jnp.asarray(pw.reshape(e, -1).T),
        patch_b=jnp.asarray(
            sd["vision_model.embeddings.patch_embedding.bias"]),
        pos_embd=jnp.asarray(
            sd["vision_model.embeddings.position_embedding.weight"]),
        pre_ln_w=None, pre_ln_b=None,
        post_ln_w=jnp.asarray(sd["vision_model.post_layernorm.weight"]),
        post_ln_b=jnp.asarray(sd["vision_model.post_layernorm.bias"]),
        layers=[layer],
        mm0_w=None, mm0_b=None, mm2_w=None, mm2_b=None,
        mm_input_proj=jnp.asarray(
            proj.mm_input_projection_weight.detach().numpy()),
        mm_soft_emb_norm=jnp.asarray(
            # HF Gemma3RMSNorm scales by (1 + weight)
            1.0 + proj.mm_soft_emb_norm.weight.detach().numpy()),
    )
    cfg = ClipConfig(image_size=img_sz, patch_size=patch, n_embd=e,
                     n_layers=1, n_heads=heads, n_ff=f, n_embd_llm=dllm,
                     eps=1e-6, projector_type="gemma3", n_merge=n_merge)
    # pixel values -> our flattened-patch form (C,ph,pw order)
    arr = px[0].permute(1, 2, 0).numpy()                 # HWC, normalized
    g = img_sz // patch
    patches = arr.reshape(g, patch, g, patch, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(g * g, 3 * patch * patch)
    got = np.asarray(encode_image(cfg, weights, jnp.asarray(patches)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
