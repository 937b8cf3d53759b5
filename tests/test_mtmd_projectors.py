"""Round-5 projector breadth (clip-impl.h:206-236): Idefics3 pixel
shuffle + fc, InternVL CLS/layer-scale ViT + pixel shuffle + MLP (both vs
HF oracles), and the MiniCPM-V perceiver resampler (structural — no HF
class without remote code)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rrs_tpu.tools.convert_hf import convert_hf_mmproj


def _norm_img(rng, hw):
    from rrs_tpu.mtmd.clip import ClipConfig

    raw = rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32)
    cc = ClipConfig()
    normed = (raw - np.asarray(cc.image_mean)) / np.asarray(cc.image_std)
    return raw, normed.astype(np.float32)


def test_idefics3_projector_parity(tmp_path):
    vc = transformers.Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8)
    cfg = transformers.Idefics3Config(
        vision_config=vc, scale_factor=2,
        text_config=dict(hidden_size=48, intermediate_size=96,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2, vocab_size=128,
                         rms_norm_eps=1e-6))
    torch.manual_seed(0)
    model = transformers.Idefics3ForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))

    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")
    from rrs_tpu.mtmd.clip import encode_image, load_mmproj, preprocess_image

    ccfg, cw = load_mmproj(mm)
    assert ccfg.projector_type == "idefics3" and ccfg.n_merge == 2

    rng = np.random.default_rng(0)
    raw, normed = _norm_img(rng, 32)
    patches = encode = preprocess_image(raw, ccfg)
    import jax.numpy as jnp

    ours = np.asarray(encode_image(ccfg, cw, jnp.asarray(patches)))

    px = torch.tensor(normed.transpose(2, 0, 1)[None], dtype=torch.float32)
    with torch.no_grad():
        vit = model.model.vision_model(px).last_hidden_state
        hf = model.model.connector(vit)[0].float().numpy()
    assert ours.shape == hf.shape == (4, 48)
    np.testing.assert_allclose(ours, hf, atol=3e-4, rtol=1e-3)


def test_internvl_projector_parity(tmp_path):
    vc = transformers.InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8)
    cfg = transformers.InternVLConfig(
        vision_config=vc, downsample_ratio=0.5,
        text_config=dict(model_type="qwen2", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=128))
    torch.manual_seed(0)
    model = transformers.InternVLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))

    mm = convert_hf_mmproj(d, tmp_path / "mmproj.gguf")
    from rrs_tpu.mtmd.clip import encode_image, load_mmproj, preprocess_image

    ccfg, cw = load_mmproj(mm)
    assert ccfg.projector_type == "internvl" and ccfg.n_merge == 2
    assert cw.cls_embd is not None
    assert cw.layers[0].ls1 is not None

    rng = np.random.default_rng(1)
    raw, normed = _norm_img(rng, 32)
    patches = preprocess_image(raw, ccfg)
    import jax.numpy as jnp

    ours = np.asarray(encode_image(ccfg, cw, jnp.asarray(patches)))

    px = torch.tensor(normed.transpose(2, 0, 1)[None], dtype=torch.float32)
    with torch.no_grad():
        hf = model.model.get_image_features(
            px, vision_feature_layer=-1,
            vision_feature_select_strategy="default")[0].float().numpy()
    assert ours.shape == hf.shape == (4, 48)
    np.testing.assert_allclose(ours, hf, atol=3e-4, rtol=1e-3)


def test_minicpmv_resampler_structural(tmp_path):
    """Resampler output: [query_num, n_embd_llm] regardless of input
    grid; sincos table matches the reference formula (minicpmv.cpp:47-68:
    [sin(wx) | cos(wx) | sin(wy) | cos(wy)] over Ep/4 freqs); attention
    rows are a convex combination (softmax) of value projections."""
    import jax.numpy as jnp

    from rrs_tpu.gguf.writer import GGUFWriter
    from rrs_tpu.mtmd.clip import (_sincos_2d, encode_image_minicpmv,
                                   load_mmproj)

    rng = np.random.default_rng(0)
    e, ep, llm, q = 32, 256, 48, 8
    p, img = 8, 32
    g = img // p
    w = GGUFWriter(tmp_path / "mm.gguf")
    w.add_string("general.architecture", "clip")
    w.add_string("clip.projector_type", "resampler")
    w.add_uint32("clip.minicpmv_query_num", q)
    w.add_uint32("clip.vision.image_size", img)
    w.add_uint32("clip.vision.patch_size", p)
    w.add_uint32("clip.vision.embedding_length", e)
    w.add_uint32("clip.vision.block_count", 1)
    w.add_uint32("clip.vision.attention.head_count", 2)
    w.add_uint32("clip.vision.feed_forward_length", 64)
    w.add_uint32("clip.vision.projection_dim", llm)

    def add(name, *shape):
        w.add_tensor(name, (rng.standard_normal(shape) * 0.05)
                     .astype(np.float32))

    add("v.patch_embd.weight", e, 3, p, p)
    add("v.patch_embd.bias", e)
    add("v.position_embd.weight", g * g, e)
    for nm in ("ln1", "ln2"):
        add(f"v.blk.0.{nm}.weight", e)
        add(f"v.blk.0.{nm}.bias", e)
    for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
        add(f"v.blk.0.{nm}.weight", e, e)
        add(f"v.blk.0.{nm}.bias", e)
    add("v.blk.0.ffn_up.weight", 64, e)
    add("v.blk.0.ffn_up.bias", 64)
    add("v.blk.0.ffn_down.weight", e, 64)
    add("v.blk.0.ffn_down.bias", e)
    add("resampler.query", q, ep)
    add("resampler.kv.weight", ep, e)
    for nm in ("ln_q", "ln_kv", "ln_post"):
        add(f"resampler.{nm}.weight", ep)
        add(f"resampler.{nm}.bias", ep)
    for nm in ("q", "k", "v", "out"):
        add(f"resampler.attn.{nm}.weight", ep, ep)
        add(f"resampler.attn.{nm}.bias", ep)
    add("resampler.proj.weight", ep, llm)
    w.write()

    ccfg, cw = load_mmproj(tmp_path / "mm.gguf")
    assert ccfg.projector_type == "resampler" and ccfg.query_num == q
    patches = (rng.standard_normal((g * g, 3 * p * p)) * 0.1
               ).astype(np.float32)
    out = np.asarray(encode_image_minicpmv(ccfg, cw, jnp.asarray(patches)))
    assert out.shape == (q, llm)
    assert np.isfinite(out).all()

    # sincos table spot check
    tab = _sincos_2d(ep, 2, 3)
    assert tab.shape == (6, ep)
    om = 1.0 / (10000.0 ** (np.arange(ep // 4) / (ep // 4)))
    np.testing.assert_allclose(tab[5, :ep // 4], np.sin(2 * om), atol=1e-6)
    np.testing.assert_allclose(tab[5, ep // 2:3 * ep // 4],
                               np.sin(1 * om), atol=1e-6)
