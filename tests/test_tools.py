"""Tool-suite tests: export-lora merge, cvector generation, fit-params,
logging (tools/export-lora, tools/cvector-generator, tools/fit-params,
common/log.cpp analogs)."""

import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig, PRESETS


def _export_tiny(tmp_path, cfg, name="base.gguf"):
    from rrs_tpu.models.export import export_random_gguf

    vocab = [chr(33 + i) if 33 + i < 288 else f"<t{i}>"
             for i in range(cfg.vocab_size)]
    return export_random_gguf(cfg, tmp_path / name, seed=0,
                              vocab_tokens=vocab)


def _tiny_cfg():
    return ModelConfig(
        arch="qwen3", n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=128, context_length=256,
        qk_norm=True)


def test_export_lora_merge(tmp_path):
    from rrs_tpu.gguf.reader import read_gguf
    from rrs_tpu.gguf.writer import GGUFWriter
    from rrs_tpu.tools.export_lora import export_lora_merged

    cfg = _tiny_cfg()
    base = _export_tiny(tmp_path, cfg)

    rng = np.random.default_rng(0)
    r = 4
    lw = GGUFWriter(tmp_path / "adapter.gguf")
    lw.add_string("general.architecture", "qwen3")
    lw.add_float32("adapter.lora.alpha", 8.0)
    a = rng.standard_normal((r, cfg.n_embd)).astype(np.float32) * 0.1
    b = rng.standard_normal((cfg.n_q_dim, r)).astype(np.float32) * 0.1
    lw.add_tensor("blk.0.attn_q.weight.lora_a", a)
    lw.add_tensor("blk.0.attn_q.weight.lora_b", b)
    lw.write()

    out = export_lora_merged(base, tmp_path / "adapter.gguf",
                             tmp_path / "merged.gguf", scale=1.0)
    with read_gguf(base) as g0, read_gguf(out) as g1:
        w0 = g0.tensor("blk.0.attn_q.weight").astype(np.float32)
        w1 = g1.tensor("blk.0.attn_q.weight").astype(np.float32)
        eff = 8.0 / r
        np.testing.assert_allclose(w1, w0 + eff * (b @ a), rtol=1e-5, atol=1e-5)
        # untouched tensor passes through bit-identically
        u0 = g0.tensor("blk.1.attn_q.weight")
        u1 = g1.tensor("blk.1.attn_q.weight")
        np.testing.assert_array_equal(u0, u1)


def test_cvector_roundtrip(tmp_path):
    from rrs_tpu.models import llama as lm
    from rrs_tpu.tools.cvector import (build_control_vector,
                                       load_control_vector,
                                       save_control_vector)

    cfg = _tiny_cfg()
    w = lm.random_weights(cfg, seed=1)
    pos = [[1, 2, 3], [4, 5, 6, 7]]
    neg = [[9, 10], [11, 12, 13]]
    dirs = build_control_vector(cfg, w, pos, neg)
    assert dirs.shape == (cfg.n_layers, cfg.n_embd)
    assert np.abs(dirs).sum() > 0

    p = save_control_vector(tmp_path / "cv.gguf", dirs, model_hint="tiny")
    cv = load_control_vector(p, cfg.n_layers, cfg.n_embd, strength=0.5)
    np.testing.assert_allclose(np.asarray(cv.vectors), dirs, rtol=1e-6)

    # applying the vector changes the forward output
    import jax.numpy as jnp

    toks = jnp.asarray([[1, 2]], jnp.int32)
    pos_ = jnp.asarray([[0, 1]], jnp.int32)
    shape = (1, cfg.n_kv_heads, 8, cfg.head_dim)
    ks = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vs = [jnp.zeros_like(k) for k in ks]
    l0, _, _ = lm.forward(cfg, w, toks, pos_, ks, vs, pos_, pos_)
    l1, _, _ = lm.forward(cfg, w, toks, pos_, ks, vs, pos_, pos_,
                          control_vector=cv)
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() > 1e-6


def test_fit_params():
    from rrs_tpu.utils.fit_params import fit_params, model_bytes

    cfg = PRESETS["qwen3-4b"]
    mb = model_bytes(cfg)
    assert 2.0e9 < mb < 4.5e9           # ~4B params at ~4.6-8.5 bpw mix

    r = fit_params(cfg, hbm_bytes=16 * 1024**3, n_lanes=4)
    assert r.fits and r.n_ctx >= 4096
    # requesting more context than fits
    r2 = fit_params(cfg, hbm_bytes=4 * 1024**3, n_lanes=4, n_ctx=32768)
    assert not r2.fits
    # q8 KV doubles capacity vs bf16
    r3 = fit_params(cfg, hbm_bytes=16 * 1024**3, n_lanes=4, kv_quant="q8")
    assert r3.n_ctx >= r.n_ctx


def test_logging_sink():
    from rrs_tpu.utils import logging as ulog

    seen = []
    ulog.log_set(lambda lvl, line: seen.append((lvl, line)))
    try:
        ulog.set_level("info")
        log = ulog.get_logger("test")
        log.debug("hidden %d", 1)
        log.info("shown %d", 2)
        log.error("err")
    finally:
        ulog.log_set(None)
        ulog.set_level("info")
    assert len(seen) == 2
    assert "shown 2" in seen[0][1] and seen[1][0] == 40


def test_override_kv(tmp_path):
    """--override-kv (llama_model_kv_override, llama.h:266-277): metadata
    overrides apply before hparam interpretation."""
    import pytest

    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models.export import export_random_gguf
    from rrs_tpu.models.loader import load_model, parse_kv_overrides

    ov = parse_kv_overrides(["qwen3.rope.freq_base=float:777.0",
                             "qwen3.context_length=int:99",
                             "x.flag=bool:true", "x.name=str:hi"])
    assert ov == {"qwen3.rope.freq_base": 777.0, "qwen3.context_length": 99,
                  "x.flag": True, "x.name": "hi"}
    with pytest.raises(ValueError):
        parse_kv_overrides(["no-type-sep"])

    path = tmp_path / "m.gguf"
    export_random_gguf(PRESETS["tiny"], path, seed=0)
    cfg, _, _ = load_model(path, overrides=ov)
    assert cfg.rope_theta == 777.0 and cfg.context_length == 99
