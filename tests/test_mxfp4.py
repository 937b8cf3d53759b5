"""MXFP4 packed compute path (the gpt-oss native expert format).

The reference dequantizes/matmuls MXFP4 on CUDA (dequantize_row_mxfp4,
ggml-quants.c:421-439; MMQ tile loaders). Here the packed 4.25-bpw payload
stays in HBM and the Pallas kernels dequantize in VMEM
(ops/mxfp4_matmul.py) — required for gpt-oss-20B to fit a 16 GB chip at
all. These tests pin: bit-exact device repack, kernel-vs-oracle parity,
the MoE decode/prefill paths, and the GGUF loader keeping experts packed.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rrs_tpu.formats.kquants import dequantize_mxfp4, quantize_mxfp4
from rrs_tpu.ops.mxfp4_matmul import (
    dequant_mxfp4_jnp, mxfp4_matmul, mxfp4_matmul_experts_rows,
    mxfp4_matmul_ref, pack_mxfp4_device)


def _random_mxfp4(rng, n, k):
    w = rng.standard_normal((n, k)).astype(np.float32)
    raw = quantize_mxfp4(w)
    wd = dequantize_mxfp4(raw, n * k).reshape(n, k)
    return raw, wd


def test_pack_device_layout_bit_exact():
    rng = np.random.default_rng(0)
    n, k = 272, 320                      # N not a lane multiple: tests padding
    raw, wd = _random_mxfp4(rng, n, k)
    qs, sc = pack_mxfp4_device(raw, (n, k))
    assert qs.shape == (k // 2, 384) and sc.shape == (k // 32, 384)
    wd2 = np.asarray(dequant_mxfp4_jnp(jnp.asarray(qs), jnp.asarray(sc)))
    np.testing.assert_array_equal(wd2[:, :n].T, wd)
    assert (wd2[:, n:] == 0).all()       # pad columns dequantize to zero


def test_kernel_matches_oracle():
    rng = np.random.default_rng(1)
    n, k = 272, 320
    raw, wd = _random_mxfp4(rng, n, k)
    qs, sc = pack_mxfp4_device(raw, (n, k))
    for m in (1, 4, 33):                 # gemv, small, multi-row-block
        a = rng.standard_normal((m, k)).astype(np.float32)
        want = a @ wd.T
        got = np.asarray(mxfp4_matmul(
            jnp.asarray(a), jnp.asarray(qs), jnp.asarray(sc),
            interpret=True))[:, :n]
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 2e-2, (m, rel)      # bf16 dot rounding only
        got_ref = np.asarray(mxfp4_matmul_ref(
            jnp.asarray(a), jnp.asarray(qs), jnp.asarray(sc)))[:, :n]
        np.testing.assert_allclose(got_ref, want, rtol=5e-3, atol=1e-4)


def test_experts_rows_kernel():
    rng = np.random.default_rng(2)
    n, k, n_exp = 272, 320, 4
    raws = [_random_mxfp4(rng, n, k) for _ in range(n_exp)]
    packed = [pack_mxfp4_device(r, (n, k)) for r, _ in raws]
    qs_all = jnp.asarray(np.stack([p[0] for p in packed]))
    sc_all = jnp.asarray(np.stack([p[1] for p in packed]))
    ids = np.array([2, 0, 3, 3, 1], np.int32)
    a = rng.standard_normal((len(ids), k)).astype(np.float32)
    got = np.asarray(mxfp4_matmul_experts_rows(
        jnp.asarray(a), qs_all, sc_all, jnp.asarray(ids),
        interpret=True))[:, :n]
    want = np.stack([a[i] @ raws[e][1].T for i, e in enumerate(ids)])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_all_experts_kernel():
    from rrs_tpu.ops.mxfp4_matmul import mxfp4_matmul_all_experts

    rng = np.random.default_rng(5)
    n, k, n_exp, t = 272, 320, 3, 5            # t not a multiple of 8
    raws = [_random_mxfp4(rng, n, k) for _ in range(n_exp)]
    packed = [pack_mxfp4_device(r, (n, k)) for r, _ in raws]
    qs_all = jnp.asarray(np.stack([p[0] for p in packed]))
    sc_all = jnp.asarray(np.stack([p[1] for p in packed]))
    # shared activations [T, K]
    a = rng.standard_normal((t, k)).astype(np.float32)
    got = np.asarray(mxfp4_matmul_all_experts(
        jnp.asarray(a), qs_all, sc_all, interpret=True))[:, :, :n]
    want = np.stack([a @ wd.T for _, wd in raws])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel
    # per-expert activations [E, T, K]
    ae = rng.standard_normal((n_exp, t, k)).astype(np.float32)
    got = np.asarray(mxfp4_matmul_all_experts(
        jnp.asarray(ae), qs_all, sc_all, interpret=True))[:, :, :n]
    want = np.stack([ae[i] @ wd.T for i, (_, wd) in enumerate(raws)])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_linear_apply_mxfp4():
    from rrs_tpu.models.linear import MXFP4Linear, linear_apply

    rng = np.random.default_rng(3)
    n, k = 272, 320
    raw, wd = _random_mxfp4(rng, n, k)
    bias = rng.standard_normal((n,)).astype(np.float32)
    lin = MXFP4Linear.from_gguf(raw, (n, k), bias=bias)
    assert lin.shape == (k, n)
    x = rng.standard_normal((3, k)).astype(np.float32)
    y = np.asarray(linear_apply(lin, jnp.asarray(x)))
    want = x @ wd.T + bias
    np.testing.assert_allclose(y, want, rtol=2e-2, atol=2e-2)
    assert y.shape == (3, n)             # pad sliced off


def _moe_pair(cfg, rng):
    """(packed-mxfp4 MoEWeights, dense MoEWeights over the SAME dequantized
    values) — outputs must agree up to bf16 dot rounding."""
    import dataclasses

    from rrs_tpu.models.moe import MoEWeights

    e, fe, nE = cfg.n_embd, cfg.n_ff_exp, cfg.n_experts
    router = jnp.asarray(rng.standard_normal((e, nE)).astype(np.float32))

    def stack(n_out, k_in):
        raws, deqs = [], []
        for _ in range(nE):
            raw, wd = _random_mxfp4(rng, n_out, k_in)
            raws.append(raw)
            deqs.append(wd.T)                      # [K_in, N_out]
        packed = [pack_mxfp4_device(r, (n_out, k_in)) for r in raws]
        qs = jnp.asarray(np.stack([p[0] for p in packed]))
        sc = jnp.asarray(np.stack([p[1] for p in packed]))
        return (qs, sc), jnp.asarray(np.stack(deqs), jnp.bfloat16)

    (gq, ge), gd = stack(fe, e)
    (uq, ue), ud = stack(fe, e)
    (dq, de), dd = stack(e, fe)
    packed = MoEWeights(router=router, gate=None, up=None, down=None,
                        gate_qs=gq, gate_eff=ge, up_qs=uq, up_eff=ue,
                        down_qs=dq, down_eff=de, quant_kind="mxfp4")
    dense = MoEWeights(router=router, gate=gd, up=ud, down=dd)
    return packed, dense


def test_moe_ffn_mxfp4_decode_and_prefill():
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.moe import moe_ffn

    cfg = ModelConfig(
        arch="gpt-oss", n_layers=1, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=256, vocab_size=64, context_length=64,
        n_experts=4, n_experts_used=2, n_ff_exp=192, moe_act="swiglu_oai",
        expert_softmax_weight=True)
    rng = np.random.default_rng(4)
    packed, dense = _moe_pair(cfg, rng)

    for t_len in (2, 24, 80):   # rows kernel / all-experts / prefill scan
        x = jnp.asarray(
            rng.standard_normal((1, t_len, cfg.n_embd)).astype(np.float32)
            * 0.3, jnp.bfloat16)
        yp = np.asarray(moe_ffn(cfg, packed, x), np.float32)
        yd = np.asarray(moe_ffn(cfg, dense, x), np.float32)
        scale_ref = np.abs(yd).max() + 1e-6
        assert np.abs(yp - yd).max() / scale_ref < 6e-2, t_len


def test_moe_capacity_overflow_fallback():
    """Skewed routing that exceeds the static expert capacity must take the
    exact dense-scan fallback (lax.cond) and still match the dense MoE."""
    import dataclasses

    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.moe import moe_ffn

    cfg = ModelConfig(
        arch="gpt-oss", n_layers=1, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=256, vocab_size=64, context_length=64,
        n_experts=8, n_experts_used=2, n_ff_exp=192, moe_act="swiglu_oai",
        expert_softmax_weight=True)
    rng = np.random.default_rng(7)
    packed, dense = _moe_pair(cfg, rng)
    # bias the router hard toward experts 0/1: every token routes there,
    # counts ~ n_tok > cap=64
    bias = np.zeros((cfg.n_embd, cfg.n_experts), np.float32)
    bias[:, 0] = 0.5
    bias[:, 1] = 0.4
    router = jnp.asarray(bias)
    packed = dataclasses.replace(packed, router=router)
    dense = dataclasses.replace(dense, router=router)
    x = jnp.asarray(
        rng.standard_normal((1, 96, cfg.n_embd)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    yp = np.asarray(moe_ffn(cfg, packed, x), np.float32)
    yd = np.asarray(moe_ffn(cfg, dense, x), np.float32)
    assert np.abs(yp - yd).max() / (np.abs(yd).max() + 1e-6) < 6e-2


def test_loader_keeps_mxfp4_experts_packed(tmp_path):
    from rrs_tpu.gguf.constants import GGMLType
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.export import export_random_gguf
    from rrs_tpu.models.loader import load_model
    from rrs_tpu.runtime.context import InferenceContext

    cfg0 = ModelConfig(
        arch="qwen3moe", n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=256, vocab_size=512, context_length=128,
        qk_norm=True, n_experts=4, n_experts_used=2, n_ff_exp=64,
        norm_topk_prob=True)
    path = tmp_path / "moe_mxfp4.gguf"
    export_random_gguf(cfg0, path, seed=11,
                       expert_ggml_type=GGMLType.MXFP4)
    cfg, w, _ = load_model(path, fuse=False)
    mw = w.layers[0].moe
    assert mw.quant_kind == "mxfp4" and mw.gate is None
    assert mw.gate_qs.dtype == jnp.uint8

    # the packed forward tracks a dense load of the same file (the loader's
    # bf16-dequant fallback path, forced by dequantizing by hand)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    seq = ctx.new_sequence()
    logits = ctx.prefill(seq, [1, 2, 3, 4, 5])
    assert np.isfinite(np.asarray(logits)).all()
    d = ctx.decode({seq: int(np.asarray(logits[-1]).argmax())})[seq]
    assert np.isfinite(np.asarray(d)).all()
