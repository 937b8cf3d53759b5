"""Product-surface tensor parallelism: InferenceContext(mesh=...) and the
serving engine on a sharded context must reproduce single-device results
(the user-facing analog of --split-mode row, llama.h:193-197)."""

import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig, PRESETS
from rrs_tpu.models import llama as llama_model
from rrs_tpu.parallel.sharding import make_mesh
from rrs_tpu.runtime.context import InferenceContext


def _cfg():
    # local K shards (heads*head_dim/tp, n_ff/tp) stay 256-aligned at tp=4
    return ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=512, context_length=128,
        qk_norm=True,
    )


def test_tp_context_matches_single_device():
    cfg = _cfg()
    w = llama_model.random_weights(cfg, seed=3, quantize=True)

    ref = InferenceContext(cfg, w, n_lanes=2, max_seq=64)
    mesh = make_mesh(8, dp=2)
    tpc = InferenceContext(cfg, w, n_lanes=2, max_seq=64, mesh=mesh)

    prompt = [1, 2, 3, 4, 5]
    sr = ref.new_sequence()
    st = tpc.new_sequence()
    lr = ref.prefill(sr, prompt)
    lt = tpc.prefill(st, prompt)
    assert lt.shape == lr.shape
    np.testing.assert_allclose(lt, lr, rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(lt.argmax(-1), lr.argmax(-1))

    # several decode steps through the public API
    tok_r, tok_t = int(lr[-1].argmax()), int(lt[-1].argmax())
    for _ in range(4):
        dr = ref.decode({sr: tok_r})[sr]
        dt = tpc.decode({st: tok_t})[st]
        # bf16 + different psum reduction order: wider elementwise band,
        # but the greedy decision must agree
        np.testing.assert_allclose(dt, dr, rtol=1e-1, atol=1e-1)
        tok_r, tok_t = int(dr.argmax()), int(dt.argmax())
        assert tok_r == tok_t


def test_tp_context_q8_kv():
    cfg = _cfg()
    w = llama_model.random_weights(cfg, seed=5, quantize=True)
    ref = InferenceContext(cfg, w, n_lanes=1, max_seq=64, kv_quant="q8")
    mesh = make_mesh(8, dp=1)       # tp=8: kv heads 4 not divisible -> tp=4
    mesh = make_mesh(4, dp=1)
    tpc = InferenceContext(cfg, w, n_lanes=1, max_seq=64, kv_quant="q8",
                           mesh=mesh)
    prompt = [7, 8, 9]
    sr, st = ref.new_sequence(), tpc.new_sequence()
    lr = ref.prefill(sr, prompt)
    lt = tpc.prefill(st, prompt)
    np.testing.assert_allclose(lt, lr, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(lt[-1].argmax(), lr[-1].argmax())


def test_engine_serves_on_tp_context():
    from rrs_tpu.runtime.sampler import SamplerParams
    from rrs_tpu.serving.engine import Engine, GenRequest

    cfg = _cfg()
    w = llama_model.random_weights(cfg, seed=4, quantize=True)
    mesh = make_mesh(8, dp=2)
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=64, mesh=mesh)
    eng = Engine(ctx)
    out, done = [], {}

    def on_token(tok, piece, finished, reason):
        if finished:
            done["r"] = reason
        elif tok is not None:
            out.append(tok)

    eng.submit(GenRequest(prompt_tokens=[1, 2, 3], max_tokens=4,
                          params=SamplerParams(temperature=0.0),
                          on_token=on_token))
    for _ in range(100):
        eng._iterate()
        if done:
            break
    assert done.get("r") in ("stop", "length")
    assert len(out) == 4

    # fresh single-device engine agrees
    ref = InferenceContext(cfg, w, n_lanes=2, max_seq=64)
    eng2 = Engine(ref)
    out2, done2 = [], {}

    def on_token2(tok, piece, finished, reason):
        if finished:
            done2["r"] = reason
        elif tok is not None:
            out2.append(tok)

    eng2.submit(GenRequest(prompt_tokens=[1, 2, 3], max_tokens=4,
                           params=SamplerParams(temperature=0.0),
                           on_token=on_token2))
    for _ in range(100):
        eng2._iterate()
        if done2:
            break
    assert out == out2


def test_tp_embed_and_embd_prefill_match_single_device():
    """embed() (llama_encode pooling analog) and prefill_embeds() (the
    multimodal llama_batch.embd path) under a (dp, tp) mesh reproduce the
    single-device results."""
    cfg = _cfg()
    w = llama_model.random_weights(cfg, seed=7, quantize=True)
    ref = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    mesh = make_mesh(4, dp=1)
    tpc = InferenceContext(cfg, w, n_lanes=1, max_seq=64, mesh=mesh)

    toks = [3, 1, 4, 1, 5, 9]
    for pooling in ("mean", "last"):
        er = ref.embed(toks, pooling=pooling)
        et = tpc.embed(toks, pooling=pooling)
        np.testing.assert_allclose(et, er, rtol=3e-2, atol=3e-2)

    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((4, cfg.n_embd)).astype(np.float32) * 0.1
    sr = ref.new_sequence()
    st = tpc.new_sequence()
    lr = ref.prefill_embeds(sr, embeds)
    lt = tpc.prefill_embeds(st, embeds)
    assert lt.shape == lr.shape
    np.testing.assert_allclose(lt, lr, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(lt[-1].argmax(), lr[-1].argmax())
    # the KV written by the embd prefill is consistent: decode continues.
    # Random embeds give near-tied logits, so exact argmax equality is
    # brittle against f32 reduction-order differences (TP psum tree vs
    # the single-device K-chunk accumulation); assert closeness plus
    # that each side's top-1 is within noise of the other's max.
    dr = ref.decode({sr: 2})[sr]
    dt = tpc.decode({st: 2})[st]
    np.testing.assert_allclose(dt, dr, rtol=5e-2, atol=7e-2)
    assert dr[dt.argmax()] >= dr.max() - 0.1
    assert dt[dr.argmax()] >= dt.max() - 0.1


def test_tp_context_moe_matches_single_device(tmp_path):
    """MoE under shard_map TP: the dense expert stacks follow the megatron
    pairing (F sharded), so the routed output and the shared-expert pair
    must psum over tp — covers both the gather path (decode, n_tok<=16)
    and the dense all-experts path (prefill, n_tok>16)."""
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.export import export_random_gguf
    from rrs_tpu.models.loader import load_model

    cfg0 = ModelConfig(
        arch="qwen3moe", n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=256, vocab_size=512, context_length=128,
        qk_norm=True, n_experts=4, n_experts_used=2, n_ff_exp=64,
        norm_topk_prob=True)
    path = tmp_path / "moe.gguf"
    export_random_gguf(cfg0, path, seed=13)
    cfg, w, _ = load_model(path, fuse=False)

    ref = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    tpc = InferenceContext(cfg, w, n_lanes=1, max_seq=64,
                           mesh=make_mesh(2, dp=1))

    prompt = list(range(1, 20))           # 19 tokens: dense all-experts path
    sr, st = ref.new_sequence(), tpc.new_sequence()
    lr = ref.prefill(sr, prompt)
    lt = tpc.prefill(st, prompt)
    np.testing.assert_allclose(lt, lr, rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(lt.argmax(-1), lr.argmax(-1))

    tok = int(lr[-1].argmax())
    for _ in range(3):                    # decode: gather path
        dr = ref.decode({sr: tok})[sr]
        dt = tpc.decode({st: tok})[st]
        np.testing.assert_allclose(dt, dr, rtol=1e-1, atol=1e-1)
        assert int(dr.argmax()) == int(dt.argmax())
        tok = int(dr.argmax())


def test_tp_context_mxfp4_model(tmp_path):
    """MXFP4 weights (2D attn projections via quantize --type mxfp4 AND
    stacked MoE experts) through the TP product surface: sharded context
    reproduces the single-device greedy decisions."""
    from rrs_tpu.gguf.constants import GGMLType
    from rrs_tpu.models.export import export_random_gguf
    from rrs_tpu.models.loader import load_model
    from rrs_tpu.quantize.quantizer import quantize_model

    cfg0 = ModelConfig(
        arch="qwen3moe", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=96, context_length=128,
        qk_norm=True, n_experts=4, n_experts_used=2, n_ff_exp=64,
        norm_topk_prob=True)
    f32 = tmp_path / "f32.gguf"
    export_random_gguf(cfg0, f32, seed=13,
                       expert_ggml_type=GGMLType.MXFP4)
    mx = tmp_path / "mx.gguf"
    quantize_model(str(f32), str(mx), out_type="mxfp4", verbose=False)

    cfg, w, _ = load_model(mx, fuse=False)
    from rrs_tpu.models.linear import MXFP4Linear

    assert isinstance(w.layers[0].wq, MXFP4Linear)
    assert w.layers[0].moe.quant_kind == "mxfp4"

    ref = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    tpc = InferenceContext(cfg, w, n_lanes=1, max_seq=64,
                           mesh=make_mesh(2, dp=1))
    prompt = [1, 2, 3]
    sr, st = ref.new_sequence(), tpc.new_sequence()
    lr = np.asarray(ref.prefill(sr, prompt))
    lt = np.asarray(tpc.prefill(st, prompt))
    np.testing.assert_allclose(lt, lr, rtol=5e-2, atol=5e-2)
    tok = int(lr[-1].argmax())
    assert int(lt[-1].argmax()) == tok
    for _ in range(3):
        dr = ref.decode({sr: tok})[sr]
        dt = tpc.decode({st: tok})[st]
        np.testing.assert_allclose(dt, dr, rtol=1e-1, atol=1e-1)
        assert int(dt.argmax()) == int(dr.argmax())
        tok = int(dr.argmax())


def test_tp_multimodal_mrope_matches_single_device():
    """M-RoPE image chunks + trailing text under a tp mesh (round 5;
    previously NotImplementedError): the [B, T, 3] rope rows are
    replicated over tp and the embedding chunk enters the sharded LLM
    like text (mtmd.h:110-210 injection contract)."""
    cfg = ModelConfig(
        arch="qwen2vl", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=512, context_length=128,
        rope_sections=(32, 16, 16),
    )
    w = llama_model.random_weights(cfg, seed=11, quantize=True)
    rng = np.random.default_rng(0)
    chunk = rng.standard_normal((6, cfg.n_embd)).astype(np.float32) * 0.02
    grid = (2, 3)
    pre, post = [3, 17, 42, 100], [5, 99, 7]

    def run(mesh):
        ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=64, mesh=mesh)
        seq = ctx.new_sequence()
        l_pre = ctx.prefill(seq, pre)
        l_img = ctx.prefill_embeds(seq, chunk, mrope_grid=grid)
        l_post = ctx.prefill(seq, post)
        assert ctx.kv.mrope_delta[ctx.kv.lane_of(seq)] == -3
        dec = ctx.decode({seq: int(l_post[-1].argmax())})[seq]
        return np.concatenate([l_pre, l_img, l_post], axis=0), dec

    ref, ref_dec = run(None)
    # dp=1: per-shard batch == full batch, so only tp reduction order
    # differs -> tight band. dp=2 shards lanes (per-shard B=1) and XLA's
    # CPU codegen is batch-shape-dependent in bf16 (~0.2 absolute on
    # these random-init logits) -> decision-level check only.
    got, got_dec = run(make_mesh(2, dp=1))
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(got_dec, ref_dec, rtol=1e-1, atol=1e-1)
    assert int(got_dec.argmax()) == int(ref_dec.argmax())

    got2, got2_dec = run(make_mesh(4, dp=2))
    np.testing.assert_allclose(got2, ref, rtol=3e-1, atol=3e-1)
    assert (got2.argmax(-1) == ref.argmax(-1)).mean() > 0.85
    assert int(got2_dec.argmax()) == int(ref_dec.argmax())


def test_tp_seq_div_decode_matches_single_device():
    """seq_div'd lanes decode correctly under a mesh: the remapped rope
    rows ride the tp step's pos_row operand (round 5; previously the
    mesh path silently used slot positions)."""
    cfg = _cfg()
    w = llama_model.random_weights(cfg, seed=13, quantize=True)
    toks = [3, 1, 4, 1, 5, 9, 2, 6]

    def run(mesh):
        ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=64, mesh=mesh)
        seq = ctx.new_sequence()
        ctx.prefill(seq, toks, all_logits=False)
        ctx.kv.seq_div(cfg, seq, 0, 1 << 30, 2)
        return ctx.decode({seq: 7})[seq]

    ref = run(None)
    got = run(make_mesh(4, dp=2))
    np.testing.assert_allclose(got, ref, rtol=1e-1, atol=1e-1)
    assert int(got.argmax()) == int(ref.argmax())
