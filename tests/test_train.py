"""Training tests (ggml-opt / tests/test-opt.cpp analog): the jitted
AdamW/SGD step reduces loss, overfits a tiny repeating dataset, and the
trained model exports/loads through GGUF."""

import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.llama import random_weights
from rrs_tpu.train.finetune import (TrainConfig, evaluate, make_dataset,
                                    train)


def _cfg():
    return ModelConfig(
        arch="qwen3", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, vocab_size=64, context_length=128,
        qk_norm=True)


def test_make_dataset():
    toks = list(range(100))
    batches = make_dataset(toks, seq_len=16, batch=2)
    assert all(b.shape == (2, 17) for b in batches)
    # each row is a contiguous slice
    for b in batches:
        for row in b:
            assert (np.diff(row) == 1).all()


def test_adamw_loss_decreases():
    cfg = _cfg()
    w = random_weights(cfg, seed=0, dtype=np.float32)
    rng = np.random.default_rng(0)
    # repeating pattern => learnable
    pattern = list(rng.integers(0, cfg.vocab_size, 16))
    toks = pattern * 40
    batches = make_dataset(toks, seq_len=16, batch=2, seed=1)[:8]
    before = evaluate(cfg, w, batches[:2])
    w2, losses = train(cfg, w, batches, TrainConfig(lr=3e-3), n_epochs=4)
    after = evaluate(cfg, w2, batches[:2])
    assert after < before * 0.7, (before, after, losses[:3], losses[-3:])


def test_chunked_steps_match_loop():
    """chunk_steps>1 (device-side lax.scan over optimizer steps) is the
    same optimization as the per-step loop."""
    cfg = _cfg()
    w = random_weights(cfg, seed=0, dtype=np.float32)
    rng = np.random.default_rng(1)
    toks = list(rng.integers(0, cfg.vocab_size, 600))
    batches = make_dataset(toks, seq_len=16, batch=2, seed=2)[:6]
    _, l1 = train(cfg, w, batches, TrainConfig(lr=1e-3))
    _, l2 = train(cfg, w, batches, TrainConfig(lr=1e-3), chunk_steps=3)
    np.testing.assert_allclose(l1, l2, rtol=2e-4, atol=2e-4)


def test_sgd_runs():
    cfg = _cfg()
    w = random_weights(cfg, seed=1, dtype=np.float32)
    toks = list(np.random.default_rng(2).integers(0, 64, 200))
    batches = make_dataset(toks, seq_len=8, batch=1)[:3]
    w2, losses = train(cfg, w, batches,
                       TrainConfig(optimizer="sgd", lr=1e-2, clip_norm=1.0))
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)


def test_quantized_leaves_frozen():
    """TCQ4 codes must be untouched by training (partition freezes ints)."""
    cfg = ModelConfig(
        arch="qwen3", n_layers=1, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=256, vocab_size=64, context_length=128,
        qk_norm=True)
    w = random_weights(cfg, seed=3, quantize=True)
    from rrs_tpu.models.linear import TCQ4Linear

    qlayers = [lw for lw in w.layers if isinstance(lw.wq, TCQ4Linear)]
    assert qlayers, "expected quantized projections"
    qs_before = np.asarray(qlayers[0].wq.qs).copy()
    toks = list(np.random.default_rng(4).integers(0, 64, 150))
    batches = make_dataset(toks, seq_len=8, batch=1)[:2]
    w2, _ = train(cfg, w, batches, TrainConfig(lr=1e-3))
    q2 = [lw for lw in w2.layers if isinstance(lw.wq, TCQ4Linear)]
    np.testing.assert_array_equal(np.asarray(q2[0].wq.qs), qs_before)


def test_finetune_roundtrip_gguf(tmp_path):
    """Train -> export GGUF -> reload -> same (lower) loss."""
    from rrs_tpu.models.export import export_random_gguf, export_weights_gguf
    from rrs_tpu.models.loader import load_model

    cfg = _cfg()
    vocab = [chr(33 + i) for i in range(cfg.vocab_size)]
    src = export_random_gguf(cfg, tmp_path / "src.gguf", seed=0,
                             vocab_tokens=vocab)
    cfg2, w, md = load_model(src, dtype=np.float32, fuse=False)
    toks = list(np.random.default_rng(0).integers(0, cfg.vocab_size, 16)) * 20
    batches = make_dataset(toks, seq_len=16, batch=2)[:4]
    w2, _ = train(cfg2, w, batches, TrainConfig(lr=3e-3), n_epochs=2)
    loss_trained = evaluate(cfg2, w2, batches[:2])

    out = export_weights_gguf(cfg2, w2, tmp_path / "trained.gguf", metadata=md)
    cfg3, w3, _ = load_model(out, dtype=np.float32, fuse=False)
    loss_reloaded = evaluate(cfg3, w3, batches[:2])
    assert abs(loss_reloaded - loss_trained) < 1e-3
