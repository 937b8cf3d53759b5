"""Mamba / recurrent-memory tests (ggml_ssm_conv / ggml_ssm_scan +
llama-memory-recurrent analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import mamba as mamba_model
from rrs_tpu.ops.ssm import ssm_conv, ssm_scan, ssm_scan_ref, ssm_step
from rrs_tpu.runtime.recurrent import RecurrentCache, RecurrentContext, make_context


def _cfg(**kw):
    base = dict(arch="mamba", n_layers=2, n_embd=64, n_heads=0, n_kv_heads=0,
                head_dim=0, n_ff=0, vocab_size=128, context_length=512,
                ssm_d_conv=4, ssm_d_inner=128, ssm_d_state=16, ssm_dt_rank=8)
    base.update(kw)
    return ModelConfig(**base)


def test_ssm_scan_matches_sequential_ref():
    rng = np.random.default_rng(0)
    b, t, d, n = 2, 9, 16, 8
    h0 = rng.standard_normal((b, d, n)).astype(np.float32) * 0.1
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    dt = rng.standard_normal((b, t, d)).astype(np.float32)
    A = -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.3)
    Bc = rng.standard_normal((b, t, n)).astype(np.float32)
    Cc = rng.standard_normal((b, t, n)).astype(np.float32)
    y, h = ssm_scan(*map(jnp.asarray, (h0, x, dt, A, Bc, Cc)))
    y_ref, h_ref = ssm_scan_ref(h0, x, dt, A, Bc, Cc)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=2e-4, atol=2e-4)


def test_ssm_scan_chunked_state_carry():
    """Scanning 12 tokens at once == three 4-token scans carrying h."""
    rng = np.random.default_rng(1)
    b, t, d, n = 1, 12, 8, 4
    h0 = np.zeros((b, d, n), np.float32)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    dt = rng.standard_normal((b, t, d)).astype(np.float32)
    A = -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.3)
    Bc = rng.standard_normal((b, t, n)).astype(np.float32)
    Cc = rng.standard_normal((b, t, n)).astype(np.float32)
    y_full, h_full = ssm_scan(*map(jnp.asarray, (h0, x, dt, A, Bc, Cc)))
    h = jnp.asarray(h0)
    ys = []
    for i in range(0, t, 4):
        y, h = ssm_scan(h, *map(jnp.asarray,
                                (x[:, i:i+4], dt[:, i:i+4])),
                        jnp.asarray(A), jnp.asarray(Bc[:, i:i+4]),
                        jnp.asarray(Cc[:, i:i+4]))
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(ys, 1), np.asarray(y_full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_full),
                               rtol=1e-4, atol=1e-4)


def test_ssm_step_matches_scan():
    rng = np.random.default_rng(2)
    b, d, n = 2, 8, 4
    h0 = rng.standard_normal((b, d, n)).astype(np.float32) * 0.1
    x = rng.standard_normal((b, 1, d)).astype(np.float32)
    dt = rng.standard_normal((b, 1, d)).astype(np.float32)
    A = -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.3)
    Bc = rng.standard_normal((b, 1, n)).astype(np.float32)
    Cc = rng.standard_normal((b, 1, n)).astype(np.float32)
    y1, h1 = ssm_scan(*map(jnp.asarray, (h0, x, dt, A, Bc, Cc)))
    y2, h2 = ssm_step(jnp.asarray(h0), jnp.asarray(x[:, 0]),
                      jnp.asarray(dt[:, 0]), jnp.asarray(A),
                      jnp.asarray(Bc[:, 0]), jnp.asarray(Cc[:, 0]))
    np.testing.assert_allclose(np.asarray(y1[:, 0]), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=1e-5, atol=1e-5)


def test_ssm_conv_state_carry():
    rng = np.random.default_rng(3)
    b, t, d, k = 1, 10, 8, 4
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    w = rng.standard_normal((k, d)).astype(np.float32)
    bias = rng.standard_normal((d,)).astype(np.float32)
    zero = np.zeros((b, k - 1, d), np.float32)
    y_full, _ = ssm_conv(jnp.asarray(x), jnp.asarray(zero), jnp.asarray(w),
                         jnp.asarray(bias))
    st = jnp.asarray(zero)
    ys = []
    for i in range(0, t, 5):
        y, st = ssm_conv(jnp.asarray(x[:, i:i+5]), st, jnp.asarray(w),
                         jnp.asarray(bias))
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(ys, 1), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


def test_mamba_decode_matches_prefill():
    """Token-by-token decode logits == all-at-once prefill logits."""
    cfg = _cfg()
    w = mamba_model.random_weights(cfg, seed=4)
    toks = [3, 17, 42, 5, 99, 7]

    ctx1 = RecurrentContext(cfg, w, n_lanes=1, max_seq=128)
    s1 = ctx1.new_sequence()
    full = ctx1.prefill(s1, toks)

    ctx2 = RecurrentContext(cfg, w, n_lanes=1, max_seq=128)
    s2 = ctx2.new_sequence()
    step = [ctx2.prefill(s2, toks[:1])[0]]
    for tok in toks[1:]:
        step.append(ctx2.decode({s2: tok})[s2])
    np.testing.assert_allclose(np.stack(step), full, rtol=3e-2, atol=3e-2)


def test_recurrent_context_generate_and_lanes():
    cfg = _cfg()
    w = mamba_model.random_weights(cfg, seed=5)
    ctx = make_context(cfg, w, n_lanes=2, max_seq=128)
    assert isinstance(ctx, RecurrentContext)
    out = ctx.generate([1, 2, 3], max_new_tokens=5)
    assert len(out) == 5 and all(0 <= t < cfg.vocab_size for t in out)

    # fork + suffix-removal restriction
    s = ctx.new_sequence()
    ctx.prefill(s, [4, 5, 6])
    ctx.kv.seq_cp(s, 999)
    assert ctx.kv.lengths[ctx.kv.lane_of(999)] == 3
    with pytest.raises(RuntimeError):
        ctx.kv.seq_rm(s, p0=1)
    ctx.kv.seq_rm(s)
    ctx.kv.seq_rm(999)


def test_mamba_gguf_config():
    md = {
        "general.architecture": "mamba",
        "mamba.block_count": 48,
        "mamba.embedding_length": 1536,
        "mamba.context_length": 1048576,
        "mamba.ssm.conv_kernel": 4,
        "mamba.ssm.inner_size": 3072,
        "mamba.ssm.state_size": 16,
        "mamba.ssm.time_step_rank": 96,
        "mamba.vocab_size": 50280,
    }
    cfg = ModelConfig.from_gguf(md)
    assert cfg.is_recurrent
    assert cfg.ssm_d_inner == 3072 and cfg.ssm_d_state == 16
    assert cfg.ssm_dt_rank == 96 and cfg.ssm_d_conv == 4


def test_engine_prompt_cache_recurrent_safe():
    """The engine's prompt-cache reuse must not crash on recurrent memory
    (no mid-sequence rewind): full-prefix match reuses, mismatch restarts."""
    import queue

    from rrs_tpu.serving.engine import Engine, GenRequest

    cfg = _cfg()
    w = mamba_model.random_weights(cfg, seed=9)
    ctx = RecurrentContext(cfg, w, n_lanes=1, max_seq=128)
    eng = Engine(ctx)
    eng.start()
    try:
        def run(prompt):
            q = queue.Queue()
            eng.submit(GenRequest(
                prompt_tokens=prompt, max_tokens=2,
                on_token=lambda t, p, fin, r: q.put((fin, r))))
            while True:
                fin, reason = q.get(timeout=120)
                if fin:
                    break
            assert reason in ("stop", "length"), reason

        run([1, 2, 3])
        run([1, 2, 3, 4, 5])      # extends the retained prefix
        run([9, 9, 9])            # mismatched -> fresh sequence, no crash
        run([9, 9])               # shorter than retained -> rewind refused
    finally:
        eng.stop()
