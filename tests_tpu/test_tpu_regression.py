"""On-TPU perf-regression suite (VERDICT r3 weak-#7): the serving fast
path, quantized-KV long-context decode, and MoE expert streaming regress
only via manual benchmark reruns otherwise — these pin them with
threshold asserts so a regression fails a test.

Timing rules (PERF.md): long device-side scans, varied inputs, value
readbacks; ratios between variants measured the same way (never absolute
wall-clock through the relay).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu -q
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() == "cpu":      # pragma: no cover
    pytest.skip("no TPU visible (run with the axon PYTHONPATH)",
                allow_module_level=True)


def _scan_time(fn, qs, reps=3):
    """min-of-reps seconds for a 128-step device scan of fn over qs."""
    def body(c, qq):
        return c + fn(qq).astype(jnp.float32).sum(), None

    run = jax.jit(lambda: jax.lax.scan(body, 0.0, qs)[0])
    run()  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best


def test_quant_kv_decode_not_slower_than_bf16():
    """Long-context decode attention: q8 and q4(head-pair) caches must
    not be slower than the bf16 cache they halve/quarter (the round-3 q4
    tax was 9% at S=8192; the head-pair kernel removed it)."""
    from rrs_tpu.ops import flash_attention as fa
    from rrs_tpu.runtime import kv_codec

    B, HKV, G, D, S = 1, 8, 4, 128, 8192
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
    k8, ks8 = kv_codec.quantize_rows(kf, 127.0)
    v8, vs8 = kv_codec.quantize_rows(vf, 127.0)
    k4, ks4 = kv_codec.quantize_rows(kf, 7.0)
    v4, vs4 = kv_codec.quantize_rows(vf, 7.0)
    ks8, vs8 = ks8[:, :, None, :], vs8[:, :, None, :]
    ks4, vs4 = ks4[:, :, None, :], vs4[:, :, None, :]
    khp, vhp = kv_codec.pack_hp(k4), kv_codec.pack_hp(v4)
    kbf, vbf = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
    qs = jnp.asarray(rng.standard_normal((128, B, 1, HKV * G, D)),
                     jnp.bfloat16)
    pos = jnp.full((B, 1), S - 2, jnp.int32)
    scale = 1.0 / np.sqrt(D)

    t_bf = _scan_time(lambda q: fa.flash_attention(q, kbf, vbf, pos, scale),
                      qs)
    t_q8 = _scan_time(lambda q: fa.flash_attention_q8(
        q, k8, ks8, v8, vs8, pos, scale), qs)
    t_hp = _scan_time(lambda q: fa.flash_attention_q4hp(
        q, khp, ks4, vhp, vs4, pos, scale), qs)
    # quantized caches stream half/quarter the bytes; allow 5% measurement
    # slack but never a regression past bf16
    assert t_q8 <= t_bf * 1.05, (t_q8, t_bf)
    assert t_hp <= t_bf * 1.05, (t_hp, t_bf)


def test_served_fast_path_engages_for_all_sampler_modes():
    """Grammar / mirostat-v2 / XTC / penalty slots must ride the device
    micro-run fast path (round-3 weak-#3: they used to collapse to the
    ~9 tok/s host per-token path). Counts dispatches instead of timing:
    >= 90% of tokens must come from device runs."""
    import string

    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as lm
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.runtime.grammar import Grammar, build_token_trie
    from rrs_tpu.runtime.sampler import SamplerParams
    from rrs_tpu.serving.engine import Engine, GenRequest

    cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=512, vocab_size=512, context_length=512,
        qk_norm=True)
    w = lm.random_weights(cfg, seed=0, quantize=True)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=512)
    eng = Engine(ctx)

    rng = np.random.default_rng(0)
    pieces = ["".join(rng.choice(list(string.ascii_lowercase),
                                 rng.integers(2, 5))) + " "
              if rng.random() < 0.9 else "<|x|>"
              for _ in range(cfg.vocab_size)]
    trie = build_token_trie(pieces)

    cases = {
        "plain": {},
        "penalties": dict(penalty_repeat=1.2, penalty_freq=0.1),
        "mirostat": dict(mirostat=2, mirostat_tau=5.0, mirostat_eta=0.1),
        "xtc": dict(xtc_probability=0.5, xtc_threshold=0.1),
    }
    for label, kw in cases.items():
        grammar = Grammar("root ::= [a-z ]+") if label == "plain" else None
        counts = {"fast": 0, "host": 0}
        orig_fast, orig_host = ctx.decode_run_start, ctx.decode

        def counted_fast(*a, **k):
            counts["fast"] += 1
            return orig_fast(*a, **k)

        def counted_host(*a, **k):
            counts["host"] += 1
            return orig_host(*a, **k)

        ctx.decode_run_start = counted_fast
        ctx.decode = counted_host
        done = {}
        out = []
        req = GenRequest(
            prompt_tokens=[5, 6, 7], max_tokens=96,
            params=SamplerParams(temperature=0.8, top_k=40, **kw),
            grammar=grammar,
            token_pieces=pieces if grammar else None,
            token_trie=trie if grammar else None,
            on_token=lambda tok, piece, fin, reason:
                done.update(r=reason) if fin else out.append(tok))
        eng.submit(req)
        t0 = time.time()
        while not done and time.time() - t0 < 600:
            eng._iterate()
        ctx.decode_run_start, ctx.decode = orig_fast, orig_host
        assert done, label
        assert len(out) >= 64, (label, len(out))
        assert counts["fast"] > 0, (label, counts)
        # host decodes happen only on grammar-violation recovery; every
        # other mode must stay entirely on the device fast path
        limit = len(out) // 3 if grammar else 2
        assert counts["host"] <= limit, (label, counts, len(out))


def test_moe_expert_rows_streams_only_selected_experts():
    """The scalar-prefetch expert-rows kernel must beat dense all-expert
    streaming at the qwen3moe decode geometry (E=128 experts). Round-5
    calibration (benchmarks/probe_moe_rows.py): BOTH kernels sit on a
    ~180 us latency floor at decode sizes (small data-dependent weight
    blocks are DMA-latency-bound, not bandwidth-bound — the byte-ratio
    "8x fewer bytes => 3x faster" premise of the round-4 threshold was
    wrong at these shapes); with bn=256 blocks rows measures 184.6 vs
    dense 414.0-432.1 us (1.85-2.24x across runs). Gate at 1.4x: the
    ratio scatters ~20% between isolated and in-suite runs (relay
    wall-clock pollution, CLAUDE.md), and 1.4 still catches a rows
    kernel that loses its selected-expert streaming advantage."""
    from rrs_tpu.ops.tcq4_matmul import (tcq4_matmul_all_experts,
                                         tcq4_matmul_experts_rows)

    rng = np.random.default_rng(1)
    E, K, N = 128, 2048, 768
    qs = jnp.asarray(rng.integers(0, 256, (E, K // 2, N), dtype=np.uint8))
    eff = jnp.asarray((rng.random((E, K // 32, N)) * 0.02).astype(np.float32),
                      jnp.bfloat16)
    acts = jnp.asarray(rng.standard_normal((128, 4, K)) * 0.3, jnp.float32)
    ids = jnp.asarray(rng.integers(0, E, (128, 4)), jnp.int32)

    def rows(i):
        a = acts[i % 128]                       # [topk, K]
        return tcq4_matmul_experts_rows(a, qs, eff, ids[i % 128])

    def dense(i):
        a = acts[i % 128]
        return tcq4_matmul_all_experts(a, qs, eff)

    steps = jnp.arange(128, dtype=jnp.int32)
    t_rows = _scan_time(rows, steps)
    t_dense = _scan_time(dense, steps)
    assert t_rows * 1.4 <= t_dense, (t_rows, t_dense)
