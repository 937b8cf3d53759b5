"""Audio multimodal (mtmd-audio.cpp + whisper-enc.cpp analog): mel frontend
vs transformers' WhisperFeatureExtractor, encoder vs a real HF WhisperEncoder
(weights exported through our mmproj GGUF), projector semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rrs_tpu.mtmd import audio as A


def _tone(seconds=2.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1313 * t)
    rng = np.random.default_rng(0)
    return (x + 0.02 * rng.standard_normal(t.size)).astype(np.float32)


def test_log_mel_matches_whisper_feature_extractor():
    """Same filterbank/log/clamp math as Whisper: interior frames must agree
    closely (HF center-pads, the reference doesn't — edges differ)."""
    from transformers import WhisperFeatureExtractor

    x = _tone(3.0)
    fe = WhisperFeatureExtractor(feature_size=80)
    theirs = fe(x, sampling_rate=16000, return_tensors="np",
                padding="max_length").input_features[0]     # [80, 3000]
    ours = A.log_mel_spectrogram(x, n_mel=80)[:, :3000]
    # HF center-pads (reflect, n_fft/2 = 1.25 frames of lead): our frame t
    # aligns with HF's t+1; compare the interior of the 3s of real audio
    a, b = ours[:, 10:250], theirs[:, 11:251]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98, corr
    assert abs(a.mean() - b.mean()) < 0.05
    # identical filterbank + log/clamp math -> matching dynamic range
    assert abs(float(ours.max()) - float(theirs.max())) < 1e-2


def test_encoder_matches_hf_whisper():
    """Export a tiny random HF WhisperEncoder into our mmproj GGUF and
    compare forward outputs exactly (pre-projector)."""
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    cfg_hf = WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        max_source_positions=1500,
    )
    torch.manual_seed(0)
    enc = WhisperEncoder(cfg_hf)
    enc.eval()

    cfg = A.AudioConfig(n_mel=80, n_embd=64, n_layers=2, n_heads=4,
                        n_ff=128, n_embd_llm=32, projector="qwen2a")

    def t2n(t):
        return t.detach().numpy().astype(np.float32)

    import jax.numpy as jnp

    layers = []
    for hl in enc.layers:
        layers.append(A.AudioLayer(
            ln1_w=jnp.asarray(t2n(hl.self_attn_layer_norm.weight)),
            ln1_b=jnp.asarray(t2n(hl.self_attn_layer_norm.bias)),
            wq=jnp.asarray(t2n(hl.self_attn.q_proj.weight).T),
            bq=jnp.asarray(t2n(hl.self_attn.q_proj.bias)),
            wk=jnp.asarray(t2n(hl.self_attn.k_proj.weight).T),
            wv=jnp.asarray(t2n(hl.self_attn.v_proj.weight).T),
            bv=jnp.asarray(t2n(hl.self_attn.v_proj.bias)),
            wo=jnp.asarray(t2n(hl.self_attn.out_proj.weight).T),
            bo=jnp.asarray(t2n(hl.self_attn.out_proj.bias)),
            ln2_w=jnp.asarray(t2n(hl.final_layer_norm.weight)),
            ln2_b=jnp.asarray(t2n(hl.final_layer_norm.bias)),
            w_up=jnp.asarray(t2n(hl.fc1.weight).T),
            b_up=jnp.asarray(t2n(hl.fc1.bias)),
            w_down=jnp.asarray(t2n(hl.fc2.weight).T),
            b_down=jnp.asarray(t2n(hl.fc2.bias)),
        ))
    fc_w = np.eye(64, 32, dtype=np.float32)          # identity-ish projector
    w = A.AudioWeights(
        conv1_w=jnp.asarray(t2n(enc.conv1.weight)),
        conv1_b=jnp.asarray(t2n(enc.conv1.bias)),
        conv2_w=jnp.asarray(t2n(enc.conv2.weight)),
        conv2_b=jnp.asarray(t2n(enc.conv2.bias)),
        pos_embd=jnp.asarray(t2n(enc.embed_positions.weight)),
        layers=layers,
        ln_post_w=jnp.asarray(t2n(enc.layer_norm.weight)),
        ln_post_b=jnp.asarray(t2n(enc.layer_norm.bias)),
        proj={"fc_w": jnp.asarray(fc_w), "fc_b": jnp.zeros(32)},
    )

    mel = A.log_mel_spectrogram(_tone(2.0), n_mel=80)[:, :3000]
    with torch.no_grad():
        want = enc(torch.tensor(mel[None])).last_hidden_state[0].numpy()
    got = np.asarray(A.encoder_forward(cfg, w, np.asarray(mel)))
    np.testing.assert_allclose(got, want @ fc_w, rtol=2e-3, atol=2e-3)


def test_mmproj_gguf_roundtrip(tmp_path):
    cfg = A.AudioConfig(n_mel=80, n_embd=64, n_layers=2, n_heads=4,
                        n_ff=128, n_embd_llm=48, projector="qwen2a")
    p = A.write_audio_mmproj(tmp_path / "a.gguf", cfg, seed=3)
    cfg2, w = A.load_audio_mmproj(p)
    assert cfg2.n_embd == 64 and cfg2.projector == "qwen2a"
    chunks = A.embed_audio(cfg2, w, _tone(2.0))
    assert len(chunks) == 1
    assert chunks[0].shape == (1500, 48)
    assert np.isfinite(chunks[0]).all()


def test_ultravox_projector(tmp_path):
    cfg = A.AudioConfig(n_mel=80, n_embd=64, n_layers=1, n_heads=4,
                        n_ff=128, n_embd_llm=48, projector="ultravox",
                        stack_factor=8)
    p = A.write_audio_mmproj(tmp_path / "uv.gguf", cfg, seed=4)
    cfg2, w = A.load_audio_mmproj(p)
    chunks = A.embed_audio(cfg2, w, _tone(2.0))
    # 1500 positions / stack_factor 8 -> ceil = 188 rows
    assert chunks[0].shape == (188, 48)
    assert np.isfinite(chunks[0]).all()



def test_chunking_drops_partial_tail():
    mel = np.zeros((80, 6500), np.float32)
    chunks = A.chunk_mel(mel)
    assert len(chunks) == 2
    assert all(c.shape == (80, 3000) for c in chunks)


def test_server_audio_chat(tmp_path):
    """End-to-end: an input_audio content part flows through the chat route
    as embedding segments (the mtmd audio path)."""
    import base64
    import http.client
    import io
    import json
    import struct
    import threading
    import wave
    from http.server import ThreadingHTTPServer

    from rrs_tpu.models.config import PRESETS
    from rrs_tpu.models.llama import random_weights
    from rrs_tpu.models.vocab import Vocab
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.serving.engine import Engine
    from rrs_tpu.serving.server import ServerState, make_handler

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=4096)
    engine = Engine(ctx)
    engine.start()
    toks = [chr(33 + i) if 33 + i < 0x2FF else f"<tok{i}>"
            for i in range(cfg.vocab_size)]
    vocab = Vocab(model="gpt2", tokens=toks, scores=None,
                  token_types=[1] * cfg.vocab_size, merges=[], pre="gpt-2",
                  bos_id=0, eos_id=1, add_bos=False)
    state = ServerState(cfg, vocab, engine, {}, "tiny-audio")
    acfg = A.AudioConfig(n_mel=80, n_embd=64, n_layers=1, n_heads=4,
                         n_ff=128, n_embd_llm=cfg.n_embd,
                         projector="ultravox", stack_factor=16)
    p = A.write_audio_mmproj(tmp_path / "a.gguf", acfg, seed=5)
    state.audio_cfg, state.audio_weights = A.load_audio_mmproj(p)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        # 1s PCM16 wav
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            pcm = (np.sin(np.arange(16000) / 10.0) * 8000).astype(np.int16)
            wf.writeframes(pcm.tobytes())
        b64 = base64.b64encode(buf.getvalue()).decode()

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/chat/completions", json.dumps({
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "what is this sound?"},
                {"type": "input_audio",
                 "input_audio": {"data": b64, "format": "wav"}},
            ]}],
            "max_tokens": 3, "temperature": 0.0,
        }), {"Content-Type": "application/json"})
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 200, body
        assert body["choices"][0]["message"]["role"] == "assistant"
        # audio embeds actually hit the context (94 rows at stack 16)
        assert engine.n_prompt_tokens > 90
    finally:
        httpd.shutdown()
        engine.stop()
