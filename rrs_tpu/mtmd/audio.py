"""Audio multimodal: Whisper-style log-mel frontend + encoder + projectors
(tools/mtmd/mtmd-audio.cpp + tools/mtmd/models/whisper-enc.cpp analog).

Pipeline: 16kHz mono f32 PCM -> log-mel spectrogram (Slaney filterbank,
log10, max-8 clamp, (x+4)/4 — identical math to OpenAI Whisper / the
reference's log_mel_spectrogram) -> 3000-frame chunks -> Whisper encoder
(two conv1d + GELU, learned positions, pre-LN transformer) -> projector
(qwen2-audio fc / ultravox StackAudioFrames+SwiGLU) -> embedding chunks
fed through the llama_batch.embd path like image chunks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

AUDIO_SR = 16000
N_FFT = 400
HOP = 160
CHUNK_FRAMES = 3000          # the encoder graph accepts 3000 frames/chunk
CHUNK_LEN_S = 30


def mel_filterbank(n_mel: int, n_fft: int, sr: int, fmin: float = 0.0,
                   fmax: float = 0.0) -> np.ndarray:
    """Slaney-scale mel filterbank [n_mel, n_fft//2+1] with area
    normalization (fill_mel_filterbank_matrix, mtmd-audio.cpp:37-100 —
    matches librosa's default)."""
    if fmax <= 0:
        fmax = sr / 2.0
    min_log_hz = 1000.0
    lin_slope = 3 / 200.0
    min_log_mel = min_log_hz * lin_slope
    log_step = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        return np.where(f < min_log_hz, f * lin_slope,
                        min_log_mel + np.log(np.maximum(f, 1e-10)
                                             / min_log_hz) / log_step)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        return np.where(m < min_log_mel, m / lin_slope,
                        min_log_hz * np.exp((m - min_log_mel) * log_step))

    n_bins = n_fft // 2 + 1
    fft_freqs = np.arange(n_bins) * (sr / n_fft)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mel + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mel, n_bins), np.float64)
    for m in range(n_mel):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
        fb[m] *= 2.0 / (hi - lo)            # slaney area norm
    return fb.astype(np.float32)


def log_mel_spectrogram(samples: np.ndarray, n_mel: int = 128) -> np.ndarray:
    """f32 PCM @16kHz -> log-mel [n_mel, n_frames]
    (log_mel_spectrogram, mtmd-audio.cpp:346-483: periodic Hann, no center
    padding, power spectrum, log10 floor 1e-10, global max-8 clamp,
    (x+4)/4)."""
    samples = np.asarray(samples, np.float32).reshape(-1)
    min_samples = AUDIO_SR * (CHUNK_LEN_S + 1)      # +1s margin, :521
    if samples.size < min_samples:
        samples = np.pad(samples, (0, min_samples - samples.size))
    n = samples.size
    n_frames = (n - N_FFT) // HOP + 1
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = samples[idx]                           # [T, 400]
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    spec = np.fft.rfft(frames * hann[None, :], n=N_FFT, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)  # [T, 201]
    fb = mel_filterbank(n_mel, N_FFT, AUDIO_SR)
    mel = power @ fb.T                              # [T, n_mel]
    log_spec = np.log10(np.maximum(mel, 1e-10)).T   # [n_mel, T]
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def chunk_mel(mel: np.ndarray) -> list[np.ndarray]:
    """Split [n_mel, T] into full 3000-frame chunks (the trailing padded
    partial chunk is dropped, mtmd-audio.cpp:558-563)."""
    out = []
    for off in range(0, mel.shape[1], CHUNK_FRAMES):
        if mel.shape[1] - off < CHUNK_FRAMES:
            break
        out.append(mel[:, off:off + CHUNK_FRAMES])
    return out


# ---------------------------------------------------------------------------
# Whisper encoder + projector
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AudioConfig:
    n_mel: int = 128
    n_embd: int = 384
    n_layers: int = 4
    n_heads: int = 6
    n_ff: int = 1536
    n_embd_llm: int = 2048
    eps: float = 1e-5
    projector: str = "qwen2a"        # "qwen2a" | "ultravox"
    stack_factor: int = 8            # ultravox StackAudioFrames

    @staticmethod
    def from_gguf(md: dict) -> "AudioConfig":
        g = lambda k, d=None: md.get(f"clip.audio.{k}", d)
        return AudioConfig(
            n_mel=int(g("num_mel_bins", 128)),
            n_embd=int(g("embedding_length", 384)),
            n_layers=int(g("block_count", 4)),
            n_heads=int(g("attention.head_count", 6)),
            n_ff=int(g("feed_forward_length", 1536)),
            n_embd_llm=int(md.get("clip.audio.projection_dim",
                                  md.get("clip.projector.output_dim", 2048))),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            projector=str(md.get("clip.projector_type", "qwen2a")),
            stack_factor=int(g("projector.stack_factor", 8)),
        )


@partial(jax.tree_util.register_dataclass,
         data_fields=["ln1_w", "ln1_b", "wq", "bq", "wk", "wv", "bv", "wo",
                      "bo", "ln2_w", "ln2_b", "w_up", "b_up", "w_down",
                      "b_down"],
         meta_fields=[])
@dataclasses.dataclass
class AudioLayer:
    ln1_w: jnp.ndarray
    ln1_b: jnp.ndarray
    wq: jnp.ndarray          # [E, E]
    bq: jnp.ndarray
    wk: jnp.ndarray          # no k bias (whisper-enc.cpp sanity check)
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray
    ln2_w: jnp.ndarray
    ln2_b: jnp.ndarray
    w_up: jnp.ndarray        # [E, F]
    b_up: jnp.ndarray
    w_down: jnp.ndarray      # [F, E]
    b_down: jnp.ndarray


@partial(jax.tree_util.register_dataclass,
         data_fields=["conv1_w", "conv1_b", "conv2_w", "conv2_b", "pos_embd",
                      "layers", "ln_post_w", "ln_post_b", "proj"],
         meta_fields=[])
@dataclasses.dataclass
class AudioWeights:
    conv1_w: jnp.ndarray     # [E, n_mel, 3]
    conv1_b: jnp.ndarray
    conv2_w: jnp.ndarray     # [E, E, 3]
    conv2_b: jnp.ndarray
    pos_embd: jnp.ndarray    # [n_pos_max, E]
    layers: list
    ln_post_w: jnp.ndarray
    ln_post_b: jnp.ndarray
    proj: dict               # projector tensors (type-dependent)


def _layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _gelu_erf(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(np.float32)))


def _conv1d(x, w, b, stride):
    """x [T, Cin]; w [Cout, Cin, 3]; 'same'-ish padding 1 (ggml_conv_1d_ph)."""
    out = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        w.transpose(2, 1, 0).astype(jnp.float32),       # [K, Cin, Cout]
        window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out[0] + b[None, :]


def encoder_forward(cfg: AudioConfig, weights: AudioWeights,
                    mel: jnp.ndarray) -> jnp.ndarray:
    """mel [n_mel, T] -> [T', n_embd_llm] (clip_graph_whisper_enc::build)."""
    x = mel.T.astype(jnp.float32)                       # [T, n_mel]
    x = _gelu_erf(_conv1d(x, weights.conv1_w, weights.conv1_b, 1))
    x = _gelu_erf(_conv1d(x, weights.conv2_w, weights.conv2_b, 2))
    n_pos, e = x.shape
    x = x + weights.pos_embd[:n_pos].astype(jnp.float32)
    h_dim = e // cfg.n_heads
    scale = 1.0 / np.sqrt(h_dim)

    for lw in weights.layers:
        h = _layer_norm(x, lw.ln1_w, lw.ln1_b, cfg.eps)
        q = (h @ lw.wq + lw.bq).reshape(n_pos, cfg.n_heads, h_dim)
        k = (h @ lw.wk).reshape(n_pos, cfg.n_heads, h_dim)
        v = (h @ lw.wv + lw.bv).reshape(n_pos, cfg.n_heads, h_dim)
        att = jnp.einsum("qhd,khd->hqk", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("hqk,khd->qhd", att, v).reshape(n_pos, e)
        x = x + (ctx @ lw.wo + lw.bo)
        h = _layer_norm(x, lw.ln2_w, lw.ln2_b, cfg.eps)
        x = x + (_gelu_erf(h @ lw.w_up + lw.b_up) @ lw.w_down + lw.b_down)

    x = _layer_norm(x, weights.ln_post_w, weights.ln_post_b, cfg.eps)

    p = weights.proj
    if cfg.projector == "qwen2a":
        return x @ p["fc_w"] + p["fc_b"]
    if cfg.projector == "ultravox":
        # StackAudioFrames: pad T' to a multiple of stack_factor, then
        # group rows (whisper-enc.cpp build_stack / ultravox_model.py)
        sf = cfg.stack_factor
        t = x.shape[0]
        pad = (-t) % sf
        x = jnp.pad(x, ((0, pad), (0, 0)))
        x = x.reshape((t + pad) // sf, sf * e)
        # pre-norm (rms) -> ffn in -> swiglu (SECOND half is the gate)
        x = x * jax.lax.rsqrt((x * x).mean(-1, keepdims=True) + 1e-6)
        x = x * p["norm_pre_w"]
        x = x @ p["w1"]
        h1, h2 = jnp.split(x, 2, axis=-1)
        x = h1 * jax.nn.silu(h2)        # ggml_swiglu_swapped
        x = x * jax.lax.rsqrt((x * x).mean(-1, keepdims=True) + 1e-6)
        x = x * p["norm_mid_w"]
        return x @ p["w2"]
    raise ValueError(f"unknown audio projector {cfg.projector!r}")


def embed_audio(cfg: AudioConfig, weights: AudioWeights,
                samples: np.ndarray) -> list[np.ndarray]:
    """PCM -> list of [T', n_embd_llm] embedding chunks."""
    mel = log_mel_spectrogram(samples, n_mel=cfg.n_mel)
    return [np.asarray(encoder_forward(cfg, weights, jnp.asarray(c)))
            for c in chunk_mel(mel)]


# ---------------------------------------------------------------------------
# GGUF interchange (mmproj with audio tower; clip-impl.h key/tensor names)
# ---------------------------------------------------------------------------

def load_audio_mmproj(path: str | Path):
    from rrs_tpu.gguf.reader import read_gguf

    with read_gguf(path) as g:
        md = dict(g.metadata)
        cfg = AudioConfig.from_gguf(md)

        def t(name):
            return jnp.asarray(np.asarray(g.tensor(name), np.float32))

        layers = []
        for li in range(cfg.n_layers):
            p = f"a.blk.{li}"
            layers.append(AudioLayer(
                ln1_w=t(f"{p}.ln1.weight"), ln1_b=t(f"{p}.ln1.bias"),
                wq=t(f"{p}.attn_q.weight").T, bq=t(f"{p}.attn_q.bias"),
                wk=t(f"{p}.attn_k.weight").T,
                wv=t(f"{p}.attn_v.weight").T, bv=t(f"{p}.attn_v.bias"),
                wo=t(f"{p}.attn_out.weight").T, bo=t(f"{p}.attn_out.bias"),
                ln2_w=t(f"{p}.ln2.weight"), ln2_b=t(f"{p}.ln2.bias"),
                w_up=t(f"{p}.ffn_up.weight").T, b_up=t(f"{p}.ffn_up.bias"),
                w_down=t(f"{p}.ffn_down.weight").T,
                b_down=t(f"{p}.ffn_down.bias"),
            ))
        proj = {}
        if cfg.projector == "qwen2a":
            proj["fc_w"] = t("mm.a.fc.weight").T
            proj["fc_b"] = t("mm.a.fc.bias")
        else:
            proj["norm_pre_w"] = t("mm.a.norm_pre.weight")
            proj["norm_mid_w"] = t("mm.a.norm_mid.weight")
            proj["w1"] = t("mm.a.mlp.1.weight").T
            proj["w2"] = t("mm.a.mlp.2.weight").T
        w = AudioWeights(
            conv1_w=t("a.conv1d.1.weight"), conv1_b=t("a.conv1d.1.bias"),
            conv2_w=t("a.conv1d.2.weight"), conv2_b=t("a.conv1d.2.bias"),
            pos_embd=t("a.position_embd.weight"),
            layers=layers,
            ln_post_w=t("a.post_ln.weight"), ln_post_b=t("a.post_ln.bias"),
            proj=proj,
        )
    return cfg, w


def write_audio_mmproj(path: str | Path, cfg: AudioConfig, weights=None,
                       seed: int = 0):
    """Write an audio mmproj GGUF (random weights when none given) — the
    fixture builder for tests and the convert-side interchange format."""
    from rrs_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(seed)

    def m(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    w = GGUFWriter(path)
    w.add_string("general.architecture", "clip")
    w.add_string("clip.projector_type", cfg.projector)
    w.add_uint32("clip.audio.num_mel_bins", cfg.n_mel)
    w.add_uint32("clip.audio.embedding_length", cfg.n_embd)
    w.add_uint32("clip.audio.block_count", cfg.n_layers)
    w.add_uint32("clip.audio.attention.head_count", cfg.n_heads)
    w.add_uint32("clip.audio.feed_forward_length", cfg.n_ff)
    w.add_uint32("clip.audio.projection_dim", cfg.n_embd_llm)
    w.add_float32("clip.audio.attention.layer_norm_epsilon", cfg.eps)
    w.add_uint32("clip.audio.projector.stack_factor", cfg.stack_factor)

    e, nm, f = cfg.n_embd, cfg.n_mel, cfg.n_ff

    def add(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, np.float32))

    add("a.conv1d.1.weight", m(e, nm, 3))
    add("a.conv1d.1.bias", m(e))
    add("a.conv1d.2.weight", m(e, e, 3))
    add("a.conv1d.2.bias", m(e))
    add("a.position_embd.weight", m(1500, e))
    add("a.post_ln.weight", 1.0 + m(e))
    add("a.post_ln.bias", m(e))
    for li in range(cfg.n_layers):
        p = f"a.blk.{li}"
        add(f"{p}.ln1.weight", 1.0 + m(e))
        add(f"{p}.ln1.bias", m(e))
        add(f"{p}.attn_q.weight", m(e, e))
        add(f"{p}.attn_q.bias", m(e))
        add(f"{p}.attn_k.weight", m(e, e))
        add(f"{p}.attn_v.weight", m(e, e))
        add(f"{p}.attn_v.bias", m(e))
        add(f"{p}.attn_out.weight", m(e, e))
        add(f"{p}.attn_out.bias", m(e))
        add(f"{p}.ln2.weight", 1.0 + m(e))
        add(f"{p}.ln2.bias", m(e))
        add(f"{p}.ffn_up.weight", m(f, e))
        add(f"{p}.ffn_up.bias", m(f))
        add(f"{p}.ffn_down.weight", m(e, f))
        add(f"{p}.ffn_down.bias", m(e))
    if cfg.projector == "qwen2a":
        add("mm.a.fc.weight", m(cfg.n_embd_llm, e))
        add("mm.a.fc.bias", m(cfg.n_embd_llm))
    else:
        add("mm.a.norm_pre.weight", 1.0 + m(e * cfg.stack_factor))
        add("mm.a.mlp.1.weight", m(2 * f, e * cfg.stack_factor))
        add("mm.a.norm_mid.weight", 1.0 + m(f))
        add("mm.a.mlp.2.weight", m(cfg.n_embd_llm, f))
    w.write()
    return Path(path)
