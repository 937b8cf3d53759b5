"""TTS tests (tools/tts analog): ISTFT DSP correctness, vocoder shapes,
prompt formatting, code extraction, WAV output."""

import numpy as np

from rrs_tpu.tts.dsp import (N_FFT, N_HOP, embd_to_audio, hann_window,
                             save_wav16)
from rrs_tpu.tts.pipeline import (CODE_TOKEN_MIN, extract_codes,
                                  format_prompt, process_text)
from rrs_tpu.tts.vocoder import random_vocoder, vocoder_forward


def test_embd_to_audio_reconstructs_sine():
    """Frames encoding a pure bin-k sinusoid must reconstruct it: build the
    log-mag/phase embedding the vocoder head would emit for a steady tone
    and check the overlap-add output is that tone."""
    sr = 24000
    n_codes = 20
    half = N_FFT // 2 + 1
    k_bin = 40                                 # tone at k_bin*sr/n_fft Hz
    embd = np.full((n_codes, 2 * half), -30.0, np.float64)  # tiny mags
    # the reference's one-sided iDFT: out[k] = (1/half) * mag * cos(2pi k m/n + phi)
    # choose phase per frame so frames align in absolute time
    for li in range(n_codes):
        phase = -2.0 * np.pi * k_bin * (li * N_HOP) / N_FFT
        embd[li, k_bin] = np.log(1.0)          # mag 1
        embd[li, half + k_bin] = phase
    audio = embd_to_audio(embd)
    t = np.arange(audio.shape[0])
    expected = np.cos(2 * np.pi * k_bin * (t + (N_FFT - N_HOP) // 2) / N_FFT) \
        / half
    # ignore edges (window envelope ramp)
    m = slice(2 * N_FFT, audio.shape[0] - 2 * N_FFT)
    corr = np.corrcoef(audio[m], expected[m])[0, 1]
    assert corr > 0.99, corr


def test_hann_window_periodic():
    w = hann_window(8)
    assert abs(w[0]) < 1e-12 and abs(w[4] - 1.0) < 1e-12


def test_vocoder_shapes_finite():
    import jax.numpy as jnp

    w = random_vocoder(n_codes_vocab=256, c=64, n_embd_out=1282,
                       n_convnext=1, seed=0)
    codes = jnp.asarray(np.arange(12) % 256, jnp.int32)
    out = np.asarray(vocoder_forward(w, codes))
    assert out.shape == (12, 1282)
    assert np.isfinite(out).all()
    # and the full chain produces audio of the right length
    audio = embd_to_audio(out)
    assert audio.shape[0] == (12 - 1) * N_HOP + N_FFT - (N_FFT - N_HOP)
    assert np.isfinite(audio).all()


def test_prompt_and_codes():
    p = format_prompt("Hello, World!")
    assert "<|text_start|>hello<|text_sep|>world<|text_end|>" in p
    assert p.endswith("<|audio_start|>\n")
    assert process_text("A-B c.d") == ["a", "b", "c", "d"]
    toks = [5, CODE_TOKEN_MIN, CODE_TOKEN_MIN + 7, 200_000, CODE_TOKEN_MIN - 1]
    assert extract_codes(toks) == [0, 7]


def test_save_wav(tmp_path):
    import wave

    audio = np.sin(np.linspace(0, 100, 2400)).astype(np.float32)
    p = save_wav16(tmp_path / "t.wav", audio)
    with wave.open(str(p), "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getnframes() == 2400
