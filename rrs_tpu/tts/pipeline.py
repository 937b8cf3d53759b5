"""OuteTTS text-to-speech pipeline (tools/tts/tts.cpp analog):
TTS LLM generates audio-code tokens -> WavTokenizer decoder -> spectral
frames -> ISTFT overlap-add -> 24 kHz WAV."""

from __future__ import annotations

import re

import numpy as np

# OuteTTS v0.2 audio-code token range (tts.cpp:1002-1012)
CODE_TOKEN_MIN = 151672
CODE_TOKEN_MAX = 155772


def process_text(text: str) -> list[str]:
    """Lowercase, strip punctuation, split into words (tts.cpp process_text;
    number-to-words is handled upstream by the caller if needed)."""
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-zÀ-ſ0-9 ]", "", text)
    return [w for w in text.split() if w]


def format_prompt(text: str, words_per_second: float = 1.35) -> str:
    """The OuteTTS v0.2 prompt layout (tts.cpp:436-693): words separated by
    <|text_sep|> between <|text_start|>/<|text_end|> guiders."""
    words = process_text(text)
    body = "<|text_sep|>".join(words)
    return ("<|im_start|>\n<|text_start|>" + body
            + "<|text_end|>\n<|audio_start|>\n")


def extract_codes(tokens: list[int]) -> list[int]:
    """Keep audio tokens, rebase to vocoder codes (tts.cpp:1002-1012)."""
    return [t - CODE_TOKEN_MIN for t in tokens
            if CODE_TOKEN_MIN <= t <= CODE_TOKEN_MAX]


def synthesize(ctx, vocab, vocoder_weights, text: str,
               max_codes: int = 768, out_path="output.wav"):
    """End-to-end TTS (needs an OuteTTS-style GGUF + wavtokenizer GGUF)."""
    from rrs_tpu.runtime.sampler import SamplerParams
    from rrs_tpu.tts.dsp import embd_to_audio, save_wav16
    from rrs_tpu.tts.vocoder import vocoder_forward

    import jax.numpy as jnp

    prompt = format_prompt(text)
    toks = vocab.encode(prompt, add_special=True)
    out = ctx.generate(toks, max_codes,
                       SamplerParams(temperature=0.0),
                       stop_tokens=tuple(
                           t for t in (vocab.eos_id,) if t is not None and t >= 0))
    codes = extract_codes(out)
    if not codes:
        raise ValueError("model generated no audio codes — is this an "
                         "OuteTTS checkpoint?")
    embd = np.asarray(vocoder_forward(vocoder_weights,
                                      jnp.asarray(codes, jnp.int32)))
    audio = embd_to_audio(embd)
    return save_wav16(out_path, audio), len(codes)
