"""WavTokenizer decoder (src/models/wavtokenizer-dec.cpp analog): audio
codes -> spectral frames for rrs_tpu.tts.dsp.embd_to_audio.

Graph: code embedding -> conv1d stem -> posnet (resnet blocks with
group-norm + swish + a single self-attention block + final group norm) ->
token LayerNorm -> ConvNeXt stack (depthwise conv k7 + LN + pointwise GELU
MLP + gamma) -> output norm -> head.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.ops.basic import layer_norm


def conv1d_same(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
                groups: int = 1) -> jnp.ndarray:
    """[T, Cin] x [k, Cin/groups, Cout] -> [T, Cout], half ('same') padding
    (ggml_conv_1d_ph analog)."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x[None], w,
        window_strides=(1,),
        padding=[(k // 2, (k - 1) // 2)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=groups,
    )[0]
    if b is not None:
        y = y + b
    return y


def group_norm(x: jnp.ndarray, w, b, n_groups: int = 32,
               eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over channels of [T, C] (LLM_NORM_GROUP analog)."""
    t, c = x.shape
    xg = x.reshape(t, n_groups, c // n_groups).astype(jnp.float32)
    mu = xg.mean(axis=(0, 2), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(0, 2), keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(t, c)
    return (y * w + b).astype(x.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=["params"], meta_fields=["kind"])
@dataclasses.dataclass
class PosnetLayer:
    kind: str            # "res" | "attn" | "norm"
    params: dict


@partial(jax.tree_util.register_dataclass,
         data_fields=["embed", "conv_w", "conv_b", "posnet", "tok_norm_w",
                      "tok_norm_b", "convnext", "out_norm_w", "out_norm_b",
                      "head_w", "head_b"],
         meta_fields=[])
@dataclasses.dataclass
class VocoderWeights:
    embed: jnp.ndarray          # [n_codes_vocab, C]
    conv_w: jnp.ndarray         # [k, C, C] stem
    conv_b: jnp.ndarray
    posnet: list                # PosnetLayer
    tok_norm_w: jnp.ndarray
    tok_norm_b: jnp.ndarray
    convnext: list              # dicts
    out_norm_w: jnp.ndarray
    out_norm_b: jnp.ndarray
    head_w: jnp.ndarray         # [C, n_embd_out]
    head_b: jnp.ndarray


def _swish(x):
    return x * jax.nn.sigmoid(x)


def vocoder_forward(w: VocoderWeights, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [T] int32 -> spectral frames [T, n_embd_out] f32."""
    x = jnp.take(w.embed, codes, axis=0).astype(jnp.float32)   # [T, C]
    x = conv1d_same(x, w.conv_w, w.conv_b)

    for layer in w.posnet:
        p = layer.params
        if layer.kind == "res":
            h = group_norm(x, p["norm1_w"], p["norm1_b"])
            h = _swish(h)
            h = conv1d_same(h, p["conv1_w"], p["conv1_b"])
            h = group_norm(h, p["norm2_w"], p["norm2_b"])
            h = _swish(h)
            h = conv1d_same(h, p["conv2_w"], p["conv2_b"])
            x = x + h
        elif layer.kind == "attn":
            h = group_norm(x, p["norm_w"], p["norm_b"])
            q = conv1d_same(h, p["q_w"], p["q_b"])
            k = conv1d_same(h, p["k_w"], p["k_b"])
            v = conv1d_same(h, p["v_w"], p["v_b"])
            att = jax.nn.softmax(q @ k.T / np.sqrt(q.shape[-1]), axis=-1)
            h = conv1d_same(att @ v, p["o_w"], p["o_b"])
            x = x + h
        else:  # final group norm
            x = group_norm(x, p["norm_w"], p["norm_b"])

    x = layer_norm(x, w.tok_norm_w, w.tok_norm_b)
    for p in w.convnext:
        h = conv1d_same(x, p["dw_w"], p["dw_b"], groups=x.shape[-1])
        h = layer_norm(h, p["norm_w"], p["norm_b"])
        h = jax.nn.gelu(h @ p["pw1_w"] + p["pw1_b"], approximate=True)
        h = h @ p["pw2_w"] + p["pw2_b"]
        x = x + h * p["gamma"]

    x = layer_norm(x, w.out_norm_w, w.out_norm_b)
    return x @ w.head_w + w.head_b


def random_vocoder(n_codes_vocab: int = 4096, c: int = 512,
                   n_embd_out: int = 1282, n_convnext: int = 2,
                   seed: int = 0) -> VocoderWeights:
    rng = np.random.default_rng(seed)

    def m(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    def conv(k, cin, cout):
        return m(k, cin, cout, s=0.05)

    def res():
        return PosnetLayer(kind="res", params=dict(
            norm1_w=jnp.ones((c,)), norm1_b=jnp.zeros((c,)),
            conv1_w=conv(3, c, c), conv1_b=jnp.zeros((c,)),
            norm2_w=jnp.ones((c,)), norm2_b=jnp.zeros((c,)),
            conv2_w=conv(3, c, c), conv2_b=jnp.zeros((c,)),
        ))

    posnet = [res(), res(),
              PosnetLayer(kind="attn", params=dict(
                  norm_w=jnp.ones((c,)), norm_b=jnp.zeros((c,)),
                  q_w=conv(1, c, c), q_b=jnp.zeros((c,)),
                  k_w=conv(1, c, c), k_b=jnp.zeros((c,)),
                  v_w=conv(1, c, c), v_b=jnp.zeros((c,)),
                  o_w=conv(1, c, c), o_b=jnp.zeros((c,)),
              )),
              res(), res(),
              PosnetLayer(kind="norm", params=dict(
                  norm_w=jnp.ones((c,)), norm_b=jnp.zeros((c,)),
              ))]
    convnext = [dict(
        dw_w=m(7, 1, c), dw_b=jnp.zeros((c,)),
        norm_w=jnp.ones((c,)), norm_b=jnp.zeros((c,)),
        pw1_w=m(c, 3 * c), pw1_b=jnp.zeros((3 * c,)),
        pw2_w=m(3 * c, c), pw2_b=jnp.zeros((c,)),
        gamma=jnp.ones((c,)) * 0.1,
    ) for _ in range(n_convnext)]
    return VocoderWeights(
        embed=m(n_codes_vocab, c, s=0.1),
        conv_w=conv(7, c, c), conv_b=jnp.zeros((c,)),
        posnet=posnet,
        tok_norm_w=jnp.ones((c,)), tok_norm_b=jnp.zeros((c,)),
        convnext=convnext,
        out_norm_w=jnp.ones((c,)), out_norm_b=jnp.zeros((c,)),
        head_w=m(c, n_embd_out, s=0.02), head_b=jnp.zeros((n_embd_out,)),
    )


def load_vocoder(path) -> VocoderWeights:
    """Load a WavTokenizer-dec GGUF (llama.cpp wavtokenizer tensor names)."""
    from rrs_tpu.gguf.reader import read_gguf

    with read_gguf(path) as g:
        def t(name):
            return jnp.asarray(g.tensor(name).astype(np.float32))

        def conv_t(name):
            # ggml conv weights ne {k, Cin, Cout} -> np (Cout, Cin, k)
            w = g.tensor(name).astype(np.float32)
            return jnp.asarray(w.transpose(2, 1, 0))     # [k, Cin, Cout]

        posnet = []
        for il in range(6):
            p = f"posnet.{il}"
            if il == 2:
                posnet.append(PosnetLayer(kind="attn", params=dict(
                    norm_w=t(f"{p}.attn_norm.weight"),
                    norm_b=t(f"{p}.attn_norm.bias"),
                    q_w=conv_t(f"{p}.attn_q.weight"), q_b=t(f"{p}.attn_q.bias"),
                    k_w=conv_t(f"{p}.attn_k.weight"), k_b=t(f"{p}.attn_k.bias"),
                    v_w=conv_t(f"{p}.attn_v.weight"), v_b=t(f"{p}.attn_v.bias"),
                    o_w=conv_t(f"{p}.attn_output.weight"),
                    o_b=t(f"{p}.attn_output.bias"),
                )))
            elif il == 5:
                posnet.append(PosnetLayer(kind="norm", params=dict(
                    norm_w=t(f"{p}.norm.weight"), norm_b=t(f"{p}.norm.bias"),
                )))
            else:
                posnet.append(PosnetLayer(kind="res", params=dict(
                    norm1_w=t(f"{p}.norm1.weight"), norm1_b=t(f"{p}.norm1.bias"),
                    conv1_w=conv_t(f"{p}.conv1.weight"),
                    conv1_b=t(f"{p}.conv1.bias"),
                    norm2_w=t(f"{p}.norm2.weight"), norm2_b=t(f"{p}.norm2.bias"),
                    conv2_w=conv_t(f"{p}.conv2.weight"),
                    conv2_b=t(f"{p}.conv2.bias"),
                )))
        convnext = []
        il = 0
        while f"convnext.{il}.dw.weight" in g.tensors:
            p = f"convnext.{il}"
            dw = g.tensor(f"{p}.dw.weight").astype(np.float32)
            convnext.append(dict(
                dw_w=jnp.asarray(dw.transpose(2, 1, 0)),
                dw_b=t(f"{p}.dw.bias"),
                norm_w=t(f"{p}.norm.weight"), norm_b=t(f"{p}.norm.bias"),
                pw1_w=t(f"{p}.pw1.weight").T, pw1_b=t(f"{p}.pw1.bias"),
                pw2_w=t(f"{p}.pw2.weight").T, pw2_b=t(f"{p}.pw2.bias"),
                gamma=t(f"{p}.gamma"),
            ))
            il += 1
        return VocoderWeights(
            embed=t("token_embd.weight"),
            conv_w=conv_t("conv1d.weight"), conv_b=t("conv1d.bias"),
            posnet=posnet,
            tok_norm_w=t("token_embd_norm.weight"),
            tok_norm_b=t("token_embd_norm.bias"),
            convnext=convnext,
            out_norm_w=t("output_norm.weight"),
            out_norm_b=t("output_norm.bias"),
            head_w=t("output.weight").T, head_b=t("output.bias"),
        )
