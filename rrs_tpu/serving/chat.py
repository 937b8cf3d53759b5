"""Chat templating (common/chat*.cpp analog, minimal core).

Supports the template families of the BASELINE model set (ChatML for Qwen,
Llama-3 header format) plus a generic fallback. Full Jinja execution is out
of scope; detection keys off the GGUF ``tokenizer.chat_template`` string the
same way llama.cpp's llm_chat_detect_template does.
"""

from __future__ import annotations

from typing import Optional


def detect_template(md: dict) -> str:
    tmpl = str(md.get("tokenizer.chat_template", "") or "")
    if "<|im_start|>" in tmpl:
        return "chatml"
    if "<|start_header_id|>" in tmpl:
        return "llama3"
    if "[INST]" in tmpl:
        return "mistral"
    arch = md.get("general.architecture", "")
    if str(arch).startswith("qwen"):
        return "chatml"
    if str(arch).startswith("llama"):
        return "llama3"
    return "chatml"


def apply_template(
    name: str,
    messages: list[dict],
    add_assistant: bool = True,
) -> str:
    out = []
    if name == "chatml":
        for m in messages:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_assistant:
            out.append("<|im_start|>assistant\n")
    elif name == "llama3":
        out.append("<|begin_of_text|>")
        for m in messages:
            out.append(
                f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
            )
        if add_assistant:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    elif name == "mistral":
        for m in messages:
            if m["role"] == "user":
                out.append(f"[INST] {m['content']} [/INST]")
            elif m["role"] == "assistant":
                out.append(f"{m['content']}</s>")
            else:
                out.append(f"[INST] {m['content']} [/INST]")
    else:
        for m in messages:
            out.append(f"{m['role']}: {m['content']}\n")
        if add_assistant:
            out.append("assistant: ")
    return "".join(out)


def stop_strings_for(name: str) -> tuple[str, ...]:
    return {
        "chatml": ("<|im_end|>",),
        "llama3": ("<|eot_id|>",),
        "mistral": ("</s>",),
    }.get(name, ())
