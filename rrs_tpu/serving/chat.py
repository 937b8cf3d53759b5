"""Chat templating + tool-call parsing + reasoning extraction
(common/chat*.cpp analog).

Supports the template families of the BASELINE model set (ChatML for Qwen,
Llama-3 header format, Gemma, Mistral) plus a generic fallback. Full Jinja
execution is out of scope; detection keys off the GGUF
``tokenizer.chat_template`` string the same way llama.cpp's
llm_chat_detect_template does. Tool calls use the Hermes-style
``<tool_call>{json}</tool_call>`` convention (common/chat-parser.cpp), with
a bare-JSON fallback; reasoning extraction splits ``<think>...</think>``
(common_chat_params reasoning_format analog).
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Optional


def detect_template(md: dict) -> str:
    tmpl = str(md.get("tokenizer.chat_template", "") or "")
    if "<|im_start|>" in tmpl:
        return "chatml"
    if "<|start_header_id|>" in tmpl:
        return "llama3"
    if "<start_of_turn>" in tmpl:
        return "gemma"
    if "[INST]" in tmpl:
        return "mistral"
    arch = str(md.get("general.architecture", ""))
    if arch.startswith("qwen"):
        return "chatml"
    if arch.startswith("gemma"):
        return "gemma"
    if arch.startswith("llama"):
        return "llama3"
    return "chatml"


def _content_str(m: dict) -> str:
    """OAI messages may carry list-of-parts content; flatten text parts."""
    c = m.get("content")
    if isinstance(c, list):
        return "".join(p.get("text", "") for p in c if isinstance(p, dict))
    return "" if c is None else str(c)


def apply_template(
    name: str,
    messages: list[dict],
    add_assistant: bool = True,
    tools: Optional[list[dict]] = None,
) -> str:
    if tools:
        messages = _inject_tools(messages, tools)
    out = []
    if name == "chatml":
        for m in messages:
            role = m["role"]
            if role == "tool":
                out.append("<|im_start|>user\n<tool_response>\n"
                           f"{_content_str(m)}\n</tool_response><|im_end|>\n")
                continue
            body = _content_str(m)
            if role == "assistant" and m.get("tool_calls"):
                for tc in m["tool_calls"]:
                    fn = tc.get("function", tc)
                    body += ("\n<tool_call>\n" + json.dumps(
                        {"name": fn.get("name"),
                         "arguments": _maybe_json(fn.get("arguments"))})
                        + "\n</tool_call>")
            out.append(f"<|im_start|>{role}\n{body}<|im_end|>\n")
        if add_assistant:
            out.append("<|im_start|>assistant\n")
    elif name == "llama3":
        out.append("<|begin_of_text|>")
        for m in messages:
            role = "ipython" if m["role"] == "tool" else m["role"]
            out.append(
                f"<|start_header_id|>{role}<|end_header_id|>\n\n{_content_str(m)}<|eot_id|>"
            )
        if add_assistant:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    elif name == "gemma":
        # gemma has no system role: fold system text into the first user turn
        sys_txt = ""
        out.append("<bos>")
        for m in messages:
            role = m["role"]
            if role == "system":
                sys_txt = _content_str(m) + "\n\n"
                continue
            role = "model" if role == "assistant" else "user"
            body = sys_txt + _content_str(m) if role == "user" else _content_str(m)
            sys_txt = ""
            out.append(f"<start_of_turn>{role}\n{body}<end_of_turn>\n")
        if add_assistant:
            out.append("<start_of_turn>model\n")
    elif name == "mistral":
        for m in messages:
            if m["role"] == "assistant":
                out.append(f"{_content_str(m)}</s>")
            else:
                out.append(f"[INST] {_content_str(m)} [/INST]")
    else:
        for m in messages:
            out.append(f"{m['role']}: {_content_str(m)}\n")
        if add_assistant:
            out.append("assistant: ")
    return "".join(out)


def stop_strings_for(name: str) -> tuple[str, ...]:
    return {
        "chatml": ("<|im_end|>",),
        "llama3": ("<|eot_id|>",),
        "gemma": ("<end_of_turn>",),
        "mistral": ("</s>",),
    }.get(name, ())


# ---------------------------------------------------------------------------
# Tools (Hermes-style injection + parsing; common/chat.cpp tool-call handling)
# ---------------------------------------------------------------------------

def _maybe_json(v):
    if isinstance(v, str):
        try:
            return json.loads(v)
        except Exception:
            return v
    return v


def _inject_tools(messages: list[dict], tools: list[dict]) -> list[dict]:
    """Prepend a system preamble describing the available tools and the
    <tool_call> convention (the Hermes template family's system block)."""
    specs = []
    for t in tools:
        fn = t.get("function", t)
        specs.append(json.dumps({
            "name": fn.get("name"),
            "description": fn.get("description", ""),
            "parameters": fn.get("parameters", {}),
        }))
    preamble = (
        "You are a function-calling AI. You may call one or more functions "
        "to assist with the user query. Available tools:\n<tools>\n"
        + "\n".join(specs)
        + "\n</tools>\nFor each call, return a JSON object inside "
        "<tool_call></tool_call> tags: "
        '<tool_call>{"name": <name>, "arguments": <args-json>}</tool_call>'
    )
    msgs = list(messages)
    if msgs and msgs[0].get("role") == "system":
        merged = dict(msgs[0])
        merged["content"] = _content_str(msgs[0]) + "\n\n" + preamble
        return [merged] + msgs[1:]
    return [{"role": "system", "content": preamble}] + msgs


_TOOL_CALL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.S)


def parse_tool_calls(text: str):
    """Extract tool calls from generated text. Returns (content, calls) where
    calls is a list of OAI tool_call dicts. Handles <tool_call> blocks and a
    single bare JSON object with name+arguments."""
    calls = []

    def add(obj):
        args = obj.get("arguments", obj.get("parameters", {}))
        calls.append({
            "id": f"call_{uuid.uuid4().hex[:8]}",
            "type": "function",
            "function": {
                "name": obj.get("name", ""),
                "arguments": json.dumps(args) if not isinstance(args, str) else args,
            },
        })

    content = text
    found = _TOOL_CALL_RE.findall(text)
    if found:
        for blob in found:
            try:
                add(json.loads(blob))
            except Exception:
                pass
        content = _TOOL_CALL_RE.sub("", text).strip()
    else:
        stripped = text.strip()
        if stripped.startswith("{") and stripped.endswith("}"):
            try:
                obj = json.loads(stripped)
                if isinstance(obj, dict) and "name" in obj and (
                        "arguments" in obj or "parameters" in obj):
                    add(obj)
                    content = ""
            except Exception:
                pass
    return content, calls


_THINK_RE = re.compile(r"<think>(.*?)</think>", re.S)


def extract_reasoning(text: str):
    """Split <think>...</think> reasoning from content (reasoning_format
    deepseek/qwen3 convention). Returns (reasoning or None, content)."""
    parts = _THINK_RE.findall(text)
    if not parts:
        # unclosed think block (generation cut off mid-reasoning)
        if text.lstrip().startswith("<think>"):
            return text.lstrip()[len("<think>"):].strip(), ""
        return None, text
    content = _THINK_RE.sub("", text)
    return "\n".join(p.strip() for p in parts), content.lstrip("\n")
