"""Jinja chat templating (common/chat.cpp + common/jinja/ analog) against
the reference's shipped templates, with transformers' renderer as an
independent oracle, plus tool-call dialect parsers (test-chat.cpp cases)."""

import json
import pathlib

import pytest

from rrs_tpu.serving.chat import (build_prompt, detect_tool_format,
                                  extract_reasoning, parse_tool_calls,
                                  render_jinja)

TDIR = pathlib.Path("/root/reference/models/templates")

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "What's 2+2?"},
    {"role": "assistant", "content": "4."},
    {"role": "user", "content": "And 3+3?"},
]

TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get the weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}},
                       "required": ["city"]},
    },
}]


TEMPLATES = [
    ("Qwen-Qwen3-0.6B.jinja", "<|im_start|>assistant"),
    ("Qwen-Qwen2.5-7B-Instruct.jinja", "<|im_start|>assistant"),
    ("meta-llama-Llama-3.1-8B-Instruct.jinja",
     "<|start_header_id|>assistant<|end_header_id|>"),
    ("google-gemma-2-2b-it.jinja", "<start_of_turn>model"),
    ("mistralai-Mistral-Nemo-Instruct-2407.jinja", "[/INST]"),
    ("deepseek-ai-DeepSeek-R1-Distill-Qwen-32B.jinja", "Assistant"),
    ("NousResearch-Hermes-2-Pro-Llama-3-8B-tool_use.jinja",
     "<|im_start|>assistant"),
    ("CohereForAI-c4ai-command-r7b-12-2024-tool_use.jinja",
     "<|CHATBOT_TOKEN|>"),
    ("openai-gpt-oss-20b.jinja", "<|start|>assistant"),
    ("microsoft-Phi-3.5-mini-instruct.jinja", "<|assistant|>"),
]


def _skip_missing(name):
    p = TDIR / name
    if not p.exists():
        pytest.skip(f"{name} not in reference templates")
    return p.read_text(encoding="utf-8")


@pytest.mark.parametrize("name,marker", TEMPLATES)
def test_render_matches_transformers(name, marker):
    tmpl = _skip_missing(name)
    special = {"bos_token": "<s>", "eos_token": "</s>"}
    try:
        ours = render_jinja(tmpl, MSGS, add_generation_prompt=True,
                            special=special)
    except Exception:                                       # noqa: BLE001
        # some templates reject these inputs (tool_use-only templates
        # iterate tools unconditionally) — the oracle must agree
        from transformers.utils.chat_template_utils import render_jinja_template
        with pytest.raises(Exception):
            render_jinja_template(conversations=[MSGS], chat_template=tmpl,
                                  add_generation_prompt=True, tools=None,
                                  **special)
        return
    assert marker in ours
    assert "What's 2+2?" in ours

    from transformers.utils.chat_template_utils import render_jinja_template
    theirs = render_jinja_template(
        conversations=[MSGS], chat_template=tmpl,
        add_generation_prompt=True, tools=None, **special)[0][0]
    assert ours == theirs


@pytest.mark.parametrize("name", [
    "Qwen-Qwen3-0.6B.jinja",
    "NousResearch-Hermes-2-Pro-Llama-3-8B-tool_use.jinja",
    "meta-llama-Llama-3.1-8B-Instruct.jinja",
    "mistralai-Mistral-Nemo-Instruct-2407.jinja",
])
def test_render_with_tools(name):
    tmpl = _skip_missing(name)
    special = {"bos_token": "<s>", "eos_token": "</s>"}
    msgs = [{"role": "user", "content": "Weather in Paris?"}]
    ours = render_jinja(tmpl, msgs, tools=TOOLS, add_generation_prompt=True,
                        special=special)
    assert "get_weather" in ours

    from transformers.utils.chat_template_utils import render_jinja_template
    theirs = render_jinja_template(
        conversations=[msgs], chat_template=tmpl,
        add_generation_prompt=True, tools=TOOLS, **special)[0][0]
    assert ours == theirs


def test_build_prompt_falls_back():
    text, stops = build_prompt("", "chatml",
                               [{"role": "user", "content": "hi"}])
    assert text.startswith("<|im_start|>user")
    assert "<|im_end|>" in stops
    # broken template -> fallback
    text2, _ = build_prompt("{{ undefined_fn() }}", "chatml",
                            [{"role": "user", "content": "hi"}])
    assert text2 == text


# -- tool-call dialect parsing (common/chat-parser.cpp analog) -------------

def test_detect_tool_format():
    assert detect_tool_format(_skip_missing(
        "NousResearch-Hermes-2-Pro-Llama-3-8B-tool_use.jinja")) == "hermes"
    assert detect_tool_format(_skip_missing(
        "mistralai-Mistral-Nemo-Instruct-2407.jinja")) == "mistral"
    assert detect_tool_format(_skip_missing(
        "CohereForAI-c4ai-command-r7b-12-2024-tool_use.jinja")) == "command-r7b"
    assert detect_tool_format(_skip_missing(
        "meta-llama-Llama-3.1-8B-Instruct.jinja")) == "llama3"


def _one(calls):
    assert len(calls) == 1
    fn = calls[0]["function"]
    return fn["name"], json.loads(fn["arguments"])


def test_parse_hermes():
    content, calls = parse_tool_calls(
        'Sure.\n<tool_call>\n{"name": "get_weather", '
        '"arguments": {"city": "Paris"}}\n</tool_call>', "hermes")
    assert content == "Sure."
    assert _one(calls) == ("get_weather", {"city": "Paris"})


def test_parse_mistral():
    content, calls = parse_tool_calls(
        '[TOOL_CALLS][{"name": "get_weather", "arguments": '
        '{"city": "Paris"}, "id": "123456789"}]', "mistral")
    assert content == ""
    name, args = _one(calls)
    assert name == "get_weather" and args == {"city": "Paris"}
    assert calls[0]["id"] == "123456789"


def test_parse_deepseek():
    text = ("<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"Paris\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    content, calls = parse_tool_calls(text, "deepseek")
    assert content == ""
    assert _one(calls) == ("get_weather", {"city": "Paris"})


def test_parse_command_r7b():
    text = ('<|START_ACTION|>[{"tool_call_id": "0", "tool_name": '
            '"get_weather", "parameters": {"city": "Paris"}}]<|END_ACTION|>')
    content, calls = parse_tool_calls(text, "command-r7b")
    assert content == ""
    assert _one(calls) == ("get_weather", {"city": "Paris"})


def test_parse_functionary_31():
    content, calls = parse_tool_calls(
        '<function=get_weather>{"city": "Paris"}</function>',
        "functionary-3.1")
    assert content == ""
    assert _one(calls) == ("get_weather", {"city": "Paris"})


def test_parse_gpt_oss():
    text = ('<|channel|>commentary to=functions.get_weather '
            '<|constrain|>json<|message|>{"city": "Paris"}<|call|>')
    content, calls = parse_tool_calls(text, "gpt-oss")
    assert content == ""
    assert _one(calls) == ("get_weather", {"city": "Paris"})


def test_parse_llama3_bare_json():
    content, calls = parse_tool_calls(
        '{"name": "get_weather", "parameters": {"city": "Paris"}}', "llama3")
    assert content == ""
    assert _one(calls) == ("get_weather", {"city": "Paris"})


def test_reasoning_command_r():
    r, c = extract_reasoning(
        "<|START_THINKING|>hmm<|END_THINKING|>The answer is 4.")
    assert r == "hmm" and c == "The answer is 4."
    r2, c2 = extract_reasoning("<think>step</think>\nOK")
    assert r2 == "step" and c2 == "OK"
