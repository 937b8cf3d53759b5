"""Chat templating, tool-call parsing, reasoning extraction
(common/chat*.cpp analog tests)."""

import json

from rrs_tpu.serving.chat import (
    apply_template,
    detect_template,
    extract_reasoning,
    parse_tool_calls,
    stop_strings_for,
)


def test_detect_templates():
    assert detect_template({"tokenizer.chat_template": "x<|im_start|>y"}) == "chatml"
    assert detect_template({"tokenizer.chat_template": "<|start_header_id|>"}) == "llama3"
    assert detect_template({"tokenizer.chat_template": "<start_of_turn>"}) == "gemma"
    assert detect_template({"general.architecture": "gemma3"}) == "gemma"
    assert detect_template({"general.architecture": "qwen3"}) == "chatml"


def test_gemma_template_folds_system():
    txt = apply_template("gemma", [
        {"role": "system", "content": "be kind"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "bye"},
    ])
    assert txt.startswith("<bos><start_of_turn>user\nbe kind\n\nhi<end_of_turn>")
    assert "<start_of_turn>model\nhello<end_of_turn>" in txt
    assert txt.endswith("<start_of_turn>model\n")
    assert stop_strings_for("gemma") == ("<end_of_turn>",)


def test_tool_injection_and_roundtrip():
    tools = [{"type": "function", "function": {
        "name": "get_weather",
        "description": "weather lookup",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}}},
    }}]
    txt = apply_template("chatml", [{"role": "user", "content": "weather?"}],
                         tools=tools)
    assert "<tools>" in txt and "get_weather" in txt
    assert txt.index("get_weather") < txt.index("weather?")

    # assistant tool_calls + tool response rendering
    txt = apply_template("chatml", [
        {"role": "user", "content": "w?"},
        {"role": "assistant", "content": "",
         "tool_calls": [{"function": {"name": "get_weather",
                                      "arguments": '{"city": "Paris"}'}}]},
        {"role": "tool", "content": '{"temp": 21}'},
    ])
    assert "<tool_call>" in txt and '"city": "Paris"' in txt
    assert "<tool_response>" in txt


def test_parse_tool_calls_hermes():
    text = ('thinking...\n<tool_call>\n{"name": "f", "arguments": {"x": 1}}'
            "\n</tool_call>")
    content, calls = parse_tool_calls(text)
    assert content == "thinking..."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "f"
    assert json.loads(calls[0]["function"]["arguments"]) == {"x": 1}


def test_parse_tool_calls_bare_json():
    content, calls = parse_tool_calls('{"name": "g", "arguments": {}}')
    assert content == "" and calls[0]["function"]["name"] == "g"
    content, calls = parse_tool_calls("no calls here")
    assert content == "no calls here" and calls == []


def test_extract_reasoning():
    r, c = extract_reasoning("<think>step 1</think>answer")
    assert r == "step 1" and c == "answer"
    r, c = extract_reasoning("plain")
    assert r is None and c == "plain"
    # unclosed (cut off mid-reasoning)
    r, c = extract_reasoning("<think>partial thought")
    assert r == "partial thought" and c == ""


def test_multimodal_content_parts():
    txt = apply_template("chatml", [
        {"role": "user", "content": [
            {"type": "text", "text": "part1 "},
            {"type": "text", "text": "part2"},
        ]}])
    assert "part1 part2" in txt
