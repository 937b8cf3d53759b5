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


def test_parse_tool_calls_qwen3_coder_xml():
    """Qwen3-Coder XML dialect (chat.cpp:1891 xml_tool_call_format):
    <function=..><parameter=..> with raw values, JSON literals typed."""
    text = ("I'll check the weather.\n<tool_call>\n"
            "<function=get_weather>\n"
            "<parameter=city>\nParis\n</parameter>\n"
            "<parameter=days>\n3\n</parameter>\n"
            "</function>\n</tool_call>")
    content, calls = parse_tool_calls(text, "qwen3-coder")
    assert content == "I'll check the weather."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    args = json.loads(calls[0]["function"]["arguments"])
    assert args == {"city": "Paris", "days": 3}
    # auto-detection picks it up too
    _, auto_calls = parse_tool_calls(text)
    assert len(auto_calls) == 1


def test_parse_tool_calls_seed_oss():
    text = ("<seed:tool_call><function=search>"
            "<parameter=q>llama</parameter>"
            "</function></seed:tool_call>")
    content, calls = parse_tool_calls(text, "seed-oss")
    assert content == "" and len(calls) == 1
    assert calls[0]["function"]["name"] == "search"
    assert json.loads(calls[0]["function"]["arguments"]) == {"q": "llama"}


def test_parse_tool_calls_minimax_m2():
    text = ("answer first\n<minimax:tool_call>\n"
            '<invoke name="lookup"><parameter name="id">42</parameter>'
            '<parameter name="verbose">true</parameter></invoke>\n'
            "</minimax:tool_call>")
    content, calls = parse_tool_calls(text, "minimax-m2")
    assert content == "answer first"
    assert calls[0]["function"]["name"] == "lookup"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "id": 42, "verbose": True}


def test_parse_tool_calls_kimi_k2():
    text = ("<|tool_calls_section_begin|>"
            "<|tool_call_begin|>functions.get_weather:0"
            "<|tool_call_argument_begin|>"
            '{"city": "Tokyo"}<|tool_call_end|>'
            "<|tool_calls_section_end|>")
    content, calls = parse_tool_calls(text, "kimi-k2")
    assert content == "" and len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Tokyo"}
    _, auto_calls = parse_tool_calls(text)
    assert len(auto_calls) == 1


def test_parse_tool_calls_granite():
    text = ("<think>plan</think><response>checking</response>"
            '<|tool_call|>[{"name": "add", "arguments": {"a": 1, "b": 2}}]')
    r, body = extract_reasoning(text)
    assert r == "plan"
    content, calls = parse_tool_calls(body, "granite")
    assert content == "checking"
    assert calls[0]["function"]["name"] == "add"
    assert json.loads(calls[0]["function"]["arguments"]) == {"a": 1, "b": 2}


def test_detect_new_dialects():
    from rrs_tpu.serving.chat import detect_tool_format

    assert detect_tool_format("...<seed:tool_call>...") == "seed-oss"
    assert detect_tool_format("...<minimax:tool_call>...") == "minimax-m2"
    assert detect_tool_format("x<|tool_call_begin|>y") == "kimi-k2"
    assert detect_tool_format(
        "<|im_start|>..<function=f><parameter=p>") == "qwen3-coder"
    assert detect_tool_format("..<|tool_call|>..") == "granite"
    assert detect_tool_format("<|im_start|>assistant") == "hermes"


def test_extract_reasoning_seed_think():
    r, c = extract_reasoning("<seed:think>why</seed:think>done")
    assert r == "why" and c == "done"


def test_parse_tool_calls_nemotron_v2():
    text = ('<think>hm</think>ok '
            '<TOOLCALL>[{"name": "mul", "arguments": {"a": 6, "b": 7}}]'
            "</TOOLCALL>")
    r, body = extract_reasoning(text)
    assert r == "hm"
    content, calls = parse_tool_calls(body, "nemotron-v2")
    assert content == "ok"
    assert calls[0]["function"]["name"] == "mul"
    assert json.loads(calls[0]["function"]["arguments"]) == {"a": 6, "b": 7}
    _, auto_calls = parse_tool_calls(body)
    assert len(auto_calls) == 1


def test_parse_tool_calls_apriel():
    text = ('<tool_calls>[{"name": "ls", "arguments": {"path": "/"}}]'
            "</tool_calls>")
    content, calls = parse_tool_calls(text, "apriel-1.5")
    assert content == "" and calls[0]["function"]["name"] == "ls"


def test_parse_tool_calls_fenced_json_block():
    """EXAONE-style ```json fences inside <tool_call> blocks parse like
    plain hermes blocks (chat-parser.cpp exaone content parser)."""
    text = ('<tool_call>```json\n{"name": "f", "arguments": {"x": 1}}\n```'
            "</tool_call>")
    content, calls = parse_tool_calls(text)
    assert content == "" and calls[0]["function"]["name"] == "f"
    assert json.loads(calls[0]["function"]["arguments"]) == {"x": 1}
