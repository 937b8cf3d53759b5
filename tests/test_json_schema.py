"""JSON schema -> GBNF tests (test-json-schema-to-grammar analog)."""

import json

import pytest

from rrs_tpu.runtime.grammar import Grammar
from rrs_tpu.runtime.json_schema import json_schema_to_gbnf


def _complete(g: Grammar, s: str) -> bool:
    c = g.copy()
    return c.accept_text(s) and c.done


def test_object_with_required_and_optional():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name"],
    }
    g = Grammar(json_schema_to_gbnf(schema))
    assert _complete(g, '{"name":"bob","age":42}')
    assert _complete(g, '{"name":"bob"}')
    assert not _complete(g, '{"age":42}')
    assert not _complete(g, '{"name":42}')


def test_enum_and_const():
    g = Grammar(json_schema_to_gbnf({"enum": ["red", "green", 3]}))
    assert _complete(g, '"red"')
    assert _complete(g, "3")
    assert not _complete(g, '"blue"')
    g2 = Grammar(json_schema_to_gbnf({"const": True}))
    assert _complete(g2, "true")
    assert not _complete(g2, "false")


def test_array_of_numbers():
    g = Grammar(json_schema_to_gbnf({"type": "array", "items": {"type": "number"}}))
    assert _complete(g, "[1,2.5,-3e2]")
    assert _complete(g, "[]")
    assert not _complete(g, '["x"]')


def test_freeform_json():
    g = Grammar(json_schema_to_gbnf({}))
    for doc in ('{"a":[1,{"b":null}]}', "[true,false]", '"str"', "12.5"):
        assert _complete(g, doc), doc
    assert not _complete(g, "{broken")


def test_nested_objects():
    schema = {
        "type": "object",
        "properties": {
            "user": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"],
            },
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["user", "tags"],
    }
    g = Grammar(json_schema_to_gbnf(schema))
    assert _complete(g, '{"user":{"id":7},"tags":["a","b"]}')
    assert not _complete(g, '{"user":{},"tags":[]}')
