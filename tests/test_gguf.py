"""GGUF writer/reader round-trip tests (analog of tests/test-gguf.cpp)."""

import numpy as np
import pytest

from rrs_tpu.gguf import GGUFWriter, GGMLType, read_gguf
from rrs_tpu.gguf.constants import tcq4_perm_key


def test_roundtrip_kv_and_tensors(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path)
    w.add_string("general.architecture", "qwen3")
    w.add_uint32("qwen3.block_count", 28)
    w.add_float32("qwen3.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_bool("tcq4.reorder.enabled", True)
    w.add_array("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add_array(tcq4_perm_key("blk.0.attn_q.weight"), np.arange(256, dtype=np.int32))
    w.add_array("some.floats", [1.0, 2.5])

    a = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((16,)).astype(np.float16)
    w.add_tensor("a", a)
    w.add_tensor("b", b)
    w.write()

    with read_gguf(path) as g:
        assert g.metadata["general.architecture"] == "qwen3"
        assert g.metadata["qwen3.block_count"] == 28
        assert abs(g.metadata["qwen3.attention.layer_norm_rms_epsilon"] - 1e-6) < 1e-12
        assert g.metadata["tcq4.reorder.enabled"] is True
        assert g.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello"]
        np.testing.assert_array_equal(
            g.metadata[tcq4_perm_key("blk.0.attn_q.weight")], np.arange(256)
        )
        np.testing.assert_allclose(g.metadata["some.floats"], [1.0, 2.5])

        assert g.tensors["a"].shape == (4, 8)
        assert g.tensors["a"].ggml_type == GGMLType.F32
        np.testing.assert_array_equal(g.tensor("a"), a)
        np.testing.assert_array_equal(g.tensor("b"), b)


def test_alignment_and_offsets(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path)
    # 3 tensors with sizes that are not multiples of the 32B alignment
    ts = [np.arange(n, dtype=np.float32) for n in (3, 5, 7)]
    for i, t in enumerate(ts):
        w.add_tensor(f"t{i}", t)
    w.write()
    with read_gguf(path) as g:
        assert g.data_start % 32 == 0
        for i, t in enumerate(ts):
            info = g.tensors[f"t{i}"]
            assert info.offset % 32 == 0
            np.testing.assert_array_equal(g.tensor(f"t{i}"), t)


def test_bf16_tensor(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path)
    x = np.array([1.5, -2.25, 0.0, 3.0], np.float32)
    bf16 = (x.view(np.uint32) >> 16).astype(np.uint16)
    w.add_tensor("x", bf16.tobytes(), shape=(4,), ggml_type=GGMLType.BF16)
    w.write()
    with read_gguf(path) as g:
        np.testing.assert_array_equal(g.tensor("x"), x)


def test_bad_magic(tmp_path):
    path = tmp_path / "bad.gguf"
    path.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GGUF"):
        read_gguf(path)
