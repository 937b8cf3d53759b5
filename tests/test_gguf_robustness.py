"""GGUF reader robustness (tests/test-gguf.cpp analog): malformed inputs
must raise clean errors, never crash or allocate absurd amounts."""

import struct

import numpy as np
import pytest

from rrs_tpu.gguf.reader import read_gguf
from rrs_tpu.gguf.writer import GGUFWriter


def _valid(tmp_path):
    w = GGUFWriter(tmp_path / "ok.gguf")
    w.add_string("general.architecture", "llama")
    w.add_uint32("llama.block_count", 1)
    w.add_tensor("t", np.zeros((4, 4), np.float32))
    w.write()
    return tmp_path / "ok.gguf"


def test_valid_roundtrip(tmp_path):
    p = _valid(tmp_path)
    with read_gguf(p) as g:
        assert g.metadata["general.architecture"] == "llama"
        assert g.tensor("t").shape == (4, 4)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(Exception) as e:
        read_gguf(p)
    assert "magic" in str(e.value).lower() or "GGUF" in str(e.value)


def test_truncated_header(tmp_path):
    p = tmp_path / "trunc.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<I", 3))     # version, then nothing
    with pytest.raises(Exception):
        read_gguf(p)


def test_truncated_tensor_data(tmp_path):
    src = _valid(tmp_path)
    data = src.read_bytes()
    p = tmp_path / "cut.gguf"
    p.write_bytes(data[: len(data) - 32])             # drop tensor payload
    try:
        with read_gguf(p) as g:
            with pytest.raises(Exception):
                g.tensor("t")
    except Exception:
        pass                                          # failing at open is fine


def test_absurd_counts(tmp_path):
    """A header claiming 2^60 KVs must not attempt the allocation."""
    p = tmp_path / "huge.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<I", 3)
                  + struct.pack("<q", 0)              # n_tensors
                  + struct.pack("<q", 1 << 60))       # n_kv
    with pytest.raises(Exception):
        read_gguf(p)


def test_unsupported_version(tmp_path):
    p = tmp_path / "v99.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<I", 99)
                  + struct.pack("<q", 0) + struct.pack("<q", 0))
    with pytest.raises(Exception):
        read_gguf(p)
