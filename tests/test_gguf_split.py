"""gguf-split shard/merge tests (tools/gguf-split analog)."""

import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model
from rrs_tpu.tools.gguf_split import find_shards, merge_gguf, split_gguf
from rrs_tpu.gguf.reader import read_gguf

CFG = ModelConfig(
    arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
    head_dim=64, n_ff=512, vocab_size=128, context_length=256, qk_norm=True,
)


def test_split_load_merge_roundtrip(tmp_path):
    src = tmp_path / "m.gguf"
    export_random_gguf(CFG, src, seed=0)
    shards = split_gguf(src, tmp_path / "m", 3)
    assert len(shards) == 3
    assert find_shards(shards[1]) == shards

    # loading from any shard of the set works
    cfg, weights, md = load_model(shards[0])
    assert cfg.n_layers == CFG.n_layers
    assert md["split.count"] == 3

    merged = merge_gguf(shards[0], tmp_path / "merged.gguf")
    with read_gguf(src) as a, read_gguf(merged) as b:
        assert set(a.tensors) == set(b.tensors)
        for name in a.tensors:
            np.testing.assert_array_equal(
                a.tensor_bytes(name), b.tensor_bytes(name)
            )
