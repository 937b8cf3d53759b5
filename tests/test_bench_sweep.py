"""llama-bench analog: param cross-product + output writers.

Reference: /root/reference/tools/llama-bench/llama-bench.cpp —
field list :1416-1448, CREATE TABLE/INSERT writers :1930-1950, varying-
param markdown columns (markdown_printer). Runs the product CLI
(`python -m rrs_tpu bench`) on a tiny GGUF over a real cross-product and
checks every output format parses/round-trips.
"""
import json
import os
import sqlite3
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.export import export_random_gguf

    path = str(tmp_path_factory.mktemp("bench") / "tiny.gguf")
    cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=512, vocab_size=256, context_length=512,
        qk_norm=True)
    export_random_gguf(cfg, path, seed=0,
                       vocab_tokens=[chr(33 + i) for i in range(256)])
    return path


def _run(tiny_gguf, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "rrs_tpu", "bench", "-m", tiny_gguf,
         "--pp", "4", "--tg", "2", "--pg", "4,2", "-r", "1", *extra],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_bench_sweep_jsonl_cross_product(tiny_gguf):
    out = _run(tiny_gguf, "--batch", "1", "2", "--ctk", "bf16", "q8_0",
               "-o", "jsonl")
    rows = [json.loads(l) for l in out.strip().splitlines()]
    # 2 batch x 2 ctk x 3 tests
    assert len(rows) == 12, len(rows)
    assert {r["n_batch"] for r in rows} == {1, 2}
    assert {r["type_k"] for r in rows} == {"bf16", "q8_0"}
    tests = {(r["n_prompt"], r["n_gen"]) for r in rows}
    assert tests == {(4, 0), (0, 2), (4, 2)}
    for r in rows:
        assert r["avg_ts"] > 0 and r["avg_ns"] > 0
        assert r["model_n_params"] > 0 and r["model_size"] > 0
        assert r["backends"] == "XLA/Pallas TPU"


def test_bench_sweep_sql_loads_into_sqlite(tiny_gguf):
    out = _run(tiny_gguf, "-o", "sql")
    db = sqlite3.connect(":memory:")
    db.executescript(out)
    rows = db.execute(
        "SELECT n_prompt, n_gen, avg_ts FROM llama_bench").fetchall()
    assert len(rows) == 3
    assert all(r[2] > 0 for r in rows)


def test_bench_sweep_md_varying_columns(tiny_gguf):
    out = _run(tiny_gguf, "--ctk", "bf16", "q4_0", "-o", "md")
    lines = [l for l in out.strip().splitlines() if l.startswith("|")]
    assert "type_k" in lines[0]       # varying param gets a column
    assert "n_batch" not in lines[0]  # constant params don't
    assert len(lines) == 2 + 6        # header + sep + 2 ctk x 3 tests
    assert all("±" in l for l in lines[2:])


def test_bench_sweep_depth(tiny_gguf):
    out = _run(tiny_gguf, "--depth", "16", "-o", "jsonl")
    rows = [json.loads(l) for l in out.strip().splitlines()]
    assert all(r["n_depth"] == 16 for r in rows)
