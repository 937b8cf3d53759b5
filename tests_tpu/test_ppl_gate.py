"""On-TPU quantization-quality gate (BASELINE "PPL Delta <= 0.6 vs FP16"
north star, translated to the trained-byte-model eval — see
benchmarks/ppl_pipeline.py for the derivation of the nats/byte budget).

The pipeline itself (train >=100M params for >=5k steps, export,
imatrix, quantize, held-out eval) runs as a benchmark because it takes
~1h of chip time:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ppl_pipeline.py \
        --layers 12 --embd 768 --ff 3072 --heads 12 --steps 5000 \
        --out benchmarks/ppl_results.json

This test asserts the recorded artifact passes every gate, so a quality
regression fails the suite instead of hiding in a stale PERF.md table.
"""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).parent.parent / "benchmarks" / "ppl_results.json"


@pytest.fixture(scope="module")
def results():
    if not ARTIFACT.exists():
        pytest.skip("benchmarks/ppl_results.json not present — run "
                    "benchmarks/ppl_pipeline.py --out first")
    return json.loads(ARTIFACT.read_text())


def test_model_scale(results):
    """The proxy model must be large/trained enough to carry the claim."""
    assert results["n_params_m"] >= 100.0
    assert results["train_steps"] >= 5000
    import math

    assert results["final_train_loss"] < math.log(256) * 0.5


def test_reference_orderings(results):
    """README.md:43-45 orderings reproduce: 8-bit ~ f32 < 4-bit K-quants
    (bit ladder) and imatrix reorder <= no-reorder."""
    assert results["ordering_ok"]
    assert results["reorder_improves"]


def test_tcq4_delta_gate(results):
    """Delta(TCQ4-reorder - f32) stays within the 0.6-PPL-equivalent
    budget (CI-robust: mean + 2*se under the nats/byte gate)."""
    assert results["gate_delta_ok"]
    assert results["gate_reorder_ok"]
    g = results["paired_stats_vs_f32"]["tcq4_reorder"]
    assert g["dnll"] + 2 * g["se"] <= results["gate_nats_per_byte"]
