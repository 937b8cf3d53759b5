"""Quant block codecs and transforms (L1 analog of ggml-quants.c / ggml-common.h)."""

from rrs_tpu.formats.fwht import (
    fwht,
    fwht_np,
    hadamard_matrix,
    rotation_matrix,
)
from rrs_tpu.formats.tcq4 import (
    TCQ4Tensor,
    quantize_tcq4,
    dequantize_tcq4,
    quantize_activations_rrs,
    dequantize_activations_rrs,
)
