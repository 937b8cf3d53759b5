"""Model library (L4 analog of src/ = libllama): configs, weights, graph builders."""

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.linear import DenseLinear, TCQ4Linear, linear_apply
