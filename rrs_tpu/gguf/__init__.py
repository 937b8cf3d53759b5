"""GGUF model-interchange format (L0 analog of ggml/src/gguf.cpp + gguf-py)."""

from rrs_tpu.gguf.constants import GGMLType, GGUFValueType
from rrs_tpu.gguf.reader import GGUFFile, GGUFTensorInfo, read_gguf
from rrs_tpu.gguf.writer import GGUFWriter
