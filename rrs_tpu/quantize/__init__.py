"""Model quantization + imatrix collection (tools/quantize, tools/imatrix analogs)."""
