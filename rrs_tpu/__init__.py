"""rrs_tpu — a TPU-native W4A4 quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
skyne98/llama.cpp-rrs (llama.cpp + TCQ4_K32 / Rotated Runtime Smooth):

- ``rrs_tpu.gguf``      — GGUF model-interchange reader/writer (L0)
- ``rrs_tpu.formats``   — quant block codecs: TCQ4 tile, K-quants, FWHT (L1)
- ``rrs_tpu.ops``       — Pallas TPU kernels + jnp reference ops (L2)
- ``rrs_tpu.models``    — model configs and graph builders (L4)
- ``rrs_tpu.runtime``   — KV cache, decode loop, samplers, state I/O (L4)
- ``rrs_tpu.parallel``  — mesh/sharding plans, collectives (replaces ggml-rpc / sched)
- ``rrs_tpu.quantize``  — model quantizer + imatrix collection (tools/quantize, tools/imatrix)
- ``rrs_tpu.serving``   — continuous-batching OpenAI-compatible server (tools/server)
- ``rrs_tpu.tools``     — CLI: generate, perplexity, bench (tools/*)

Design stance (see SURVEY.md §7): the ggml graph interpreter, backend scheduler
and allocator are replaced by jitted JAX functions compiled by XLA; device
kernels are Pallas; multi-chip is GSPMD sharding over a jax Mesh.
"""

__version__ = "0.1.0"
