"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of using the CPU backend as the oracle
(tests/test-backend-ops.cpp): pure-jnp reference implementations are the
oracle for Pallas kernels (run in interpret mode on CPU), and multi-chip
sharding logic is exercised on a virtual CPU mesh.
"""

import os

# Must be set before jax initializes its backends. FORCE cpu: the ambient
# environment may point JAX_PLATFORMS at a real TPU (axon tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
# i8p prefill packs triple every TCQ4 layer's pytree leaves — on the CPU
# suite that inflates every jit compile (~3x suite time measured) for a
# path exercised by its dedicated tests. Production default stays ON.
os.environ.setdefault("RRS_PREFILL_I8", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook sets jax_platforms="axon,cpu" through
# jax.config (which beats the env var); force it back to cpu-only and drop
# any backend set initialized before this ran.
jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
