"""Device compute: Pallas TPU kernels + jnp reference ops (L2 analog of ggml-cuda)."""
