"""Runtime: KV cache management, decode loop, samplers, state I/O (L4 analog)."""
