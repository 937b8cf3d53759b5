"""CLI tools (L6 analog of tools/): generate, perplexity, bench, quantize."""
