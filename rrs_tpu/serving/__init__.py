"""Serving: continuous-batching engine + OpenAI-compatible HTTP (tools/server analog)."""
