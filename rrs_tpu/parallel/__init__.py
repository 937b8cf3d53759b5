"""Mesh sharding & collectives (replaces split-row TP buffers + ggml-rpc; SURVEY §2.7)."""
