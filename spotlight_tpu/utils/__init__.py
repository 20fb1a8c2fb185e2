"""Shared utilities: batching, RNG, serialization."""
