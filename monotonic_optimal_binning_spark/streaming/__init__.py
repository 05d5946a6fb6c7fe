"""Structured Streaming variants of the engine's windowed operators."""
