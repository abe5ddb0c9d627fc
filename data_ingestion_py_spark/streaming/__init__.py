"""Structured Streaming layer: command stream + windowed analytics."""
