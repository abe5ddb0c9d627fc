"""Ingestion sources: PDF directory scan, multimodal binary columns."""
