"""Catalog layer: document/category state tables + set-based mutations."""
