"""Physical-plan introspection helpers (pushdown/broadcast/codegen checks)."""
