"""Column-level function library (all JVM-side; no Python UDFs)."""
