"""Scalar/vector column-expression helpers (all JVM-side built-ins)."""
