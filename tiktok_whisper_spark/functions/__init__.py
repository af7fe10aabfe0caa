"""Scalar/vector column functions (Catalyst expressions first, pandas UDFs second)."""
