"""Pure-Python/NumPy reference implementations for oracle tests."""
