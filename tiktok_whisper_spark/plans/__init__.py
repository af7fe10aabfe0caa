"""Physical-plan introspection helpers (pushdown/broadcast/exchange asserts)."""
