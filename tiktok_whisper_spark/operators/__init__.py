"""Operator library: relational, edge-derivation, dedup, similarity, text."""
