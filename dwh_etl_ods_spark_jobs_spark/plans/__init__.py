"""Declarative job catalog + gated query surface."""
