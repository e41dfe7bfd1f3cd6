"""Composite DataFrame operators (pure transforms, no I/O)."""
