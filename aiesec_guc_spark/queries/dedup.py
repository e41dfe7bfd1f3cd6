"""Placeholder — queries added in a later milestone."""
