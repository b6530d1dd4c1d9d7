"""Utilities: random generation, serialization, rendering, stats."""
