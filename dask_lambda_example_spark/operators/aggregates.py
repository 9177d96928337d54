"""Placeholder — filled in by milestone."""
