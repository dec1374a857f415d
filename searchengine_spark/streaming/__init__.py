"""Incremental + streaming index maintenance."""
