"""Operational tools (cache warming, diagnostics)."""
