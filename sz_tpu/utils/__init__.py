"""Utilities: tracing/observability, stats."""
