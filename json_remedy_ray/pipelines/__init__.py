"""Composed Ray Data pipelines."""
