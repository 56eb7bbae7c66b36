"""Shared native column-expression helpers."""
