"""Shared scalar/text/chemistry function helpers."""
