"""Declarative job plans: YAML config -> DataFrame pipelines, CLI, state."""
