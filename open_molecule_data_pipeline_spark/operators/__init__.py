"""Relational and analytic operators, one module per family."""
