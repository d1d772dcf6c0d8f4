"""Composed plans: catalog stats, rule engine, liftover."""
