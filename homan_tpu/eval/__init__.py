"""Evaluation: point metrics, SDF interaction metrics, chunk interpolation."""
