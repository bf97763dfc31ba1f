"""Utilities: image metrics, visualization, profiling."""
