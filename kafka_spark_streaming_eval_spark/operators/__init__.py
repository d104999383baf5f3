"""Filled in by later build phases."""
