"""Operator library: pure ``DataFrame -> DataFrame`` stage functions."""
