"""Utilities: progress callbacks, profiling, audio I/O helpers."""
