"""Utilities: serialization, benchmarking helpers."""

from .serialization import load, save

__all__ = ["load", "save"]
