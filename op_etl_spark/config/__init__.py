"""Declarative source-spec configuration — the engine's query language."""

from .loader import load_config, normalize_source

__all__ = ["load_config", "normalize_source"]
