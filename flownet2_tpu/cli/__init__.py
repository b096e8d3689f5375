"""CLI entry points."""

from .main import build_parser, main  # noqa: F401
