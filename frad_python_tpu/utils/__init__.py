"""App-level utilities: CLI parsing, progress telemetry, formatting."""

from . import cli, fmt, process
from .process import ProcessInfo

__all__ = ["ProcessInfo", "cli", "fmt", "process"]
