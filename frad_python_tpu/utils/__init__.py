"""App-level utilities: CLI parsing, stream telemetry, formatting."""

from . import cli, fmt, telemetry
from .telemetry import StreamStats, status_line

__all__ = ["StreamStats", "cli", "fmt", "status_line", "telemetry"]
