"""App-level utilities: CLI parsing, progress telemetry, formatting."""
