"""Command-line entry points (flag-compatible with the reference CLIs)."""
