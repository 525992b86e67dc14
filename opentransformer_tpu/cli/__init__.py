"""Command-line entry points mirroring the reference CLI surface."""
