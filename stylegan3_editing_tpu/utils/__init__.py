"""User-facing helpers: transforms math, CLI parsing, visualization."""
