"""ba subpackage (see package docstring)."""
