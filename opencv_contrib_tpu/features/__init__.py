"""features subpackage (see package docstring)."""
