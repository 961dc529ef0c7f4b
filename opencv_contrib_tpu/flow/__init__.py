"""flow subpackage (see package docstring)."""
