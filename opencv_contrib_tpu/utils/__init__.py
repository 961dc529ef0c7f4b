"""utils subpackage (see package docstring)."""
