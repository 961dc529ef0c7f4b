"""models subpackage (see package docstring)."""
