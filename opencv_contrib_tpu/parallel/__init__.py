"""parallel subpackage (see package docstring)."""
