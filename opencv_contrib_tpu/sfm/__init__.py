"""sfm subpackage (see package docstring)."""
