"""rgbd subpackage (see package docstring)."""
