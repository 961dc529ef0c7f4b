"""Matmul-precision control.

On TPU, XLA's default matmul/einsum precision is bfloat16 (one MXU pass).
That is the right default for the imaging/DNN paths, but geometry is NOT
tolerant of it: a 3x3 rotation product at bf16 carries ~1e-2 error, which
multiplied by a focal length is pixels of reprojection error — measured as
a hard 1.5 px convergence floor in bundle adjustment that does not exist
on CPU (f32). The SE(3)/multiview/BA code therefore forces float32
matmuls (XLA's 3-pass bf16x3 emulation; these contractions are tiny or
row-op-bound, so the FLOP cost is irrelevant).

Usage: decorate the outermost entry point (jitted or host-side). The
context is active during tracing, so everything inlined under a jit
inherits it.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Run `fn` (and anything it traces) with float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
