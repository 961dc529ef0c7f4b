"""Bundle adjustment: vmapped reprojection residuals, Levenberg-Marquardt
with Schur-complement elimination of landmarks.

Parity target: libmv's Ceres-based EuclideanBundle
(sfm/src/libmv/simple_pipeline/bundle.cc:450-678 — ITERATIVE_SCHUR +
SCHUR_JACOBI preconditioner + explicit Schur complement), re-architected
TPU-first: the (camera x point) residual grid is one vmapped projection, the
Schur reduced camera system is built with einsums (MXU work), landmarks are
eliminated with batched 3x3 inverses, and the LM loop is a lax.scan with
in-graph accept/reject — the exact structure that distributes over a mesh
(see parallel.dist_ba).
"""

from opencv_contrib_tpu.ba import bundle

__all__ = ["bundle"]
