"""Multiview geometry: fundamental/essential solvers, triangulation,
homography, PnP resection, and a vmapped RANSAC framework.

Capability parity with the reference's sfm public API
(sfm/include/opencv2/sfm/{fundamental,robust,triangulation}.hpp) and
libmv/multiview — rebuilt TPU-first: all solvers are pure batched jnp
functions; RANSAC evaluates all hypotheses in parallel with one vmap
instead of the reference's sequential sampling loop.
"""

from opencv_contrib_tpu.mvg import conditioning, fundamental, triangulation, homography, resection, robust

__all__ = ["conditioning", "fundamental", "triangulation", "homography", "resection", "robust"]
