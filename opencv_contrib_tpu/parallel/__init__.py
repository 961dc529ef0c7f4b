"""Distributed execution: device meshes, sharded BA, ring matching sweeps.

The reference has NO distributed backend (SURVEY §5.8: no MPI/NCCL anywhere;
parallelism tops out at intra-process threads + single-GPU streams), so this
layer is designed fresh, TPU-native:

- mesh: canonical mesh axes ("dp", "sp") — dp shards frames/views/batches,
  sp shards tracks/points/map blocks (the SP/ring analog of SURVEY P9).
- dist_ba: Schur BA with the observation grid sharded over the mesh; XLA
  GSPMD inserts the psum/all-gather collectives for the reduced camera
  system (the "annotate shardings, let XLA insert collectives" recipe).
- ring_match: all-pairs descriptor matching where each device owns a block
  of images and descriptor blocks travel the ring via ppermute — the
  ring-attention-like sweep replacing the reference's quadratic
  single-process loop (nRobustViewMatching.cc:154).
- submap_shard: map blocks (LargeKinFu submaps) assigned to shards;
  boundary-constraint Gauss-Newton with psum'd 6x6 block systems —
  ICI carries 6 floats per submap, not the point sets.
- checkpoint: orbax-backed (npz fallback) pytree checkpointing of
  distributed SLAM/SfM state for preemptible pods (SURVEY §5.4).
- multihost: jax.distributed initialization helpers for pod slices.
"""

from opencv_contrib_tpu.parallel import checkpoint, dist_ba, dist_sfm, mesh, ring_match, submap_shard

__all__ = ["checkpoint", "dist_ba", "dist_sfm", "mesh", "ring_match", "submap_shard"]
