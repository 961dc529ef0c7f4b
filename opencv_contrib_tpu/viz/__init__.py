"""viz — offscreen 3D visualization (reference: modules/viz + modules/ovis).

TPU-native replacement for the VTK/OGRE-backed viewers: scene widgets lower
to point/line/triangle batches rasterized on device (renderer.py), and
Viz3d renders to arrays / PNG frames instead of a GUI window.
"""

from opencv_contrib_tpu.viz.renderer import (
    render_points, render_lines, render_mesh, viewer_pose)
from opencv_contrib_tpu.viz.widgets import (
    Geometry, merge, cloud, line, polyline, cube, plane, sphere, grid,
    coordinate_system, camera_frustum, trajectory, normals)
from opencv_contrib_tpu.viz.viz3d import Viz3d

__all__ = [
    "render_points", "render_lines", "render_mesh", "viewer_pose",
    "Geometry", "merge", "cloud", "line", "polyline", "cube", "plane",
    "sphere", "grid", "coordinate_system", "camera_frustum", "trajectory",
    "normals", "Viz3d",
]
