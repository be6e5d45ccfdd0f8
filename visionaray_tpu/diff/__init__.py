"""Differentiable-rendering extensions beyond plain autodiff.

`boundary`: the silhouette/visibility gradient term (the part of the
pixel-gradient that plain autodiff at fixed hit topology cannot see).
"""

from visionaray_tpu.diff.boundary import (  # noqa: F401
    EdgeAdjacency, boundary_image, build_edge_adjacency,
    shadow_boundary_image, silhouette_mask, sphere_boundary_image,
)
