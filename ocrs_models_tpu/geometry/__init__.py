"""First-party computational geometry.

The reference delegates every geometry-critical path to native third-party
code: Shapely/GEOS for polygon offsetting and IoU (datasets/util.py:54-75,
postprocess.py:39-65,102-187), OpenCV for connected components and
min-area rects (postprocess.py:11-36), and PIL for polygon rasterization
(datasets/util.py:78-110). This package implements all of it first-party —
a C++ core (``_native``) with numpy fallbacks — since the TPU build owns its
full stack.
"""

from .polygon import (
    polygon_area,
    convex_hull,
    min_area_rect,
    shrink_polygon,
    expand_polygon,
    expand_quad,
    expand_quads,
    convex_intersection_area,
)
from .raster import fill_polygon, generate_mask
from .components import connected_components, extract_cc_quads
from .metrics import box_match_metrics

__all__ = [
    "polygon_area",
    "convex_hull",
    "min_area_rect",
    "shrink_polygon",
    "expand_polygon",
    "expand_quad",
    "expand_quads",
    "convex_intersection_area",
    "fill_polygon",
    "generate_mask",
    "connected_components",
    "extract_cc_quads",
    "box_match_metrics",
]
