"""L3 features: line detection (LSD-style), line description (LBD),
point features, and GEMM matching with geometric gates.

All outputs are fixed-capacity arrays + validity masks (static shapes).
"""

from laneslam.features.containers import Segments, Points
from laneslam.features.lsd import detect_lines
from laneslam.features.lbd import describe_lines
from laneslam.features.points import detect_points, describe_points
from laneslam.features.match import match_descriptors, match_lines, match_points
