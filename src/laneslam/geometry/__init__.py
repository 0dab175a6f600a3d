"""L2 geometry core: pure jax.numpy, fully batched, CPU/TPU identical.

Everything here is shape-polymorphic over leading batch dimensions and free of
data-dependent control flow, so it composes into jit/shard_map programs.
"""

from laneslam.geometry import se3 as se3
from laneslam.geometry import so3 as so3
from laneslam.geometry import sim3 as sim3
from laneslam.geometry.camera import Camera, project_points, project_line
from laneslam.geometry.lines import (
    plucker_from_endpoints,
    plucker_transform,
    orthonormal_from_plucker,
    plucker_from_orthonormal,
    orthonormal_retract,
)
from laneslam.geometry.umeyama import umeyama_alignment
