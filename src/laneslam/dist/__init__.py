"""L7 distributed layer: mesh construction, collective wrappers, sharded
frontend/backend steps (SURVEY.md §2.2-§2.3).

All code here is SPMD over a `jax.sharding.Mesh` with axes ('frame', 'block'):
  frame — data/trajectory parallelism (frames, keyframe spans)
  block — landmark-block (tensor) parallelism for Schur-reduced BA
The same programs run on 1 device, a fake 8-device CPU mesh, and a multi-host
pod slice; only mesh construction differs.
"""

from laneslam.dist import collectives
from laneslam.dist.init import ensure_initialized, init_distributed, process_info
from laneslam.dist.mesh import make_mesh, local_mesh
