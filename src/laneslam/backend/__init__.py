"""L6 backend: sliding-window point+line BA (GN + Schur) and pose-graph
optimization, formulated as batched XLA programs (BASELINE.json:5)."""

from laneslam.backend.ba import BAProblem, ba_solve
from laneslam.backend.pgo import (
    PgoProblem, PgoSim3Problem, pgo_solve, pgo_solve_sim3,
)
