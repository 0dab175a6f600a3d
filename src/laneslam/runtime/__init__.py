"""L0 runtime: checkpointing, host I/O prefetch, device utilities."""

from laneslam.runtime.checkpoint import load_system_state, save_system_state
from laneslam.runtime.prefetch import Prefetcher
