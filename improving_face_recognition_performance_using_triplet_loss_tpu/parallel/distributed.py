"""Multi-host initialization (SURVEY.md §5.8: `jax.distributed` + mesh over
ICI with DCN as the outer axis).

On a multi-host TPU pod each process calls ``initialize_distributed()`` once
before any backend use; coordinator/process env vars are auto-detected on
Cloud TPU. On a single host this is a no-op, so the same entry points run
unchanged from one chip to a pod.
"""

from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    when initialization happened, False for the single-process no-op."""
    import jax

    explicit = coordinator_address is not None
    # only coordinator-address env vars count: worker-hostname vars appear on
    # single-host setups too and would mis-trigger initialization
    env_driven = any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not env_driven:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) on a single host."""
    import jax

    return jax.process_index(), jax.process_count()
