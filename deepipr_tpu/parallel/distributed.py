"""Multi-host initialization (production scale-out entry point).

The reference has no multi-node path (torch DataParallel only). For multi-host
TPU pods, JAX's single-controller runtime just needs jax.distributed.initialize
before first device use; SPMD sharding in parallel/mesh.py then spans all
hosts' devices automatically (collectives ride ICI within a slice).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> bool:
    """Initialize jax.distributed when configured; no-op on single host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are not given. With auto=True (the CLIs' --multihost flag) and
    no explicit configuration, calls jax.distributed.initialize() bare so TPU
    pod runtimes auto-detect the topology. Returns True iff distributed mode
    was initialized. Must run before first device use.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes is None:
        if not auto:
            return False
        jax.distributed.initialize()  # TPU pod auto-detection
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
