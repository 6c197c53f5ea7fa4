"""Multi-host bring-up (import-light: jax.distributed.initialize must run
before ANYTHING initializes the XLA backend, so this module must not pull
the rest of craytpu)."""

from __future__ import annotations

import os


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize multi-host JAX when configured — the TPU-native analogue
    of the reference's master/worker scene sync (utils/protocol/server.c:369
    syncWithClients): after this, jax.devices() spans every process's chips,
    shard.make_mesh() builds one pod-wide mesh, and the scene pytree is
    replicated to all hosts by ordinary jit input sharding (the analogue of
    loadAssets/loadScene shipping).

    Sources, in precedence order: explicit args, CRAYTPU_COORDINATOR /
    CRAYTPU_NUM_PROCESSES / CRAYTPU_PROCESS_ID env vars, then whatever
    cluster auto-detection jax.distributed itself supports (GKE/Slurm/...).
    Returns True if distributed mode was initialized, False when
    unconfigured (single-process operation). MUST be called before any JAX
    computation or device query.
    """
    coordinator = (coordinator or os.environ.get("CRAYTPU_COORDINATOR")
                   or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator is None:
        return False
    if num_processes is None:
        n = os.environ.get("CRAYTPU_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("CRAYTPU_PROCESS_ID")
        process_id = int(p) if p else None
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
