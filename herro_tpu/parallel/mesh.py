"""Device mesh construction and shardings.

The reference replicates its model per GPU and load-balances work through a
shared channel (src/lib.rs:154-200). The TPU-native equivalent is a 1-D
``data`` mesh: parameters replicated, batches sharded along the batch axis,
XLA handling placement — scaling to multi-host by simply building the mesh
over all processes' devices (jax.distributed).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | list[int] | tuple[int, ...] | None = None,
    axis: str = "data",
) -> Mesh:
    """Mesh over process-local devices.

    Multi-host runs keep one independent replica pipeline per process (the
    work splits upstream: alignment batches are target-partitioned and
    strided by process index), so meshes never span hosts — exactly the
    reference's replicated-per-device model (src/lib.rs:154-200), with
    jax.distributed supplying the process indexing.
    """
    devs = jax.local_devices()
    if isinstance(n_devices, (list, tuple)):
        # explicit local device indices, like the reference's `-d 0,1,3`
        # (src/main.rs:86-92)
        devs = [devs[i] for i in n_devices]
    elif n_devices is not None and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host runtime init (no-op when single-process).

    ``HERRO_TPU_PLATFORM`` forces the JAX platform through jax.config before
    the backend initialises — needed because an ambient platform plugin can
    override the ``JAX_PLATFORMS`` env var (multi-process CPU tests rely on
    this).
    """
    import os

    forced = os.environ.get("HERRO_TPU_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
