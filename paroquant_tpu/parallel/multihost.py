"""Multi-host mesh setup (SURVEY.md §5.8 — a first-class new component with
no reference counterpart; the reference delegates all distribution to vLLM).

Topology recipe (the "How to Scale Your Model" shape): put the model/TP axis
on ICI within a host (fast, all-to-all-capable) and the data/DP axis on DCN
across hosts (slow, bandwidth-bound) — `make_multihost_mesh` builds the
(data=n_hosts*d, model=per-host) mesh accordingly. pjit-derived collectives
then ride ICI for the per-token TP all-reduces and DCN only for batch-level
work.

Single-process testing: `jax.config.update('jax_num_cpu_devices', N)` gives
a virtual mesh (see __graft_entry__.dryrun_multichip); real pods call
`initialize()` once per process before any backend use.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(dp_per_host: int = 1) -> Mesh:
    """(data, model) mesh with the model axis inside each host's ICI domain.

    Devices are ordered host-major by jax.devices(); reshaping to
    (hosts, per_host) keeps each host's chips contiguous on the model axis,
    then dp_per_host optionally splits a host into several model groups.
    """
    import jax

    devices = np.array(jax.devices())
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    assert per_host % dp_per_host == 0, (per_host, dp_per_host)
    model = per_host // dp_per_host
    grid = devices.reshape(n_hosts * dp_per_host, model)
    return Mesh(grid, ("data", "model"))
