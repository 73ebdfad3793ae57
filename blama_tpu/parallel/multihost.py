"""Multi-host SPMD bootstrap.

The reference is strictly single-process (SURVEY.md §5.8); multi-host serving
is new north-star territory: host 0 owns HTTP + sampling, all hosts execute
the same jitted SPMD step over a global mesh, with ICI collectives inside a
slice and DCN across hosts (inserted by GSPMD from the sharding specs in
parallel/sharding.py).

This module is the bootstrap scaffold: `initialize()` wires jax.distributed
from standard TPU environment variables, `global_mesh()` builds the
(dp, tp) mesh over all global devices. The driver validates the sharded step
via __graft_entry__.dryrun_multichip on a virtual device mesh; real multi-host
topologies use exactly the same code path with jax.distributed initialized.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU-environment autodetection."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(dp: int = 1, tp: int | None = None):
    """(dp, tp) mesh over all global devices (use after initialize())."""
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def is_primary() -> bool:
    """True on the host that should own HTTP + sampling (host 0)."""
    return jax.process_index() == 0
