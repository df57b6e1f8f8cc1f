"""Multi-host bootstrap.

The reference has no distributed communication at all (SURVEY §2.4).  On a
TPU pod slice, each host runs the same program; `initialize()` wires up the
jax.distributed runtime so `jax.devices()` spans the slice and the mesh
helpers in parallel/mesh.py build global meshes.  Collectives ride ICI
within a slice and DCN across slices — all emitted by XLA from the sharding
annotations; there is no NCCL/MPI-style user-level messaging to manage.

Typical pod-slice training loop:

    from srhmm_tpu.parallel import distributed, make_mesh, shard_batch, shard_model
    distributed.initialize()                      # no-op on a single host
    mesh = make_mesh(n_model=2)                   # global (data, model) mesh
    model = shard_model(model, mesh)
    batch = shard_batch(host_local_batch, mesh)   # per-host shard of the batch
    new_model, lp, nv = em_step(model, batch)     # psum'd over ICI
    if distributed.is_coordinator():
        checkpoint_manager.save(new_model, state)
"""

from __future__ import annotations

import os

import jax


def initialize(**kwargs) -> None:
    """jax.distributed.initialize, skipped when single-host (or already
    initialized).  Env-driven on TPU pods (coordinator discovery is
    automatic); kwargs pass through for manual setups.

    MUST be called before any device/backend query: probing
    jax.process_count() (or jax.devices()) initializes the local backend
    and poisons distributed startup — the original wrapper did exactly
    that and silently swallowed the resulting error, leaving every
    "multi-host" run secretly single-process (caught by
    tests/test_distributed.py's two-process smoke test)."""
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    spec = os.environ.get("JAX_COORDINATOR_ADDRESS") or kwargs.get(
        "coordinator_address"
    )
    num = os.environ.get("JAX_NUM_PROCESSES") or kwargs.get("num_processes")
    if spec is None and num is None and "TPU_WORKER_HOSTNAMES" not in os.environ:
        return  # single host
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # re-init is benign; real failures propagate
        if "already" not in str(e).lower():
            raise


def is_coordinator() -> bool:
    return jax.process_index() == 0
