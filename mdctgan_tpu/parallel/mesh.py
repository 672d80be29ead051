"""Device mesh + sharding utilities.

The reference is single-GPU (SURVEY.md §2.3: DataParallel commented out,
--local_rank dead).  The TPU-native scaling story is:

  * one ``jax.sharding.Mesh`` over the slice's ICI, default axes
    ``('data',)`` — batch-sharded DP, replicated params (G is tens of M
    params; parameter sharding buys nothing at this scale);
  * the jitted train step takes sharded batches + replicated state and XLA
    inserts the gradient all-reduces (psum over 'data');
  * multi-host (DCN) reuses the same program via jax.distributed — each host
    feeds its local shard of the batch.

Everything works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) for testing.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS`` effective even when a sitecustomize registered
    a backend plugin at interpreter startup (which defeats the plain env
    var).  ``jax.config.update`` wins as long as no backend is initialized
    yet, so entry points call this before touching any array."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def set_default_matmul_precision(precision: str) -> None:
    """Apply ``--matmul_precision`` to every matmul/conv that does not pin
    its own (the spectral-transform matmuls always run HIGHEST).  On TPU
    'default' means single-pass bf16 inputs for f32 convs — measured ~4e-2
    relative vs a float64 oracle through the flagship serving chain
    (tools/flagship_infer_truth.py); 'highest' restores f32 exactness."""
    if precision and precision != "default":
        jax.config.update("jax_default_matmul_precision", precision)


def enable_compilation_cache(path: str) -> None:
    """Persistent XLA compilation cache: the flagship train step takes
    minutes to compile; cached executables make restarts near-instant.

    Under multi-process (after ``init_multihost``) each process gets its own
    subdirectory: two coordinated processes sharing ONE cache directory on
    the same filesystem reproducibly break the Gloo/coordination rendezvous
    (measured A/B — pair passes with separate caches, fails 2/2 with a
    shared one; tests/test_multihost.py exercises this path).  Call AFTER
    ``init_multihost`` so the process index is known."""
    # Only the private import is allowed to fail (it reads the process index
    # WITHOUT initializing a backend; the public jax.process_count() would).
    # If it moves in a future JAX, fall back to the public API rather than
    # silently skipping the cache + per-process split entirely.
    try:
        from jax._src import distributed

        num = getattr(distributed.global_state, "num_processes", None) or 1
        pid = distributed.global_state.process_id if num > 1 else 0
    except Exception:
        num = jax.process_count()
        pid = jax.process_index()
    if num > 1:
        path = os.path.join(path, f"proc{pid}")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"[mesh] WARNING: compilation cache disabled: {e}", flush=True)


def init_multihost(coordinator: Optional[str] = None) -> None:
    """DCN multi-host bring-up (SURVEY.md §5.8): same pjit program, one
    process per host, each feeding its local batch shard.  No-op when JAX
    auto-detects a single process."""
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    jax.distributed.initialize(**kwargs)
    if jax.process_count() > 1:
        # Establish the cross-process collective transport NOW, while every
        # process sits at the same cheap point.  Left lazy, it would first
        # initialize at the first real collective — after minutes of
        # per-process model building/compiles — and the transport bring-up
        # runs on fixed ~30 s handshake deadlines that inter-process skew
        # can blow through (observed with Gloo on CPU under host load).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mdctgan:init_multihost")


def put_global_batch(batch, sharding):
    """Assemble a GLOBAL batch-sharded array from per-process local data.

    Single-process: plain device_put.  Multi-process: each host contributes
    its local slice (jax.make_array_from_process_local_data), so the global
    batch is batch_size * process_count without any cross-host copy."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
