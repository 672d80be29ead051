"""Worker for the two-process multihost test (tests/test_multihost.py).

Each process owns 2 virtual CPU devices; jax.distributed glues them into a
4-device global mesh.  Exercises init_multihost + put_global_batch + one
data-parallel train step — the real DCN code path of train_cli.py.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    # Bring up the Gloo transport NOW, at the point of minimal skew (same
    # rationale as mesh.init_multihost): its handshake has fixed ~30 s
    # deadlines, and deferring it to the first real collective — after the
    # heavy imports and per-process compiles below — lets inter-process
    # skew blow through them under host load.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("worker:boot")

    # The pytest parent exports JAX_COMPILATION_CACHE_DIR; a cache directory
    # SHARED between coordinated processes breaks the Gloo rendezvous, so
    # re-point through enable_compilation_cache, which splits it per process
    # under multihost (this also exercises the product-side fix).
    cache = os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    if cache:
        from mdctgan_tpu.parallel.mesh import enable_compilation_cache

        enable_compilation_cache(cache)

    import numpy as np
    import jax.numpy as jnp
    import optax

    from mdctgan_tpu.configs import tiny_discriminator, tiny_generator, tiny_spectral
    from mdctgan_tpu.ops.features import SpectralTransform
    from mdctgan_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        put_global_batch,
        replicate,
    )
    from mdctgan_tpu.train.state import create_train_state
    from mdctgan_tpu.train.step import build_train_step

    cfg = tiny_spectral()
    transform = SpectralTransform(cfg)
    gen, disc = tiny_generator(), tiny_discriminator()
    g_tx = optax.adam(2e-4, b1=0.5)
    d_tx = optax.adam(2e-4, b1=0.5)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(
        gen, disc, transform, g_tx, d_tx, num_d=2, n_layers_d=2, donate=False
    )

    mesh = make_mesh(None)  # global mesh over all 4 devices
    assert mesh.devices.size == 2 * num_procs
    state = replicate(state, mesh)
    sharding = batch_sharding(mesh)

    # per-host LOCAL batch of 2 -> global batch of 4
    rng = np.random.default_rng(pid)
    local = {
        "lr_audio": rng.standard_normal((2, cfg.segment_length)).astype(np.float32),
        "hr_audio": rng.standard_normal((2, cfg.segment_length)).astype(np.float32),
    }
    batch = put_global_batch(local, sharding)
    assert batch["lr_audio"].shape == (2 * num_procs, cfg.segment_length)

    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert int(jax.device_get(new_state.step)) == 1
    print(f"proc {pid} OK:", vals["loss_G"], flush=True)


if __name__ == "__main__":
    main()
