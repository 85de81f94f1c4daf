import os

# Sharding tests need a multi-device CPU mesh; give the host platform 8
# virtual devices.  Compute-heavy correctness tests prefer the real TPU when
# one is attached (this machine has 1 oversubscribed CPU core — XLA:CPU
# executes even tiny programs in ~0.7s, the TPU is ~1000x faster).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    _tpus = [d for d in jax.devices() if d.platform != "cpu"]
except RuntimeError:
    _tpus = []

if not _tpus:
    # CPU-only environment (e.g. the driver's multichip dry-run box): pin to
    # one CPU device to avoid confusion with the virtual mesh.
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
else:
    # Compiles go through the TPU tunnel (~1-30s per program); persist them.
    # NOTE: TPU-only — CPU compiles can be served by a remote compile service
    # with mismatched machine features, and reloading those AOT blobs
    # hangs/SIGILLs.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def cpu_mesh_devices(n: int = 8):
    """Devices for sharding tests (virtual CPU mesh)."""
    return jax.devices("cpu")[:n]
