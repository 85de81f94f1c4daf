import os
import subprocess
import sys

# Sharding tests need a multi-device CPU mesh; give the host platform 8
# virtual devices.  Compute-heavy correctness tests prefer the real TPU when
# one is attached (this machine has 1 oversubscribed CPU core — XLA:CPU
# executes even tiny programs in ~0.7s, the TPU is ~1000x faster).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def _tpu_tunnel_alive(timeout: float = 60.0) -> bool:
    """The axon PJRT plugin dials a local relay during backend init and
    hangs forever (nanosleep retry loop) when the tunnel is down — even
    under JAX_PLATFORMS=cpu.  Probe device init in a subprocess with a hard
    timeout so a dead tunnel degrades to CPU instead of hanging the suite."""
    if os.environ.get("JAX_PLATFORMS", "axon") == "cpu" or not os.environ.get(
        "PALLAS_AXON_POOL_IPS"
    ):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert any(d.platform != 'cpu' for d in jax.devices())"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_force_cpu = not _tpu_tunnel_alive()
# for any subprocesses tests spawn:
if _force_cpu:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _force_cpu:
    # sitecustomize already imported jax and registered the axon plugin, so
    # env vars are too late for THIS process — override the live config and
    # drop the factory before any backend initializes.
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb  # noqa: E402

    _xb._backend_factories.pop("axon", None)

try:
    _tpus = [d for d in jax.devices() if d.platform != "cpu"]
except RuntimeError:
    _tpus = []

if not _tpus:
    # CPU-only environment (e.g. the driver's multichip dry-run box): pin to
    # one CPU device to avoid confusion with the virtual mesh.
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persist compiles (TPU programs go through the tunnel, ~1-30s each; CPU
# programs compile in up to minutes on this 1-core host).  ONE dir for both
# backends — entries are platform-keyed, and jax's cache singleton
# initializes on first use so later dir switches silently don't apply.
# CPU entries may come from the axon remote compile service with extra
# tuning flags; observed to load and run correctly here (cosmetic
# machine-features warning only).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def cpu_mesh_devices(n: int = 8):
    """Devices for sharding tests (virtual CPU mesh)."""
    return jax.devices("cpu")[:n]
