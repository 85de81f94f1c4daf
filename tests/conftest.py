import os

# Tests run on CPU with 8 virtual devices so sharding/collective paths are
# exercised without TPU hardware.  Benchmarks (bench.py) run on the real chip.
#
# Note: the environment may auto-register a TPU backend at interpreter start
# (sitecustomize), so setting JAX_PLATFORMS here is not sufficient — we also
# pin jax's default device to CPU after import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

# NOTE: do NOT enable the persistent compilation cache here — in this
# environment CPU compiles can be served by a remote compile service with
# mismatched machine features, and reloading those AOT blobs hangs/SIGILLs.
