"""Structure-keyed jit caching.

Dispatching a single eager jnp primitive through the tunneled TPU runtime
costs ~0.2-0.5 ms, so one eager field op (~40 primitives) costs ~20 ms and
host-orchestrated protocol glue dominates wall time by 100-1000x.  The rule
for this codebase: every multi-op field computation runs inside a jitted
function.  Whole proof phases (tower prove, opcode verify, PCS commit phase)
are pure functions of pytrees, so they compile to ONE XLA program per
structure signature; this module provides the cache.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax

_CACHE: Dict[Tuple, Any] = {}


def cached_jit(key: Tuple, builder: Callable[[], Callable]):
    """Return a jitted function for `key`, building it on first use.

    `builder()` must return the traceable function (typically a closure over
    static structure); the result is jax.jit'ed and cached under
    (builder.__qualname__,) + key.
    """
    full_key = (builder.__qualname__,) + tuple(key)
    if full_key not in _CACHE:
        _CACHE[full_key] = jax.jit(builder())
    return _CACHE[full_key]
