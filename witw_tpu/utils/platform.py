"""Honor JAX platform requests from the environment in CLI entry points.

TPU plugin ``sitecustomize`` modules import jax at interpreter start and can
override ``JAX_PLATFORMS``; ``XLA_FLAGS`` is latched at first backend init —
by the time a CLI ``main()`` runs, env vars may be silently ignored.
``jax.config`` wins over the plugin, so every jax-using CLI calls
:func:`honor_platform_env` before any backend init. This keeps the documented
``JAX_PLATFORMS=cpu`` invocation working (and guarantees it never initializes
a possibly-wedged TPU backend, which can hang for tens of minutes — see
NOTES.md) and makes virtual-device-count requests effective.
"""

from __future__ import annotations

import os
import re


def honor_platform_env() -> None:
    """If the environment explicitly requests the CPU backend, enforce it via
    jax.config (resetting any backends a sitecustomize already created).
    No-op otherwise — real-device runs are untouched."""
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return
    import jax

    try:
        from jax.extend import backend as _jex_backend

        _jex_backend.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    m = re.search(
        r"xla_force_host_platform_device_count=(\d+)",
        os.environ.get("XLA_FLAGS", ""),
    )
    if m:
        jax.config.update("jax_num_cpu_devices", int(m.group(1)))
