"""Runtime platform selection for the CLIs.

JAX picks its backend at first use; in environments where a sitecustomize
pins an accelerator platform (e.g. the axon TPU tunnel), the standard
``JAX_PLATFORMS`` env var is overridden before user code runs. The CLIs call
``apply_platform_env()`` before touching jax so ``MICKEY_PLATFORM=cpu``
(or ``tpu``/``axon,cpu``) reliably selects the backend — e.g. CPU smoke runs
of the demo/submission CLIs on hosts whose accelerator is busy.
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "MICKEY_PLATFORM") -> str | None:
    """If ``$MICKEY_PLATFORM`` is set, force that jax platform list. Must run
    before the first jax.devices()/jit; returns the applied value."""
    value = os.environ.get(var)
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    return value or None
