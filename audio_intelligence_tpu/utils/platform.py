"""Platform selection helper.

The image's sitecustomize force-registers the axon TPU backend and
``JAX_PLATFORMS=axon`` before user code runs, so env vars alone can't
switch to CPU. Call this before any jax use; it honors ``AIT_PLATFORM``
(e.g. ``AIT_PLATFORM=cpu``) and ``AIT_HOST_DEVICES`` (virtual CPU device
count for mesh testing).
"""

from __future__ import annotations

import os


def maybe_force_platform():
    plat = os.environ.get("AIT_PLATFORM")
    ndev = os.environ.get("AIT_HOST_DEVICES")
    if ndev:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
