"""Test configuration: run everything on an 8-device virtual CPU mesh.

Unit tests must not require TPU hardware; multi-device sharding tests use
XLA's forced host platform device count, per the rebuild test strategy
(SURVEY.md §4).

Note: this image boots a sitecustomize that registers the axon TPU PJRT
plugin (and imports jax) in every interpreter, so env vars set here are too
late — we must override via jax.config before the backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
