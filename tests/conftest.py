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


def _ensure_native_built():
    """Build the C++ data-loader extension on a clean tree (≈5 s, once).

    tests/test_native.py asserts HAVE_NATIVE; a fresh checkout has no .so,
    so build it here before collection imports the bridge module. Skipped
    silently when a matching .so already exists; a failed build leaves the
    numpy fallback in place and test_native_built reports the command.
    """
    import subprocess
    import sys
    import sysconfig
    from pathlib import Path

    native_dir = Path(__file__).resolve().parents[1] / "native"
    so_name = "ait_native" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so")
    if (native_dir / so_name).exists():
        return
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=native_dir, capture_output=True, timeout=300, check=True,
        )
    except (subprocess.SubprocessError, OSError):
        pass  # no compiler / sandbox — numpy fallback paths still tested


_ensure_native_built()
