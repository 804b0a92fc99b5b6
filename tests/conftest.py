"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: this environment's `sitecustomize` imports jax at interpreter startup
(before conftest), so setting env vars here is not enough — the backend is
selected lazily, so `jax.config.update` still works.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (real TPU via tunnel);
# unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
