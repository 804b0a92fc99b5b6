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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable references after each test module.

    The full suite compiles hundreds of distinct XLA:CPU programs in one
    process; holding them all alive grows the process past ~5 GB, at which
    point the XLA:CPU compiler segfaults deterministically on the next large
    compile (reproduced: the same test passes in isolation and in either
    half of the suite, and crashes only with the full prefix's accumulated
    state). Clearing per module keeps the process small; shared shapes
    recompile, which costs ~10-20 % wall time.
    """
    yield
    jax.clear_caches()
