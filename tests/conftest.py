"""Test harness: force an 8-device virtual CPU platform before jax imports.

The reference has no tests (SURVEY.md §4); this harness is the rebuild's
substitute for real multi-chip runs — mesh/sharding tests execute on 8
virtual CPU devices exactly as they would over ICI.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The hosted-TPU plugin (sitecustomize) force-selects its platform regardless
# of JAX_PLATFORMS in the env; override after import, before first use.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="module", autouse=True)
def _purge_jax_caches_per_module():
    """Drop compiled-executable / tracing caches between test modules.

    The whole-suite single process otherwise accumulates every module's
    jitted executables and their pinned buffers; by the time the heavy
    long-context tests run (~66% through, alphabetical), the transient
    backward-pass peak on top of that residue SIGABRTs the process
    (reproduced twice at tests/test_ring_attention.py). Per-module
    recompiles are cheap — modules share almost no jit objects."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
