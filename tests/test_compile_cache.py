"""Persistent XLA compilation cache (utils/compile_cache.py).

No reference equivalent (torch eager recompiles nothing); this is the
XLA-native answer to serve/train restart latency — executables keyed by
(HLO, options, backend) persist to disk and reload instead of recompiling.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from setok_tpu.utils.compile_cache import enable_compilation_cache


@pytest.fixture
def cache_flags_restored():
    keys = ["jax_enable_compilation_cache", "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes"]
    old = {k: getattr(jax.config, k) for k in keys}
    yield
    for k, v in old.items():
        jax.config.update(k, v)


def test_off_and_auto_resolution(tmp_path, cache_flags_restored, monkeypatch):
    assert enable_compilation_cache("off") is None
    assert enable_compilation_cache("") is None
    monkeypatch.setenv("SETOK_COMPILE_CACHE", str(tmp_path / "via_env"))
    d = enable_compilation_cache("auto")
    assert d == str(tmp_path / "via_env") and os.path.isdir(d)


def test_cache_persists_and_reloads(tmp_path, cache_flags_restored):
    d = enable_compilation_cache(str(tmp_path / "xla"),
                                 min_compile_time_secs=0.0)

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum(axis=1)

    import numpy as np
    x = jnp.asarray(np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
                    / 4096.0)
    want = np.asarray(f(x))
    f_entries = [e for e in os.listdir(d) if e.startswith("jit_f-")]
    assert len(f_entries) == 1, "compiled executable was not persisted"

    # Drop the in-memory executable: the next call must go through the
    # persistent cache (deserialize) and still compute the same thing.
    jax.clear_caches()
    got = np.asarray(f(x))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # reload, not a second distinct entry for f
    assert [e for e in os.listdir(d) if e.startswith("jit_f-")] == f_entries
