"""Persistent XLA compilation cache for the CLIs.

Everything under `jax.jit` is traced and compiled once per process; for
the 7B serving trunk or the stage-2 train step that first compile costs
tens of seconds on a TPU host — paid again on every restart, rolling
deploy, and preemption resume. XLA's persistent compilation cache keys
each executable by (HLO, compile options, backend) and serves the binary
from disk on later runs, cutting restart latency to the disk-read time.

The reference has no equivalent (torch eager pays no compile; this is an
XLA-native production concern). Wired into `scripts/{serve,train_setok,
train_setokim,eval_recon,demo}.py` via `--compile-cache` (default: on,
under ~/.cache/setok_tpu/xla; pass `--compile-cache off` to disable).

Call before the first jit execution; flags only affect executables
compiled afterwards.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

DEFAULT_DIR = "~/.cache/setok_tpu/xla"


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             *,
                             min_compile_time_secs: float = 1.0,
                             min_entry_size_bytes: int = 0) -> Optional[str]:
    """Turn on the persistent compilation cache; returns the cache dir.

    cache_dir: target directory (created if missing). None/"auto" uses
      $SETOK_COMPILE_CACHE or ~/.cache/setok_tpu/xla; "off"/"" disables
      and returns None.
    min_compile_time_secs: only persist executables whose compile took at
      least this long (default 1 s — skips trivial host glue, keeps every
      kernel that is actually worth caching).
    """
    if cache_dir in ("off", ""):
        return None
    if cache_dir in (None, "auto"):
        cache_dir = os.environ.get("SETOK_COMPILE_CACHE", DEFAULT_DIR)
    cache_dir = os.path.expanduser(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                      min_entry_size_bytes)
    return cache_dir


def add_cli_flag(parser) -> None:
    """Attach the shared --compile-cache flag to an argparse parser."""
    parser.add_argument(
        "--compile-cache", default="auto", metavar="DIR|auto|off",
        help="persistent XLA compilation cache dir (default: auto = "
             "$SETOK_COMPILE_CACHE or ~/.cache/setok_tpu/xla; 'off' "
             "disables)")
