"""Device-time A/B harness for kernel variants on the hosted TPU.

Wall clocks through the tunnel jitter ±25%; the only trustworthy number is
device time from a jax.profiler trace (TPU lane = pid 3 in the Chrome
trace). Usage:

    from perf.trace_ab import device_time_ab
    ms = device_time_ab({"a": fn_a, "b": fn_b}, args, iters=24)
    # → {"a": ms_per_call, "b": ms_per_call}

Each fn must be jit-compiled with a DISTINCT __name__ (the trace events are
matched by jit name substring). Calls are chained `iters` times inside one
jitted scan so per-dispatch tunnel latency cancels.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def chain(fn: Callable, iters: int, name: str):
    """Build a jitted fn running `fn` iters times sequentially (carry the
    output back in, so XLA cannot parallelize or elide calls)."""

    def chained(x, *rest):
        def body(c, _):
            y = fn(c, *rest)
            # keep the carry shape: feed the output back as the input
            return y.reshape(c.shape).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    chained.__name__ = f"chain_{name}"
    return jax.jit(chained)


def _trace_device_ms(trace_dir: str, names, pid_hint: int = 3,
                     prefix: str = "chain_"):
    """Sum device-lane event durations per jit-name substring → ms.

    `prefix` defaults to the chain() wrapper's naming convention; pass
    prefix="" to match arbitrary jit names (serve_bench/_bits_ab match the
    engine's `_step_impl`/`_step_multi_impl` directly — the r4 first-run
    0.0s came from the hardwired chain_ prefix silently never matching)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace file under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device pids: process_name metadata containing 'TPU' / device
    device_pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e):
            pname = str(e["args"].get("name", ""))
            if "TPU" in pname or "/device:" in pname:
                device_pids.add(e["pid"])
    if not device_pids:
        device_pids = {pid_hint}
    totals = {n: 0.0 for n in names}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        nm = e.get("name", "")
        for n in names:
            if f"{prefix}{n}" in nm:
                totals[n] += e.get("dur", 0.0)
    if all(v == 0.0 for v in totals.values()):
        # The hosted-tunnel platform erases jit names from the trace — every
        # module event reads `jit__unknown(<fingerprint>)` (r4 wave-2 dump),
        # so NO name can ever match there. When the caller asked for a
        # single name, fall back to the total module-level (`jit_*`) device
        # time: the module envelope event encloses all its nested fusions
        # (summing everything would double-count `while`/fusion children),
        # and in a single-purpose traced window that envelope IS the
        # measured computation.
        import sys
        jit_total = sum(e.get("dur", 0.0) for e in events
                        if e.get("ph") == "X" and e.get("pid") in device_pids
                        and str(e.get("name", "")).startswith("jit_"))
        # fire ONLY when the platform demonstrably erased the names — a
        # zero-match on a name-preserving platform means the caller's name
        # is wrong (rename/typo) and must surface as 0 + diagnostics, not
        # be papered over with the window total
        erased = any(str(e.get("name", "")).startswith("jit__unknown")
                     for e in events
                     if e.get("ph") == "X" and e.get("pid") in device_pids)
        if len(names) == 1 and jit_total > 0.0 and erased:
            print(f"trace_ab: no events matched {prefix}+{list(names)}; "
                  f"falling back to total jit_* module time "
                  f"({jit_total / 1000.0:.3f} ms) — name-erasing platform",
                  file=sys.stderr)
            return {names[0]: jit_total / 1000.0}
        # diagnose instead of silently reporting 0: top device events
        by_dur = {}
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                by_dur[e.get("name", "?")] = (by_dur.get(e.get("name", "?"),
                                                         0.0)
                                              + e.get("dur", 0.0))
        top = sorted(by_dur.items(), key=lambda kv: -kv[1])[:12]
        print(f"trace_ab: no events matched {prefix}+{list(names)}; "
              f"device pids {device_pids}; top events: {top}",
              file=sys.stderr)
    return {n: totals[n] / 1000.0 for n in names}


def device_time_ab(fns: Dict[str, Callable], args, iters: int = 24,
                   trace_dir: str = "/tmp/trace_ab") -> Dict[str, float]:
    """Run each chained variant under its OWN profiler trace; return device
    ms/call per variant. fns map name → fn(x, *rest).

    One trace per variant (not one shared trace): the hosted-tunnel
    platform strips jit names from trace events (`jit__unknown(...)`), so
    per-name attribution inside a shared trace is impossible there — but a
    single-variant trace window lets _trace_device_ms fall back to the
    total jit_* module time, which works on every platform."""
    chains = {n: chain(fn, iters, n) for n, fn in fns.items()}
    # compile + warm
    for n, c in chains.items():
        jax.block_until_ready(c(*args))
    out = {}
    for n, c in chains.items():
        vdir = os.path.join(trace_dir, n)
        shutil.rmtree(vdir, ignore_errors=True)
        with jax.profiler.trace(vdir):
            jax.block_until_ready(c(*args))
        out[n] = _trace_device_ms(vdir, [n])[n] / iters
    return out
