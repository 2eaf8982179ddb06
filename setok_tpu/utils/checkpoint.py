"""Checkpoint I/O: orbax-backed saves + key-prefix splicing + adapter saves.

Parity: the reference's three mechanisms (SURVEY.md §5):
  1. step checkpoints + auto-resume (train_setok.py:119-122) →
     `save_checkpoint` / `restore_checkpoint` / `latest_step`;
  2. adapter-only saving — `mm_projector.bin` with only projector keys
     (setokim_trainer.py:234-253) → `save_subtree` with a path filter;
  3. partial loading by key prefix — `get_w(weights, 'tokenizer')`
     (setokim_arch.py:94-99) → `load_subtree` / `splice_params`.

ZeRO-3 parameter gathering (maybe_zero_3, train_setokim.py:44-55) has no
equivalent code here by design: orbax writes sharded jax.Arrays directly
from each host (OCDBT), which is the TPU-native version of "gather then
save" without the gather.
"""

from __future__ import annotations

import os
import re
import signal
import threading
from typing import Any, Callable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_to_keep: int = 3) -> None:
    with _manager(ckpt_dir, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                       target: Any = None) -> Any:
    """Restore (auto-latest when step=None); `target` supplies the pytree
    structure/shardings."""
    with _manager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        if target is not None:
            return mgr.restore(step,
                               args=ocp.args.StandardRestore(target))
        return mgr.restore(step)


# ---------------------------------------------------------------------------
# Async checkpointing + preemption handling (failure-detection story).
# The reference has only HF Trainer's synchronous step saves + auto-resume
# (train_setok.py:119-122); the TPU-native elastic version is orbax async
# commit (device→host copy returns immediately, the write happens on a
# background thread) plus a SIGTERM hook so a preempted VM saves before
# dying and `--resume` picks the run back up.


class CheckpointRunner:
    """Long-lived manager for a training run: async saves, preemption-safe.

    Usage in a step loop:
        runner = CheckpointRunner(ckpt_dir)
        for step in ...:
            state, metrics = train_step(...)
            runner.save_every(step, state, every=500)
            if runner.preempted(step):
                runner.save(step, state, force=True)
                break
        runner.close()
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3,
                 install_sigterm_hook: bool = True):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True))
        self._stop = threading.Event()
        self._prev_handler = None
        if install_sigterm_hook and threading.current_thread() is \
                threading.main_thread():
            self._prev_handler = signal.getsignal(signal.SIGTERM)
            signal.signal(signal.SIGTERM, self._on_sigterm)

    def _on_sigterm(self, signum, frame):
        self._stop.set()
        if callable(self._prev_handler):
            self._prev_handler(signum, frame)

    # ------------------------------------------------------------------
    def save(self, step: int, state: Any, force: bool = False) -> None:
        """Non-blocking save (async commit). Idempotent per step: when a
        preemption save races the periodic save of the SAME step (SIGTERM
        lands right as `(step+1) % every == 0` fires), the state for that
        step is already durable/in-flight — treat the collision as success
        instead of dying on orbax's StepAlreadyExistsError mid-preemption."""
        try:
            self._mgr.save(step, args=ocp.args.StandardSave(state),
                           force=force)
        except ocp.checkpoint_manager.StepAlreadyExistsError:
            pass

    def save_every(self, step: int, state: Any, every: int) -> bool:
        if every > 0 and (step + 1) % every == 0:
            self.save(step + 1, state)
            return True
        return False

    def preempted(self, step: int) -> bool:
        """True when the host received SIGTERM (or orbax's multihost
        preemption sync point fired) — save and exit cleanly."""
        if self._stop.is_set():
            return True
        try:
            return bool(self._mgr.reached_preemption(step))
        except Exception:        # single-host / no distributed runtime
            return False

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def wait(self) -> None:
        """Block until in-flight async writes are durable."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()
        if self._prev_handler is not None:
            signal.signal(signal.SIGTERM, self._prev_handler)


# ---------------------------------------------------------------------------
# Lazy / sharded restore for very large checkpoints.
#
# `restore_checkpoint(..., target=concrete_state)` round-trips every leaf
# through host memory. For a 7B-scale Setokim that is ~28 GB fp32 twice
# over (optimizer moments included) — it OOMs hosts that could easily hold
# the *sharded* model. The TPU-native shape: hand orbax an ABSTRACT target
# (jax.ShapeDtypeStruct + sharding) so each leaf is read from OCDBT
# straight into its device shards, and mark leaves the caller doesn't want
# with ocp.PLACEHOLDER so they are never read at all (serving wants params,
# not Adam moments — the reference's load path similarly loads weights only,
# builder.py:22-47).


def abstract_like(tree: Any, shardings: Any = None) -> Any:
    """ShapeDtypeStruct tree mirroring `tree` (concrete or abstract), with
    per-leaf shardings attached when a matching shardings tree is given."""
    def leaf_abs(leaf, sh):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return (jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)
                    if sh is not None else leaf)
        arr = jax.numpy.asarray(leaf) if np.isscalar(leaf) else leaf
        sharding = sh
        if sharding is None and isinstance(arr, jax.Array):
            sharding = arr.sharding
        return jax.ShapeDtypeStruct(np.shape(arr), arr.dtype,
                                    sharding=sharding)

    if shardings is None:
        return jax.tree.map(lambda l: leaf_abs(l, None), tree)
    return jax.tree.map(leaf_abs, tree, shardings)


def restore_sharded(ckpt_dir: str, target: Any, shardings: Any = None,
                    step: Optional[int] = None) -> Any:
    """Restore directly into sharded device arrays — no full host copy.

    `target` may be a concrete state (its shardings are reused) or an
    abstract ShapeDtypeStruct tree; `shardings` (a matching tree of
    jax.sharding.Sharding) overrides per-leaf placement, which is how a
    checkpoint written under one mesh is re-laid-out onto another.
    """
    abstract = abstract_like(target, shardings)
    with _manager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_partial(ckpt_dir: str, target: Any,
                    predicate: Callable[[str], bool],
                    step: Optional[int] = None, shardings: Any = None) -> Any:
    """Lazily restore ONLY the leaves whose path matches `predicate`.

    Non-matching leaves are marked ocp.PLACEHOLDER, so orbax never reads
    their bytes from disk (lazy, not read-then-drop). The returned tree has
    restored values at matching positions and `target`'s original leaves
    elsewhere. Matching leaves restore straight to device shards when
    target/shardings carry sharding info (see restore_sharded).
    """
    abstract = abstract_like(target, shardings)

    def mark(path, leaf):
        name = jax.tree_util.keystr(path)
        return leaf if predicate(name) else ocp.PLACEHOLDER

    item = jax.tree_util.tree_map_with_path(mark, abstract)

    # PyTreeRestore only honors shardings through explicit restore_args
    # (a bare ShapeDtypeStruct item falls back to the checkpoint's saved
    # sharding file → fully-replicated single-device arrays)
    def rargs(leaf):
        if leaf is ocp.PLACEHOLDER:
            return ocp.RestoreArgs()
        return ocp.ArrayRestoreArgs(sharding=leaf.sharding,
                                    dtype=leaf.dtype)

    restore_args = jax.tree.map(rargs, item,
                                is_leaf=lambda x: x is ocp.PLACEHOLDER)
    with _manager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        restored = mgr.restore(
            step, args=ocp.args.PyTreeRestore(item,
                                              restore_args=restore_args))

    def merge(orig, got):
        return orig if got is ocp.PLACEHOLDER else got

    return jax.tree.map(merge, target, restored,
                        is_leaf=lambda x: x is ocp.PLACEHOLDER)


def checkpoint_metadata(ckpt_dir: str, step: Optional[int] = None):
    """(abstract ShapeDtypeStruct tree, step) of a checkpoint WITHOUT
    reading any array bytes — orbax tree metadata only."""
    with ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            item_handlers=ocp.StandardCheckpointHandler()) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        md = mgr.item_metadata(step)

    # md.tree is the raw nested dict; convert by hand so list nodes stay
    # lists and None-valued entries stay None — jax flatten would drop the
    # latter and break structure matching against the on-disk tree
    def conv(node):
        if isinstance(node, dict):
            return {k: conv(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(conv(v) for v in node)
        if node is None or getattr(node, "value_type", None) == "None":
            return None
        return jax.ShapeDtypeStruct(tuple(node.shape), node.dtype)

    return conv(md.tree), step


def restore_lazy(ckpt_dir: str, predicate: Callable[[str], bool],
                 step: Optional[int] = None,
                 sharding_for: Optional[Callable[[str], Any]] = None) -> Any:
    """Restore ONLY the leaves matching `predicate` from a checkpoint whose
    structure the caller does not know — it is discovered from metadata, so
    nothing else is ever read (serving loads `params`/`lora`, not the
    optimizer moments that dominate a training checkpoint's bytes).
    Skipped positions hold ocp.PLACEHOLDER (ellipsis) in the result.
    `sharding_for(pathstr)` may supply a jax.sharding.Sharding per leaf for
    direct-to-device placement."""
    abstract, step = checkpoint_metadata(ckpt_dir, step)

    def mark(path, leaf):
        name = jax.tree_util.keystr(path)
        if not predicate(name):
            return ocp.PLACEHOLDER
        sh = sharding_for(name) if sharding_for is not None else None
        return (jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)
                if sh is not None else leaf)

    item = jax.tree_util.tree_map_with_path(mark, abstract)

    def rargs(leaf):
        if leaf is ocp.PLACEHOLDER:
            return ocp.RestoreArgs()
        return ocp.ArrayRestoreArgs(sharding=leaf.sharding,
                                    dtype=leaf.dtype)

    restore_args = jax.tree.map(rargs, item,
                                is_leaf=lambda x: x is ocp.PLACEHOLDER)
    with _manager(ckpt_dir) as mgr:
        return mgr.restore(
            step, args=ocp.args.PyTreeRestore(item,
                                              restore_args=restore_args))


# ---------------------------------------------------------------------------
# pytree-path filtering (the reference's key-prefix dict surgery)


def filter_subtree(tree: Any, predicate: Callable[[str], bool]) -> Any:
    """Keep leaves whose path-string matches; others become None."""
    def walk(path, leaf):
        name = jax.tree_util.keystr(path)
        return leaf if predicate(name) else None

    return jax.tree_util.tree_map_with_path(walk, tree)


def splice_params(target: Any, source: Any,
                  predicate: Callable[[str], bool]) -> Any:
    """Overwrite target leaves with source leaves where predicate(path).

    Parity: setokim_arch.py:94-99 `get_w` + load_state_dict — pretrained
    tokenizer/detokenizer/projector weights spliced into a fresh model.
    Source must share the target's structure at the spliced positions.
    """
    t_flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    s_lookup = {jax.tree_util.keystr(p): l
                for p, l in jax.tree_util.tree_flatten_with_path(source)[0]}
    out = []
    for path, leaf in t_flat:
        name = jax.tree_util.keystr(path)
        if predicate(name) and name in s_lookup:
            src = s_lookup[name]
            assert src.shape == leaf.shape, (
                f"splice shape mismatch at {name}: {src.shape} vs "
                f"{leaf.shape}")
            out.append(jax.numpy.asarray(src, leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def prefix_predicate(*prefixes: str) -> Callable[[str], bool]:
    """Match any path containing one of the given component names."""
    pats = [re.compile(re.escape(p)) for p in prefixes]
    return lambda name: any(p.search(name) for p in pats)


def root_predicate(*roots: str) -> Callable[[str], bool]:
    """Match paths whose FIRST component is one of `roots`. Unlike
    prefix_predicate this cannot be fooled by optimizer-moment subtrees
    that mirror the param tree deeper down (opt_state…['params']…)."""
    keys = {f"['{r}']" for r in roots}
    return lambda name: any(name.startswith(k) for k in keys)


def save_subtree(path: str, tree: Any,
                 predicate: Callable[[str], bool]) -> None:
    """Adapter-only save (mm_projector.bin equivalent) as an .npz of
    path→array."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {jax.tree_util.keystr(p): np.asarray(l)
              for p, l in flat if predicate(jax.tree_util.keystr(p))}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_subtree(path: str, target: Any) -> Any:
    """Splice an .npz adapter file back into a full param tree."""
    data = np.load(path)
    t_flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    out = []
    for p, leaf in t_flat:
        name = jax.tree_util.keystr(p)
        if name in data.files:
            out.append(jax.numpy.asarray(data[name], leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
