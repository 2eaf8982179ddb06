"""Lazy / sharded orbax restore (utils/checkpoint.py).

The reference loads whole torch state_dicts onto the host then scatters
(builder.py:22-47 load_state_dict paths); the TPU-native large-checkpoint
shape is the reverse — orbax reads each leaf from OCDBT straight into its
device shards (abstract ShapeDtypeStruct + sharding targets), and leaves
the caller doesn't want are ocp.PLACEHOLDER-marked so their bytes are
never read at all (serving loads params, never Adam moments).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from setok_tpu.utils.checkpoint import (abstract_like, prefix_predicate,
                                        restore_partial, restore_sharded,
                                        save_checkpoint)


@pytest.fixture()
def saved_state(tmp_path):
    state = {
        "params": {"w": jnp.arange(64, dtype=jnp.float32).reshape(16, 4),
                   "b": jnp.full((4,), 3.0)},
        "opt": {"m": jnp.full((16, 4), 7.0), "v": jnp.full((16, 4), 9.0)},
        "step": jnp.asarray(5, jnp.int32),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 0, state)
    return d, state


def test_restore_sharded_places_leaves_on_mesh(saved_state):
    d, state = saved_state
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    shardings = {"params": {"w": sh, "b": rep},
                 "opt": {"m": sh, "v": sh}, "step": rep}
    out = restore_sharded(d, state, shardings)
    assert out["params"]["w"].sharding.is_equivalent_to(sh, 2)
    assert len(out["params"]["w"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(out["opt"]["v"]), 9.0)


def test_restore_sharded_from_abstract_target(saved_state):
    """No concrete source tree needed — serving can restore into a model
    it never initialized (shape/dtype metadata only)."""
    d, state = saved_state
    abstract = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(np.shape(l), l.dtype), state)
    out = restore_sharded(d, abstract)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(out["step"]) == 5


def test_restore_partial_skips_unmatched_bytes(saved_state):
    """Only params.* leaves restore; opt/step keep the caller's values
    (and their checkpoint bytes are never read — ocp.PLACEHOLDER)."""
    d, state = saved_state
    fresh = jax.tree.map(lambda l: jnp.zeros_like(l) - 1.0, state)
    out = restore_partial(d, fresh, prefix_predicate("params"))
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(out["params"]["b"]), 3.0)
    # unmatched leaves are untouched caller state, not checkpoint values
    np.testing.assert_array_equal(np.asarray(out["opt"]["m"]), -1.0)
    assert float(np.asarray(out["step"])) == -1.0


def test_restore_partial_sharded_leaves(saved_state):
    d, state = saved_state
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    shardings = jax.tree.map(lambda _: None, state,
                             is_leaf=lambda x: x is not None and not
                             isinstance(x, dict))
    shardings["params"]["w"] = sh
    out = restore_partial(d, state, prefix_predicate("params"),
                          shardings=shardings)
    assert out["params"]["w"].sharding.is_equivalent_to(sh, 2)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]))


def test_restore_lazy_discovers_structure(tmp_path):
    """restore_lazy needs no target tree at all: structure (incl. list
    nodes and None leaves, which jax flatten would drop) comes from orbax
    metadata; only matching roots are read."""
    import orbax.checkpoint as ocp
    from setok_tpu.utils.checkpoint import (checkpoint_metadata,
                                            restore_lazy, root_predicate)
    state = {"params": {"w": jnp.ones((8, 2)), "qscales": None},
             "opt_state": [jnp.zeros((8, 2)), {"count": jnp.asarray(3)}],
             "lora": {"a": jnp.full((2, 2), 5.0)},
             "step": jnp.asarray(7)}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 0, state)

    abstract, step = checkpoint_metadata(d)
    assert step == 0
    assert abstract["params"]["w"].shape == (8, 2)
    assert abstract["params"]["qscales"] is None
    assert isinstance(abstract["opt_state"], list)

    out = restore_lazy(d, root_predicate("params", "lora"))
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["lora"]["a"]), 5.0)
    assert out["opt_state"][0] is ocp.PLACEHOLDER     # never read
    assert out["step"] is ocp.PLACEHOLDER


def test_root_predicate_ignores_mirrored_subtrees():
    from setok_tpu.utils.checkpoint import root_predicate
    pred = root_predicate("params", "lora")
    assert pred("['params']['vit']['w']")
    assert pred("['lora']['q']['a']")
    # Adam moments mirror the param tree one level down — must NOT match
    assert not pred("['opt_state'][0]['mu']['params']['vit']['w']")
    assert not pred("['step']")


def test_abstract_like_passthrough_and_override():
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    tree = {"a": jnp.ones((8, 2)),
            "b": jax.ShapeDtypeStruct((4,), jnp.int32)}
    abs1 = abstract_like(tree)
    assert abs1["a"].shape == (8, 2) and abs1["b"].dtype == jnp.int32
    abs2 = abstract_like(tree, {"a": sh, "b": None})
    assert abs2["a"].sharding == sh
