"""Activation-calibrated int4 quantization (serve/calibrate.py).

Covers: interceptor-based E[x²] collection off a real tiny trunk forward,
path lookup from the param tree, and the calibrated quantize_trunk_weights
path end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu import config as cfgs
from setok_tpu.models.llama import (LlamaForCausalLM,
                                    quantize_trunk_weights,
                                    _TRUNK_LINEARS)
from setok_tpu.serve.calibrate import collect_row_weights, lookup_row_weight


def _tiny_trunk():
    cfg = cfgs.tiny_setokim().llama
    model = LlamaForCausalLM(cfg)
    ids = np.zeros((2, 12), np.int64)
    ids[:, :5] = [[1, 4, 9, 2, 7], [1, 8, 3, 3, 5]]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    return cfg, model, params, jnp.asarray(ids)


def test_collect_row_weights_covers_all_trunk_linears():
    cfg, model, params, ids = _tiny_trunk()
    rw = collect_row_weights(lambda: model.apply(params, ids))
    # one entry per linear per layer
    names = [k[-1] for k in rw]
    for n in _TRUNK_LINEARS:
        assert names.count(n) == cfg.num_layers, (n, names)
    for key, v in rw.items():
        assert v.ndim == 1 and np.all(v >= 0), key
        if key[-1] == "down_proj":
            assert v.shape[0] == cfg.intermediate_size
        elif key[-1] in ("q_proj", "k_proj", "v_proj", "gate_proj",
                         "up_proj"):
            assert v.shape[0] == cfg.hidden_size
    # accumulation: running twice doubles counts but not the mean
    rw2 = collect_row_weights(
        lambda: (model.apply(params, ids), model.apply(params, ids)))
    k0 = next(iter(rw))
    np.testing.assert_allclose(rw[k0], rw2[k0], rtol=1e-6)


def test_lookup_matches_param_tree_paths():
    cfg, model, params, ids = _tiny_trunk()
    rw = collect_row_weights(lambda: model.apply(params, ids))
    # the param tree roots at {'params': ...} — module paths don't;
    # lookup must still resolve uniquely
    got = lookup_row_weight(
        rw, ("params", "model", "layer_0", "mlp", "gate_proj"))
    assert got is not None and got.shape == (cfg.hidden_size,)
    # a path matching nothing returns None
    assert lookup_row_weight(rw, ("params", "nope", "gate_proj")) is None


def test_calibrated_quantize_runs_and_helps_on_calibration_batch():
    cfg, model, params, ids = _tiny_trunk()
    rw = collect_row_weights(lambda: model.apply(params, ids))
    qp = quantize_trunk_weights(params, bits=4, group_size=0,
                                clip_search=8, row_weights=rw)
    q0 = qp["params"]["model"]["layer_0"]["mlp"]["gate_proj"]
    assert q0["p"].dtype == jnp.int8
    # calibrated scales must not be worse than uncalibrated clip search
    # in E[x²]-weighted weight reconstruction (the search objective)
    from setok_tpu.kernels.quant_matmul import quantize_weight_int4
    w = params["params"]["model"]["layer_0"]["mlp"]["gate_proj"]["kernel"]
    d = lookup_row_weight(rw, ("model", "layer_0", "mlp", "gate_proj"))
    assert d is not None

    def wmse(q):
        k = w.shape[0]
        deq = np.zeros((k, w.shape[1]), np.float32)
        p32 = np.asarray(q.packed, np.int32)
        lo = ((p32 & 0xF) << 28) >> 28
        hi = (p32 << 24) >> 28
        s = np.asarray(q.scales)
        g = s.shape[0]
        qint = np.concatenate([lo, hi], 0).astype(np.float32)
        sc = np.repeat(s, k // g, axis=0)
        deq = qint * sc
        return float((d[:, None] * (np.asarray(w) - deq) ** 2).sum())

    q_cal = quantize_weight_int4(w, clip_search=8, row_weight=jnp.asarray(d))
    q_pl = quantize_weight_int4(w, clip_search=8)
    assert wmse(q_cal) <= wmse(q_pl) * (1 + 1e-6), (wmse(q_cal), wmse(q_pl))
