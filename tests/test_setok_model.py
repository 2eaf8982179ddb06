"""End-to-end SeTok model tests: shapes, jit stability, masking semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.models.detokenizer import (SetokDeTokenizer, patchify,
                                          unpatchify)
from setok_tpu.models.setok import SeTok
from setok_tpu.models.tokenizer import SetokTokenizer
from setok_tpu.models.vit import ViT


pytestmark = pytest.mark.full


@pytest.fixture(scope="module")
def tiny():
    tok_cfg = cfgs.tiny_tokenizer()
    det_cfg = cfgs.tiny_detokenizer()
    model = SeTok(tok_cfg, det_cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images)
    return model, params, images, tok_cfg, det_cfg


def test_vit_shapes():
    cfg = cfgs.tiny_tokenizer().vit
    vit = ViT(cfg)
    imgs = jnp.zeros((2, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), imgs)
    out = vit.apply(params, imgs)
    assert out.shape == (2, cfg.num_patches, cfg.width)


def test_patchify_roundtrip():
    imgs = jnp.asarray(np.random.rand(2, 32, 32, 3).astype(np.float32))
    patches = patchify(imgs, 8)
    assert patches.shape == (2, 16, 8 * 8 * 3)
    back = unpatchify(patches, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs))


def test_tokenizer_output_shapes(tiny):
    model, params, images, tok_cfg, _ = tiny
    out = model.apply(params, images, method=model.tokenize)
    assert out.tokens.shape == (2, tok_cfg.k_max, tok_cfg.token_feat_dim)
    assert out.token_valid.shape == (2, tok_cfg.k_max)
    assert out.idx_cluster.shape == (2, tok_cfg.vit.num_patches)
    assert (np.asarray(out.num_clusters) >= 1).all()
    # invalid slots are zeroed
    toks = np.asarray(out.tokens)
    valid = np.asarray(out.token_valid)
    assert np.allclose(toks[~valid], 0.0)


def test_end_to_end_recon_shape(tiny):
    model, params, images, _, det_cfg = tiny
    out = model.apply(params, images)
    assert out.recon.shape == (2, det_cfg.image_size, det_cfg.image_size, 3)
    assert np.isfinite(np.asarray(out.recon)).all()


def test_jit_single_graph(tiny):
    """Different images, same shapes → no retrace of the jitted forward."""
    model, params, images, _, _ = tiny
    traces = 0

    @jax.jit
    def fwd(p, x):
        nonlocal traces
        traces += 1
        return model.apply(p, x)

    fwd(params, images)
    fwd(params, images * 0.5)
    fwd(params, jnp.ones_like(images))
    assert traces == 1


def test_detokenizer_ignores_invalid_tokens():
    """Masked (invalid) concept tokens must not influence the recon."""
    det_cfg = cfgs.tiny_detokenizer()
    det = SetokDeTokenizer(det_cfg)
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randn(1, 8, det_cfg.token_feat_dim).astype(np.float32))
    valid = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0, 0, 0]], bool))
    params = det.init(jax.random.PRNGKey(0), tokens, valid)

    out1 = det.apply(params, tokens, valid)
    garbage = tokens.at[:, 3:].set(999.0)
    out2 = det.apply(params, garbage, valid)
    np.testing.assert_allclose(np.asarray(out1.image), np.asarray(out2.image),
                               atol=1e-5)


def test_tokenizer_gradients_flow(tiny):
    """Gradients reach tokenizer/detokenizer params but not the frozen ViT."""
    model, params, images, _, _ = tiny

    def loss_fn(p):
        out = model.apply(p, images)
        return jnp.mean(out.recon ** 2) + jnp.mean(out.tokens ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    vit_norms, other_norms = [], []
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        (vit_norms if "image_feature_encoder" in name else other_norms).append(
            float(jnp.abs(g).max()))
    assert max(vit_norms) == 0.0          # frozen backbone
    assert max(other_norms) > 0.0         # trainable path gets signal
