"""Oracle test: the multimodal splicing engine vs the ACTUAL reference.

VERDICT r3 next #6: `prepare_inputs_labels_for_multimodal`
(/root/reference/src/model/setokim_arch.py:213-355) is the most intricate
reference component — sentinel splitting on IMAGE_TOKEN_INDEX, per-row
embedding interleave, label rebuilding (IGNORE over image spans,
TARGET_TOKEN_INDEX→IGNORE at 344-345), truncation to
tokenizer_model_max_length, re-padding. Our recast is static: the collator
pre-reserves k_max sentinel slots per image (data/mm_tokens.py
expand_image_slots) and models/setokim.py prepare_multimodal gathers image
features into those slots with a validity mask instead of packing.

These tests run the reference method itself (imported with timm/diffusers/
torchvision stubs — import-time deps only) on identical input_ids/labels
and the SAME image features our encoder produced, then assert the packed
subsequence of our static layout (rows where `valid`) equals the
reference's packed rows byte-for-byte: embeddings, labels, positions, and
the truncation rule.
"""

import importlib
import importlib.machinery
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from setok_tpu import config as cfgs
from setok_tpu.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                 TARGET_TOKEN_INDEX)
from setok_tpu.data.mm_tokens import expand_image_slots, pad_or_truncate
from setok_tpu.models.setokim import Setokim

pytestmark = pytest.mark.full

TARGET_ID = 3          # vocab id of <target> (our convention keeps the real
#                        token id in labels; the reference uses -300 there)


def _stub(name, is_pkg=False):
    """Get-or-create a stub module. MUST be additive: other parity test
    modules (test_reference_parity.py, test_reference_parity_losses.py)
    register their own minimal `timm`/`torchvision` stubs, and in a
    single-process whole-suite run whichever fixture runs first wins the
    top-level name — so each fixture registers every leaf submodule it
    needs instead of guarding on the top-level name (the r4 whole-suite
    ERROR: 'timm.models' is not a package)."""
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=is_pkg)
    if is_pkg:
        m.__path__ = []
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref_arch():
    """Import /root/reference/src/model/setokim_arch.py as the real package
    `src.model.setokim_arch` (its own absolute/relative imports intact),
    stubbing only wheels absent in this container and used solely at
    import time by siblings (timm, diffusers, torchvision, diffdist)."""
    if "src.model.setokim_arch" in sys.modules:
        return sys.modules["src.model.setokim_arch"]

    timm = _stub("timm", True)
    models = _stub("timm.models", True)
    layers = _stub("timm.models.layers")
    vt = _stub("timm.models.vision_transformer")
    tloss = _stub("timm.loss")

    class DropPath(tnn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    class Block(tnn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    class SoftTargetCrossEntropy(tnn.Module):
        pass

    if not hasattr(layers, "DropPath"):
        layers.DropPath = DropPath
    if not hasattr(vt, "Block"):
        vt.Block = Block
    if not hasattr(tloss, "SoftTargetCrossEntropy"):
        tloss.SoftTargetCrossEntropy = SoftTargetCrossEntropy
    timm.models = models
    models.layers = layers
    models.vision_transformer = vt
    timm.loss = tloss

    diffusers = _stub("diffusers", True)
    dm = _stub("diffusers.models", True)
    da = _stub("diffusers.models.autoencoders", True)
    vae = _stub("diffusers.models.autoencoders.vae")

    class Decoder(tnn.Module):
        pass

    if not hasattr(vae, "Decoder"):
        vae.Decoder = Decoder
    diffusers.models = dm
    dm.autoencoders = da
    da.vae = vae

    tv = _stub("torchvision", True)
    tv.models = _stub("torchvision.models")
    try:
        import diffdist  # noqa: F401
    except ModuleNotFoundError:
        dd = _stub("diffdist", True)
        ddf = _stub("diffdist.functional")
        ddf.all_gather = None
        dd.functional = ddf
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as ptu
    for n in ("apply_chunking_to_forward",
              "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(ptu, n))

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module("src.model.setokim_arch")


def make_ref_splicer(ref_arch, embed_table, feats_list, max_len=None,
                     padding_side="right"):
    """Instantiate the reference mixin with just the hooks the splice path
    touches: get_model().embed_tokens / get_vision_tower, encode_images
    (injected features), config.tokenizer_model_max_length/padding_side."""
    cfg = types.SimpleNamespace(tokenizer_model_max_length=max_len,
                                tokenizer_padding_side=padding_side)

    class _Model:
        @staticmethod
        def get_vision_tower():
            return object()          # non-None gate (setokim_arch.py:217)

        @staticmethod
        def embed_tokens(ids):
            return torch.tensor(embed_table)[ids]

    class Splicer(ref_arch.SetokimMetaForCausalLM):
        def __init__(self):
            self.config = cfg
            self.device = torch.device("cpu")

        def get_model(self):
            return _Model()

        def encode_images(self, images):
            return [torch.tensor(np.asarray(f)) for f in feats_list]

    return Splicer()


@pytest.fixture(scope="module")
def tiny_model():
    """Tiny Setokim; threshold=0 makes every image emit exactly k_max valid
    tokens (scores are positive), aligning the static slot count with the
    reference's variable K for layout-exact cases."""
    base = cfgs.tiny_setokim()
    tok = cfgs.replace(base.tokenizer, threshold=0.0)
    cfg = cfgs.replace(base, tokenizer=tok, target_num=tok.k_max)
    model = Setokim(cfg, target_token_id=TARGET_ID)
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(2, tok.vit.image_size, tok.vit.image_size, 3)
                       .astype(np.float32) * 2 - 1)
    ids0 = jnp.asarray(np.full((2, 4 + tok.k_max), IMAGE_TOKEN_INDEX,
                               np.int64))
    params = model.init(jax.random.PRNGKey(0), ids0, imgs,
                        method=model.prepare_multimodal)
    return cfg, model, params, imgs


def _ref_rows(cfg):
    """Reference-style rows (single -200 sentinel), right-padded to 16."""
    pad = 0
    rows = [
        # [bos, text, <image>, text..., pad]
        ([1, 17, IMAGE_TOKEN_INDEX, 9, 4, 2, pad, pad],
         [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 9, 4, 2,
          IGNORE_INDEX, IGNORE_INDEX]),
        # [bos, <image>, text, <target>x2 (real vocab id in ids, -300 in
        #  ref labels), text]
        ([1, IMAGE_TOKEN_INDEX, 7, TARGET_ID, TARGET_ID, 8, 2, pad],
         [IGNORE_INDEX, IGNORE_INDEX, 7, TARGET_TOKEN_INDEX,
          TARGET_TOKEN_INDEX, 8, 2, IGNORE_INDEX]),
    ]
    ids = np.asarray([r[0] for r in rows], np.int64)
    labels = np.asarray([r[1] for r in rows], np.int64)
    attn = ids != pad
    # row 0's trailing pads sit after real tokens; ref strips by mask
    return ids, labels, attn


def _run_reference(ref_arch, embed_table, feats_list, ids, labels, attn,
                   max_len=None):
    sp = make_ref_splicer(ref_arch, embed_table, feats_list, max_len)
    with torch.no_grad():
        (_, pos, amask, _, embeds, nlabels) = \
            sp.prepare_inputs_labels_for_multimodal(
                torch.tensor(ids), torch.zeros_like(torch.tensor(ids)),
                torch.tensor(attn), None, torch.tensor(labels),
                torch.zeros((len(feats_list), 3, 4, 4)))
    return (pos.numpy(), amask.numpy().astype(bool), embeds.numpy(),
            nlabels.numpy())


def _run_ours(cfg, model, params, imgs, ids, labels, max_len):
    k_max = cfg.tokenizer.k_max
    ids_b, lab_b = [], []
    for i in range(ids.shape[0]):
        row = [t for t in ids[i] if t != 0]          # collator gets unpadded
        lrow = list(labels[i][:len(row)])
        # our convention: labels carry the real <target> id, not -300
        lrow = [TARGET_ID if v == TARGET_TOKEN_INDEX else int(v)
                for v in lrow]
        e_ids, e_lab = expand_image_slots(row, k_max, lrow)
        ids_b.append(pad_or_truncate(e_ids, max_len, 0))
        lab_b.append(pad_or_truncate(e_lab, max_len, IGNORE_INDEX))
    ids_b = np.stack(ids_b)
    lab_b = np.stack(lab_b)
    embeds, valid, positions = model.apply(params, jnp.asarray(ids_b), imgs,
                                           method=model.prepare_multimodal)
    # the CE label view __call__ derives (target ids → IGNORE, image slots
    # already IGNORE from expand_image_slots)
    ce = np.where(lab_b == TARGET_ID, IGNORE_INDEX, lab_b)
    return (np.asarray(embeds), np.asarray(valid), np.asarray(positions),
            ce, ids_b)


def test_splice_layout_matches_reference(ref_arch, tiny_model):
    """Packed subsequence equality: embeddings, rebuilt labels, positions."""
    cfg, model, params, imgs = tiny_model
    ids, labels, attn = _ref_rows(cfg)
    feats, fvalid = model.apply(params, imgs, method=model.encode_images)
    feats, fvalid = np.asarray(feats), np.asarray(fvalid)
    assert fvalid.all()      # threshold=0 ⇒ exactly k_max valid tokens

    embed_table = np.asarray(
        params["params"]["llama"]["embed_tokens"]["embedding"])
    rpos, rmask, rembeds, rlabels = _run_reference(
        ref_arch, embed_table, list(feats), ids, labels, attn)

    embeds, valid, positions, ce, _ = _run_ours(
        cfg, model, params, imgs, ids, labels, max_len=24)

    for i in range(ids.shape[0]):
        ours_e = embeds[i][valid[i]]
        ref_e = rembeds[i][rmask[i]]
        assert ours_e.shape == ref_e.shape
        np.testing.assert_allclose(ours_e, ref_e, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(ce[i][valid[i]], rlabels[i][rmask[i]])
        np.testing.assert_array_equal(positions[i][valid[i]],
                                      rpos[i][rmask[i]])
    # the reference rebuilds labels with IGNORE over every image span and
    # maps TARGET sentinels to IGNORE (setokim_arch.py:296-299, 344-345) —
    # both must hold in our packed view too
    assert (ce[:, :][embeds[..., 0] != embeds[..., 0]].size == 0)  # no NaNs
    assert (rlabels == TARGET_TOKEN_INDEX).sum() == 0


def test_splice_truncation_matches_reference(ref_arch, tiny_model):
    """tokenizer_model_max_length truncation (setokim_arch.py:303-307):
    with all slots valid, our static row is the packed row, so a hard cut
    at max_len must agree position-for-position."""
    cfg, model, params, imgs = tiny_model
    ids, labels, attn = _ref_rows(cfg)
    feats, fvalid = model.apply(params, imgs, method=model.encode_images)
    feats = np.asarray(feats)
    max_len = 9          # cuts into the image span of row 0 (3 text + 8 slots)

    embed_table = np.asarray(
        params["params"]["llama"]["embed_tokens"]["embedding"])
    rpos, rmask, rembeds, rlabels = _run_reference(
        ref_arch, embed_table, list(feats), ids, labels, attn,
        max_len=max_len)

    embeds, valid, positions, ce, _ = _run_ours(
        cfg, model, params, imgs, ids, labels, max_len=max_len)

    assert rembeds.shape[1] == max_len
    for i in range(ids.shape[0]):
        n = int(rmask[i].sum())
        assert valid[i].sum() == n
        np.testing.assert_allclose(embeds[i][:n], rembeds[i][:n],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(ce[i][:n], rlabels[i][:n])


def test_splice_partial_validity_packs_like_variable_k(ref_arch):
    """Default threshold ⇒ K < k_max for some images; the reference gets the
    VALID feature subset (its variable-K world) while our static layout
    keeps invalid slots as holes. Packed views must still agree."""
    base = cfgs.tiny_setokim()
    model = Setokim(base, target_token_id=TARGET_ID)
    tok = base.tokenizer
    rs = np.random.RandomState(1)
    imgs = jnp.asarray(rs.rand(2, tok.vit.image_size, tok.vit.image_size, 3)
                       .astype(np.float32) * 2 - 1)
    ids, labels, attn = _ref_rows(base)
    k_max = tok.k_max
    ids0 = jnp.asarray(np.full((2, 4 + k_max), IMAGE_TOKEN_INDEX, np.int64))
    params = model.init(jax.random.PRNGKey(0), ids0, imgs,
                        method=model.prepare_multimodal)

    feats, fvalid = model.apply(params, imgs, method=model.encode_images)
    feats, fvalid = np.asarray(feats), np.asarray(fvalid)

    embed_table = np.asarray(
        params["params"]["llama"]["embed_tokens"]["embedding"])
    ref_feats = [feats[i][fvalid[i]] for i in range(2)]   # variable K
    rpos, rmask, rembeds, rlabels = _run_reference(
        ref_arch, embed_table, ref_feats, ids, labels, attn)

    embeds, valid, positions, ce, _ = _run_ours(
        base, model, params, imgs, ids, labels, max_len=24)

    for i in range(2):
        ours_e = embeds[i][valid[i]]
        ref_e = rembeds[i][rmask[i]]
        assert ours_e.shape == ref_e.shape, (ours_e.shape, ref_e.shape)
        np.testing.assert_allclose(ours_e, ref_e, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(ce[i][valid[i]], rlabels[i][rmask[i]])
        np.testing.assert_array_equal(positions[i][valid[i]],
                                      rpos[i][rmask[i]])
