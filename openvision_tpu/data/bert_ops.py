"""BERT WordPiece tokenize ops for CLIP/CoCa training.

Capability parity with reference src/transforms/bert_ops.py using the pure-
Python WordPiece tokenizer (no tensorflow_text). Semantics preserved exactly
(bert_ops.py:445-591):

- `my_bert_tokenize` (the training op): samples a sub-caption from key1,
  splits key2 text on [.!]+ and samples a sub-caption; emits
    labels1 = [bos] + tokens(key1_sample) + [eos], pad/truncate to max_len-1
              with eos overwritten onto the last slot when truncated,
              then [CLS] appended at the END (open_clip convention),
    labels2 = same for the key2 sample,
    labels_for_regress = [bos] + tokens(FULL key2 text) + [eos] padded to
              output_token_len (no CLS),
    cap_loss_mask = pad-mask of labels_for_regress shifted left by the bos
              (aligning with next-token targets) with a trailing 0.
- `bert_tokenize`: classic CLS-first variant.
- `my_eval_bert_tokenize`: eval op — labels = bos+tokens+eos+CLS like labels1.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from openvision_tpu.data.pp import inkey_outkey, pp_op
from openvision_tpu.data.tokenizer import get_tokenizer


def _as_text_list(x) -> List[str]:
    if isinstance(x, (bytes, np.bytes_)):
        return [x.decode("utf-8")]
    if isinstance(x, str):
        return [x]
    arr = np.asarray(x).reshape(-1)
    return [t.decode("utf-8") if isinstance(t, (bytes, np.bytes_)) else str(t) for t in arr]


def _sample_text(texts: Sequence[str], rng, sample_if_multi=True) -> str:
    texts = list(texts) + [""]
    if sample_if_multi:
        n = max(len(texts) - 1, 1)
        return texts[int(rng.integers(0, n))]
    return texts[0]


def _pad_or_truncate(ids: List[int], length: int, pad_id: int):
    """Returns (padded ids, mask) where mask marks real tokens."""
    mask = [1] * min(len(ids), length) + [0] * max(0, length - len(ids))
    out = (ids + [pad_id] * length)[:length]
    return out, mask


def _encode_special(tok, text: str, add_bos: bool, add_eos: bool) -> List[int]:
    ids = tok.encode(text)
    if add_bos:
        ids = [tok.bos_id] + ids
    if add_eos:
        ids = ids + [tok.eos_id]
    return ids


def _finalize_clip_tokens(tok, ids: List[int], max_len: int, add_eos: bool):
    """Pads/truncates to max_len-1, eos-overwrites on truncation, appends CLS."""
    padded, mask = _pad_or_truncate(ids, max_len - 1, tok.pad_id)
    if add_eos and mask[-1] == 1:
        padded = padded[:-1] + [tok.eos_id]
    return np.asarray(padded + [tok.cls_id], np.int32)


def _split_subcaptions(text: str) -> List[str]:
    import re

    parts = re.split(r"[.!]+", text)
    return [p for p in parts if len(p) > 0]


@pp_op("bert_tokenize")
@inkey_outkey(indefault=None, outdefault="labels")
def get_bert_tokenize(vocab_path, max_len, sample_if_multi=True):
    """Classic variant: [CLS] first, then tokens padded to max_len-1."""
    tok = get_tokenizer(vocab_path)

    def op(labels, rng):
        txt = _sample_text(_as_text_list(labels), rng, sample_if_multi)
        ids, _ = _pad_or_truncate(tok.encode(txt), max_len - 1, tok.pad_id)
        return np.asarray([tok.cls_id] + ids, np.int32)

    return op


@pp_op("my_bert_tokenize")
def get_my_bert_tokenize(max_len, output_token_len, vocab_path,
                         add_bos=True, add_eos=True, sample_if_multi=True,
                         key1="txt", key2="llava_caption"):
    tok = get_tokenizer(vocab_path)

    def op(data, rng):
        # ----- labels1: sampled sub-caption from key1 -----
        txt = _sample_text(_as_text_list(data[key1]), rng, sample_if_multi)
        ids1 = _encode_special(tok, txt, add_bos, add_eos)
        data["labels1"] = _finalize_clip_tokens(tok, ids1, max_len, add_eos)

        # ----- labels2: sampled [.!]-split sub-caption from key2 -----
        key2_text = " ".join(_as_text_list(data[key2]))
        subs = _split_subcaptions(key2_text)
        if subs:
            sel = subs[int(rng.integers(0, len(subs)))]
        else:
            sel = txt
            key2_text = txt
        ids2 = _encode_special(tok, sel, add_bos, add_eos)
        data["labels2"] = _finalize_clip_tokens(tok, ids2, max_len, add_eos)

        # ----- labels_for_regress: FULL key2 text, no CLS -----
        ids3 = _encode_special(tok, key2_text, add_bos, add_eos)
        padded, mask = _pad_or_truncate(ids3, output_token_len, tok.pad_id)
        if add_eos and mask[-1] == 1:
            padded = padded[:-1] + [tok.eos_id]
        data["labels_for_regress"] = np.asarray(padded, np.int32)

        cap_mask = mask
        if add_bos:
            cap_mask = cap_mask[1:] + [0]
        data["cap_loss_mask"] = np.asarray(cap_mask, np.float32)
        return data

    return op


@pp_op("concat_bert_tokenize")
def get_concat_bert_tokenize(vocab_path, max_len, sample_if_multi=True,
                             prob=0.5, concat=False, key1="txt",
                             key2="llava_caption", outkey="labels"):
    """Tokenizes key1 or key2 (chosen with prob), optionally concatenated.

    Capability parity with reference bert_ops.py:136 (concat_bert_tokenize).
    """
    tok = get_tokenizer(vocab_path)

    def op(data, rng):
        t1 = _sample_text(_as_text_list(data[key1]), rng, sample_if_multi)
        t2 = " ".join(_as_text_list(data[key2]))
        if concat:
            text = f"{t1} {t2}"
        else:
            text = t1 if rng.random() < prob else t2
        ids, _ = _pad_or_truncate(tok.encode(text), max_len - 1, tok.pad_id)
        data[outkey] = np.asarray([tok.cls_id] + ids, np.int32)
        return data

    return op


@pp_op("custom_bert_tokenize")
def get_custom_bert_tokenize(vocab_path, max_len, output_token_len=None,
                             sample_if_multi=True, add_bos=True, add_eos=True,
                             key="txt", outkey="labels"):
    """Single-key bos/eos/CLS-at-end tokenization (bert_ops.py:310)."""
    tok = get_tokenizer(vocab_path)

    def op(data, rng):
        txt = _sample_text(_as_text_list(data[key]), rng, sample_if_multi)
        ids = _encode_special(tok, txt, add_bos, add_eos)
        data[outkey] = _finalize_clip_tokens(tok, ids, max_len, add_eos)
        return data

    return op


@pp_op("noun_tokenize")
def get_noun_tokenize(vocab_path, max_len, sample_if_multi=True, key="txt",
                      outkey="labels"):
    """Keeps nouns(1) > adjectives(2) > verbs(3) > rest(4) when truncating.

    Capability parity with reference bert_ops.py:265 (nltk POS-ranked
    tokenization); gated on nltk + its taggers being available.
    """
    tok = get_tokenizer(vocab_path)
    try:
        import nltk

        nltk.pos_tag(["test"])  # raises if taggers are missing
        have_nltk = True
    except Exception:
        have_nltk = False

    def order(tag: str) -> int:
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    def op(data, rng):
        txt = _sample_text(_as_text_list(data[key]), rng, sample_if_multi)
        words = txt.split()
        if have_nltk and len(words) > max_len - 1:
            import nltk

            tags = nltk.pos_tag(words)
            ranked = sorted(range(len(words)), key=lambda i: order(tags[i][1]))
            keep = set(ranked[: max_len - 1])
            words = [w for i, w in enumerate(words) if i in keep]
        ids, _ = _pad_or_truncate(tok.encode(" ".join(words)), max_len - 1, tok.pad_id)
        data[outkey] = np.asarray([tok.cls_id] + ids, np.int32)
        return data

    return op


@pp_op("change_keys")
@inkey_outkey(indefault=None, outdefault="labels")
def get_change_keys():
    """Identity op used purely for its inkey→outkey rename (ref bert_ops.py:256)."""

    def op(labels, rng):
        return labels

    return op


@pp_op("new_bert_tokenize")
def get_new_bert_tokenize(vocab_path, max_len, output_token_len=None,
                          sample_if_multi=True, add_bos=False, add_eos=False,
                          key1="txt", key2="llava_caption"):
    """Legacy CoCa variant (ref bert_ops.py:594-709): labels2 samples key2's
    caption LIST directly (no [.!]+ sub-caption split, unlike
    `my_bert_tokenize`) and cap_loss_mask derives from the key2 pad-mask at
    max_len-1; no labels_for_regress is emitted."""
    del output_token_len  # accepted for signature parity; unused by the ref.
    tok = get_tokenizer(vocab_path)

    def finalize(txt):
        ids = _encode_special(tok, txt, add_bos, add_eos)
        padded, mask = _pad_or_truncate(ids, max_len - 1, tok.pad_id)
        if add_eos and mask[-1] == 1:
            padded = padded[:-1] + [tok.eos_id]
        return np.asarray(padded + [tok.cls_id], np.int32), mask

    def op(data, rng):
        txt1 = _sample_text(_as_text_list(data[key1]), rng, sample_if_multi)
        data["labels1"], _ = finalize(txt1)

        txt2 = _sample_text(_as_text_list(data[key2]), rng, sample_if_multi)
        data["labels2"], mask2 = finalize(txt2)

        cap_mask = mask2
        if add_bos:
            cap_mask = cap_mask[1:] + [0]
        data["cap_loss_mask"] = np.asarray(cap_mask, np.float32)
        return data

    return op


@pp_op("my_eval_bert_tokenize")
def get_my_eval_bert_tokenize(inkey, max_len, vocab_path, add_bos=True,
                              add_eos=True, sample_if_multi=True, outkey="labels"):
    tok = get_tokenizer(vocab_path)

    def op(data, rng):
        txt = _sample_text(_as_text_list(data[inkey]), rng, sample_if_multi)
        ids = _encode_special(tok, txt, add_bos, add_eos)
        data[outkey] = _finalize_clip_tokens(tok, ids, max_len, add_eos)
        return data

    return op
