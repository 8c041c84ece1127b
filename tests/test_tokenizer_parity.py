"""Golden tokenizer parity: WordPieceTokenizer (HF tokenizers, Rust) must
emit byte-identical ids to the reference's BertTokenizer lineage
(pytorch_transformers → transformers slow BertTokenizer, the same
BasicTokenizer+WordpieceTokenizer python code the reference imports in
task_utils.py:396 / concept_cap_dataset.py:303).

Checkpoint-parity eval scores depend on identical tokenization; this pins
the edge cases (punctuation splitting, accents, CJK chars, unknown words,
subword continuation, casing).
"""

import os

import pytest

from vilbert_tpu.data.tokenization import (
    WordPieceTokenizer,
    add_special_pair,
    add_special_single,
)

# a miniature bert-base-uncased-style vocab: specials first, then whole
# words, subwords and characters the corpus exercises
VOCAB = """[PAD]
[UNK]
[CLS]
[SEP]
[MASK]
the
a
man
rides
horse
hello
world
,
.
!
?
'
"
-
##s
##ing
##ed
##llo
he
cafe
naive
中
文
do
##n
##'
##t
un
##believ
##able
rid
##es
x
##y
##z
"""

CORPUS = [
    "The man rides a horse.",
    "hello, world!",
    "HELLO WORLD",                      # casing folded
    "héllo",                        # é → accent stripped → he ##llo
    "café naïve",              # café/naïve → cafe naive
    "中文",                              # CJK chars split individually
    "don't",                            # punctuation split: do ##n ' t?
    "unbelievable",                     # subword: un ##believ ##able
    "xyz xyzxyz",                       # x ##y ##z chains
    "supercalifragilistic",             # unknown → [UNK]
    "  the   man  ",                    # whitespace runs
    "a-b",                              # hyphen split
    "...",
    "the !? man",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text(VOCAB)
    return str(p)


@pytest.fixture(scope="module")
def reference_tok(vocab_file):
    from transformers import BertTokenizer  # slow = the reference's code path

    return BertTokenizer(vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return WordPieceTokenizer(vocab_file)


def test_corpus_ids_identical(reference_tok, ours):
    for text in CORPUS:
        ref = reference_tok.encode(text, add_special_tokens=False)
        got = ours.encode(text)
        assert got == ref, (text, got, ref,
                            reference_tok.convert_ids_to_tokens(ref))


def test_special_token_assembly(reference_tok, ours):
    for text in CORPUS[:4]:
        ref = reference_tok.encode(text, add_special_tokens=True)
        got = add_special_single(ours, ours.encode(text))
        assert got == ref, text
    a, b = "the man", "rides a horse"
    ref = reference_tok.encode(a, b, add_special_tokens=True)
    got = add_special_pair(ours, ours.encode(a), ours.encode(b))
    assert got == ref


def test_special_ids_match(reference_tok, ours):
    assert ours.pad_token_id == reference_tok.pad_token_id
    assert ours.cls_token_id == reference_tok.cls_token_id
    assert ours.sep_token_id == reference_tok.sep_token_id
    assert ours.mask_token_id == reference_tok.mask_token_id


def test_real_vocab_if_available(reference_tok, ours):
    """If a real bert-base-uncased vocab.txt is on disk, run the corpus
    through both tokenizers over it too (no network: skip otherwise)."""
    candidates = [
        os.path.expanduser("~/.cache/vilbert_tpu/vocab.txt"),
        "/root/repo/data/vocab.txt",
    ]
    path = next((c for c in candidates if os.path.exists(c)), None)
    if path is None:
        pytest.skip("no real vocab.txt on disk")
    from transformers import BertTokenizer

    ref_tok = BertTokenizer(path, do_lower_case=True)
    our_tok = WordPieceTokenizer(path)
    for text in CORPUS + ["a photograph of the Eiffel tower at night"]:
        assert our_tok.encode(text) == ref_tok.encode(
            text, add_special_tokens=False
        ), text
