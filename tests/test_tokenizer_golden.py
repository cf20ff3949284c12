"""Golden-value tokenizer tests against the REAL public vocabularies.

The build environment has no egress, so the vocab files are fetched once with
scripts/fetch_vocabs.py; until they exist these tests SKIP (the synthetic-
vocab unit tests in test_data.py always run).  The expected ids below were
captured from the published stacks (`clip.tokenize` from the OpenAI CLIP
repo and HF `BertTokenizer('bert-base-uncased')`) — any divergence is a
tokenizer bug that would silently zero Recall@k.

Reference contracts: src/models/uniir_clip/clip_scorefusion/clip_sf.py:36-41
(clip.tokenize, 77 ctx, truncate-with-EOT) and
src/models/uniir_blip/backbone/blip.py:221-226 (bert-base-uncased + [DEC]/[ENC]).
"""

import os

import numpy as np
import pytest

HERE = os.path.join(os.path.dirname(__file__), "..", "uniir_tpu", "data", "tokenizers")
CLIP_BPE = os.environ.get("UNIIR_CLIP_BPE") or os.path.join(HERE, "bpe_simple_vocab_16e6.txt.gz")
BERT_VOCAB = os.environ.get("UNIIR_BERT_VOCAB") or os.path.join(HERE, "bert_base_uncased_vocab.txt")

needs_clip_bpe = pytest.mark.skipif(
    not os.path.exists(CLIP_BPE), reason="real CLIP BPE merges not present (scripts/fetch_vocabs.py)"
)
needs_bert_vocab = pytest.mark.skipif(
    not os.path.exists(BERT_VOCAB), reason="real BERT vocab not present (scripts/fetch_vocabs.py)"
)

# clip.tokenize golden rows (non-padded prefix; row is zero-padded to 77).
CLIP_GOLDEN = [
    ("a photo of a cat", [49406, 320, 1125, 539, 320, 2368, 49407]),
    ("a photo of a dog", [49406, 320, 1125, 539, 320, 1929, 49407]),
    ("this is a diagram", [49406, 589, 533, 320, 22697, 49407]),
]

# HF BertTokenizer('bert-base-uncased')(text)['input_ids'] golden rows.
BERT_GOLDEN = [
    ("hello world", [101, 7592, 2088, 102]),
    ("the quick brown fox jumps over the lazy dog", [101, 1996, 4248, 2829, 4419, 14523, 2058, 1996, 13971, 3899, 102]),
]


@needs_clip_bpe
class TestCLIPGolden:
    @pytest.fixture(scope="class")
    def tok(self):
        from uniir_tpu.data.tokenizers.clip_bpe import CLIPTokenizer

        return CLIPTokenizer(bpe_path=CLIP_BPE)

    def test_vocab_size_and_specials(self, tok):
        assert tok.vocab_size == 49408
        assert tok.sot_id == 49406
        assert tok.eot_id == 49407

    @pytest.mark.parametrize("text,expected", CLIP_GOLDEN, ids=[t for t, _ in CLIP_GOLDEN])
    def test_golden_ids(self, tok, text, expected):
        row = tok(text)[0]
        assert row.shape == (77,)
        np.testing.assert_array_equal(row[: len(expected)], expected)
        assert (row[len(expected) :] == 0).all()

    def test_truncation_keeps_eot(self, tok):
        row = tok("a photo of a cat " * 40)[0]
        assert row.shape == (77,)
        assert row[0] == 49406 and row[-1] == 49407
        assert (row != 0).all()

    def test_roundtrip(self, tok):
        ids = tok.encode("a photo of a cat")
        assert tok.decode(ids).strip() == "a photo of a cat"


@needs_bert_vocab
class TestBERTGolden:
    @pytest.fixture(scope="class")
    def tok(self):
        from uniir_tpu.data.tokenizers.bert_wordpiece import BertTokenizer

        return BertTokenizer(BERT_VOCAB)

    def test_special_ids(self, tok):
        assert tok.vocab["[PAD]"] == 0
        assert tok.vocab["[UNK]"] == 100
        assert tok.vocab["[CLS]"] == 101
        assert tok.vocab["[SEP]"] == 102
        assert tok.vocab["[MASK]"] == 103
        # BLIP appends [DEC]/[ENC] after the 30522 base entries (blip.py:221-226)
        assert tok.vocab["[DEC]"] == 30522
        assert tok.vocab["[ENC]"] == 30523

    @pytest.mark.parametrize("text,expected", BERT_GOLDEN, ids=[t[:20] for t, _ in BERT_GOLDEN])
    def test_golden_ids(self, tok, text, expected):
        out = tok([text], max_length=32)
        ids = out["input_ids"][0]
        np.testing.assert_array_equal(ids[: len(expected)], expected)
        assert (ids[len(expected) :] == 0).all()
        np.testing.assert_array_equal(out["attention_mask"][0][: len(expected)], 1)
