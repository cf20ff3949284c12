import numpy as np
import pytest

from tests.helpers import (
    build_mbeir_fixture,
    identity_image_transform,
    simple_tokenizer,
    simple_bert_tokenizer,
    tiny_bert_vocab,
    tiny_clip_merges,
)
from uniir_tpu.data.dataset import MBEIRMainDataset, MBEIRCandidatePoolDataset, Mode
from uniir_tpu.data.collator import MBEIRMainCollator, MBEIRCandidatePoolCollator
from uniir_tpu.data.loader import EpochShuffleSampler, ContiguousSampler, MBEIRLoader
from uniir_tpu.data.tokenizers.clip_bpe import CLIPTokenizer
from uniir_tpu.data.tokenizers.bert_wordpiece import BertTokenizer


@pytest.fixture(scope="module")
def mbeir_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mbeir")
    build_mbeir_fixture(str(root))
    return str(root)


def make_train_ds(root, hard_neg_num=0):
    return MBEIRMainDataset(
        mbeir_data_dir=root,
        query_data_path="queries.jsonl",
        cand_pool_path="cand_pool.jsonl",
        query_instruct_path="instructions.tsv",
        img_preprocess_fn=identity_image_transform(32),
        mode=Mode.TRAIN,
        hard_neg_num=hard_neg_num,
        returns={"hashed_p_did": True, "hashed_n_dids": hard_neg_num > 0},
    )


def test_main_dataset_train_item(mbeir_root):
    ds = make_train_ds(mbeir_root)
    ds.seed(0)
    item = ds[0]
    assert "query" in item and "pos_cand" in item and "p_did" in item
    # Instruction prompt prepended and canonicalized
    assert item["query"]["txt"][0].isupper()
    assert item["query"]["txt"].endswith(".")
    # image query 0 has an image
    assert item["query"]["img"] is not None
    assert item["query"]["img"].shape == (32, 32, 3)


def test_main_dataset_hard_negs_wraparound(mbeir_root):
    ds = make_train_ds(mbeir_root, hard_neg_num=7)
    ds.seed(0)
    item = ds[1]
    assert len(item["neg_cand_list"]) == 7  # wraps around the 4 stored negs
    assert len(item["n_dids"]) == 7


def test_main_dataset_eval_filters_pos_by_dataset(mbeir_root):
    ds = MBEIRMainDataset(
        mbeir_data_dir=mbeir_root,
        query_data_path="queries.jsonl",
        cand_pool_path="cand_pool.jsonl",
        query_instruct_path="instructions.tsv",
        img_preprocess_fn=identity_image_transform(32),
        mode=Mode.EVAL,
        returns={"task_id": True},
    )
    item = ds[0]
    assert "qid" in item and "task_id" in item
    assert "pos_cand" not in item


def test_collator_static_layout(mbeir_root):
    bs, neg = 4, 2
    ds = make_train_ds(mbeir_root, hard_neg_num=neg)
    ds.seed(0)
    coll = MBEIRMainCollator(simple_tokenizer(), 32, mode=Mode.TRAIN, hard_neg_num=neg)
    batch = coll([ds[i] for i in range(bs)])

    n_rows = bs * (2 + neg)
    assert batch["txt_batched"].shape[0] == n_rows
    assert batch["image_batched"].shape == (n_rows, 32, 32, 3)
    im = batch["index_mapping"]
    np.testing.assert_array_equal(im["query"].flatten(), np.arange(bs))
    np.testing.assert_array_equal(im["pos_cand"].flatten(), bs + np.arange(bs))
    np.testing.assert_array_equal(im["neg_cand_list"], (2 * bs + np.arange(bs * neg)).reshape(bs, neg))
    # masks: text-modality candidates have no image -> mask 0 and all-zero image
    img_mask = batch["image_mask_batched"]
    zero_rows = np.where(img_mask == 0)[0]
    assert (batch["image_batched"][zero_rows] == 0).all()
    assert batch["p_did_list"].shape == (bs,)
    assert batch["nc_dids_list"].shape == (bs, neg)


def test_cand_pool_collator(mbeir_root):
    ds = MBEIRCandidatePoolDataset(mbeir_root, "cand_pool.jsonl", identity_image_transform(32))
    coll = MBEIRCandidatePoolCollator(simple_bert_tokenizer(), 32)
    batch = coll([ds[i] for i in range(6)])
    assert batch["txt_batched"]["input_ids"].shape[0] == 6
    assert batch["did_list"].shape == (6,)
    assert batch["did_list"][0] == 9 * 10_000_000


def test_epoch_shuffle_sampler_partitions():
    n, world = 103, 8
    shards = [EpochShuffleSampler(n, world, r, seed=7) for r in range(world)]
    all_idx = np.concatenate([s.indices() for s in shards])
    assert len(all_idx) == (n // world) * world
    assert len(np.unique(all_idx)) == len(all_idx)
    # epoch changes the permutation
    s0 = shards[0].indices().copy()
    shards[0].set_epoch(1)
    assert not np.array_equal(s0, shards[0].indices())


def test_contiguous_sampler_covers_in_order():
    n, world = 103, 8
    shards = [ContiguousSampler(n, world, r) for r in range(world)]
    all_idx = np.concatenate([s.indices() for s in shards])
    np.testing.assert_array_equal(all_idx, np.arange(n))


def test_loader_pads_last_batch(mbeir_root):
    ds = MBEIRCandidatePoolDataset(mbeir_root, "cand_pool.jsonl", identity_image_transform(32))
    coll = MBEIRCandidatePoolCollator(simple_tokenizer(), 32)
    loader = MBEIRLoader(ds, coll, batch_size=10, num_workers=2, drop_last=False, pad_last=True)
    batches = list(loader)
    assert len(batches) == 3  # 24 items -> 10,10,4(+6 pad)
    assert all(b["image_batched"].shape[0] == 10 for b in batches)
    assert int(batches[-1]["n_valid"]) == 4


def test_clip_bpe_tokenizer_tiny():
    tok = CLIPTokenizer(merges=tiny_clip_merges())
    out = tok(["red dress", "a cat photo"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot_id
    # eot present in each row
    assert (out == tok.eot_id).any(axis=1).all()
    # roundtrip through decode recovers words
    ids = tok.encode("red dress")
    assert "red dress" in tok.decode(ids).strip()


def test_clip_bpe_truncation():
    tok = CLIPTokenizer(merges=tiny_clip_merges())
    long_text = "cat " * 200
    out = tok([long_text], context_length=16)
    assert out.shape == (1, 16)
    assert out[0, -1] == tok.eot_id


def test_bert_wordpiece():
    tok = BertTokenizer(tiny_bert_vocab())
    out = tok(["The red dress", "cats"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    assert out["input_ids"][0, 0] == tok.cls_token_id
    assert out["attention_mask"][0].sum() >= 4
    # wordpiece splits "cats" -> cat ##s
    toks = tok.tokenize("cats")
    assert toks == ["cat", "##s"]
    # unknown word -> UNK
    assert tok.tokenize("zzz") == ["[UNK]"]
    # blip special tokens exist
    assert tok.enc_token_id is not None and tok.bos_token_id is not None


def test_loader_producer_unblocks_on_abandon():
    """Abandoning iteration with a full prefetch queue must not leak a
    blocked producer thread (regression: producer used an unbounded put)."""
    import threading
    import time

    from uniir_tpu.data.loader import MBEIRLoader

    class Toy:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return i

    loader = MBEIRLoader(Toy(), collate_fn=lambda items: {"x": np.asarray(items)}, batch_size=4, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)  # start the producer; queue fills behind the consumer
    del it  # abandon: generator close sets stop via finally
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread still alive after abandon"
