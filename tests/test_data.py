"""Data layer: window policy, padding, negative sampling, eval splits
(reference dataload.py:164-195, trainset.py, evalset.py semantics)."""

import numpy as np
import pytest

from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.data.samplers import NegativeSampler
from tests.conftest import make_config


def test_min_len_filter_and_token_maps(base_config, base_data):
    d = base_data
    min_len = base_config["eval_pred_len"] * 2
    for uid in range(1, d.user_num):
        assert d.seq_len_of(uid) > min_len
    assert d.id2token["item_id"][0] == "[PAD]"
    # item tokens sorted
    toks = d.id2token["item_id"][1:]
    assert toks == sorted(toks)


def test_window_policy_matches_reference_semantics(base_data, base_config):
    """Reimplements dataload.py:164-195 naively and compares."""
    d = base_data
    stride = base_config["MAX_ITEM_LIST_LENGTH"] + 1
    expected = []
    for uid in range(d.user_num):
        tlen = d.seq_len_of(uid) - base_config["eval_pred_len"] * 2
        if tlen <= 1:
            continue
        if tlen <= stride:
            expected.append((uid, tlen - 1))
        else:
            offset = (tlen - 1) % stride
            expected.extend((uid, e) for e in range(offset, tlen, stride))
    got = [tuple(x) for x in d.valid_sample_locations]
    assert got == expected


def test_train_batch_shapes_and_masking(base_config, base_data):
    train, _, _ = build_dataloader(base_config, base_data)
    b = next(iter(train.epoch_batches(0)))
    B = base_config["train_batch_size"]
    L, P = base_config["MAX_ITEM_LIST_LENGTH"], base_config["pred_len"]
    assert b["items"].shape == (B, L + P)
    assert b["masked_index"].shape == (B, L + P)
    # contiguity: each row's valid region is one contiguous run
    for row in b["masked_index"]:
        on = np.flatnonzero(row)
        assert (np.diff(on) == 1).all()
    # valid tokens reproduce the user's actual subsequence
    locs = base_data.valid_sample_locations
    # padding with random items: pad positions are nonzero when configured
    assert base_config["pad_random_sample"]
    assert (b["items"][b["masked_index"] == 0] > 0).mean() > 0.9


def test_negatives_exclude_window(base_config, base_data):
    train, _, _ = build_dataloader(base_config, base_data)
    for epoch in range(2):
        for b in train.epoch_batches(epoch):
            for i in range(b["items"].shape[0]):
                inter = np.intersect1d(b["neg_items"][i].ravel(), b["items"][i])
                assert inter.size == 0


def test_negatives_without_replacement_large_pool():
    sampler = NegativeSampler(item_num=100001)
    rng = np.random.default_rng(0)
    bl = rng.integers(1, 100001, size=(16, 30))
    out = sampler.sample(rng, bl, k=64)
    for i in range(16):
        assert len(set(out[i].tolist())) == 64
        assert not np.isin(out[i], bl[i]).any()


def test_per_category_negatives(prior_config, prior_data):
    train, _, _ = build_dataloader(prior_config, prior_data)
    b = next(iter(train.epoch_batches(0)))
    C = prior_config["eval_num_cats"]
    assert b["neg_items"].shape[1] == C + 1
    for c in range(C):
        pool = set(prior_data.int_category_to_item_id[c].tolist())
        vals = set(b["neg_items"][:, c].ravel().tolist())
        assert vals <= pool


def test_weighted_negative_sampling_distribution():
    n_items = 1001
    counts = np.zeros(n_items - 1)
    counts[:100] = 100.0  # first 100 items hugely popular
    counts[100:] = 1.0
    w = np.cumsum(counts)
    cdf = w / w[-1]
    sampler = NegativeSampler(item_num=n_items, global_cdf=cdf)
    rng = np.random.default_rng(0)
    out = sampler.sample(rng, np.zeros((8, 4), np.int64), k=512)
    frac_popular = (out <= 100).mean()
    assert frac_popular > 0.7  # 100*100/(100*100+900) ≈ 0.92


def test_eval_targets(base_config, base_data):
    _, valid, test = build_dataloader(base_config, base_data)
    P = base_config["eval_pred_len"]
    tb = next(iter(test.batches()))
    for i in np.flatnonzero(tb["sample_weight"])[:10]:
        uid = int(tb["user_ids"][i])
        assert (tb["item_target"][i] == base_data.seq_of(uid)[-P:]).all()
    vb = next(iter(valid.batches()))
    for i in np.flatnonzero(vb["sample_weight"])[:10]:
        uid = int(vb["user_ids"][i])
        tl = int(base_data.train_seq_len[uid])
        assert (vb["item_target"][i] == base_data.seq_of(uid)[tl : tl + P]).all()


def test_eval_host_striding(base_config, base_data):
    from mhrec_tpu.data.evalset import SeqEvalBatcher

    all_uids = []
    for host in range(4):
        b = SeqEvalBatcher(base_config, base_data, phase="test", host_id=host, num_hosts=4)
        for batch in b.batches():
            all_uids.extend(batch["user_ids"][batch["sample_weight"]].tolist())
    assert sorted(all_uids) == list(range(1, base_data.user_num))


def test_event_category_batches(synth_events_dir):
    c = make_config(
        synth_events_dir, loss="prior", eval_num_cats=4, category_by="event",
        num_prior_head=4, pred_len=2,
    )
    d = InteractionData(c).build()
    train, _, test = build_dataloader(c, d)
    b = next(iter(train.epoch_batches(0)))
    tags = b["tag_categories"]
    assert tags.shape[-1] == 4
    # one-hot on valid positions, zero on pads
    assert (tags.sum(-1)[b["masked_index"] == 1] == 1).all()
    assert (tags.sum(-1)[b["masked_index"] == 0] == 0).all()
    eb = next(iter(test.batches()))
    assert (eb["target_tags"].sum(-1)[eb["sample_weight"]] == 1).all()


def test_ablation_random_and_all_tags(synth_dir):
    c = make_config(synth_dir, loss="prior", eval_num_cats=4, all_tags=True)
    d = InteractionData(c).build()
    assert d.item_tag_matrix[1:].all()
    c2 = make_config(synth_dir, loss="prior", eval_num_cats=4, random_tags=True)
    d2 = InteractionData(c2).build()
    assert not d2.item_tag_matrix[1:].all()
    # pools built from original tags regardless of ablation
    assert all(
        (d.int_category_to_item_id[i] == d2.int_category_to_item_id[i]).all()
        for i in range(4)
    )


def test_prefetch_iterator_propagates_producer_errors():
    """A crash in the producer must surface in the consumer, not silently
    truncate the stream (a truncated corpus pass would yield a short item
    table and plausible-but-wrong metrics)."""
    from mhrec_tpu.data.trainset import _prefetch_iterator

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer died")

    it = _prefetch_iterator(boom(), depth=2)
    import pytest as _pytest

    got = []
    with _pytest.raises(RuntimeError, match="producer died"):
        for x in it:
            got.append(x)
    assert got == [1, 2]
