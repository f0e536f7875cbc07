"""Training batcher for ID sequence models.

One sample is a window of ``MAX_ITEM_LIST_LENGTH + pred_len`` item ids ending
at a precomputed ``(uid, context_end)`` location: left-padded context,
right-padded prediction slots, with padding drawn as random negatives when
``pad_random_sample`` (reference ``trainset.py:111-177``). Negatives are
``num_negatives / (world_size * batch_size)`` per sample (trainset.py:60),
optionally drawn per category.

The reference materializes samples one-by-one in 8 DataLoader workers; here a
whole batch is one vectorized gather against the flat interaction array plus
one vectorized negative-sampling call, which removes the Python hot loop and
feeds the TPU from a single host thread (with an optional double-buffer).

Batch dict (all numpy, static shapes):
  items            [B, L+P] int32
  neg_items        [B, num_cats+1 or 1, K] int32
  masked_index     [B, L+P] int32   (1 = real token)
  tag_categories   [B, L+P, C] int8 (only when loss == 'prior')
"""

from __future__ import annotations

import math
import threading
import queue as queue_mod
from typing import Dict, Iterator, Optional

import numpy as np

from mhrec_tpu.data.samplers import make_negative_sampler


def _wants_position_negatives(config) -> bool:
    """SASRec/LLMIDRec draw [B, L, num_negatives] per-position negatives
    IN-MODEL (reference sasrec.py:79-86 torch.randint). Under
    sparse_item_adam those global draws cannot index the per-batch
    sub-table, so the batcher pre-samples them (same uniform [1, item_num)
    distribution) and remaps like everything else; the flag
    ``batch_position_negatives`` forces the batch path outside sparse mode
    (e.g. for sparse↔dense parity tests)."""
    return (
        str(config["model"]) in ("SASRec", "LLMIDRec")
        and bool(config["num_negatives"])
        and (
            bool(config.get("sparse_item_adam", False))
            or bool(config.get("batch_position_negatives", False))
        )
    )


def unique_id_cap(config, num_hosts: int = 1, world_size: int = 1) -> int:
    """Static size of the per-host unique-id block under sparse_item_adam
    (shared by the batcher and the trainer's accumulation buffers): every id
    in the batch + 1 forced pad id, rounded up to bound recompiles."""
    per_host_rows = config["train_batch_size"] // num_hosts
    window = config["MAX_ITEM_LIST_LENGTH"] + config["pred_len"]
    num_neg = config["num_negatives"]
    per_sample_negs = (
        math.ceil(num_neg / world_size / config["train_batch_size"])
        if num_neg else config["MAX_ITEM_LIST_LENGTH"]
    )
    by_cat = (
        config["loss"] == "prior"
        and bool(config["neg_sample_by_cat"])
        and config["category_by"] == "item"
    )
    n_ids = per_host_rows * window
    n_ids += per_host_rows * per_sample_negs * (
        (config["eval_num_cats"] + 1) if by_cat else 1
    )
    if _wants_position_negatives(config):
        # [B, W-1, num_negatives] per-position draws join the unique set
        n_ids += per_host_rows * (window - 1) * num_neg
    return ((n_ids + 1 + 511) // 512) * 512


class SEQTrainBatcher:
    def __init__(self, config, dataload, world_size: int = 1, host_id: int = 0, num_hosts: int = 1):
        self.dataload = dataload
        self.config = config
        self.item_num = dataload.item_num
        self.max_seq_length = config["MAX_ITEM_LIST_LENGTH"]
        self.pred_len = config["pred_len"]
        self.window_len = self.max_seq_length + self.pred_len
        # train_batch_size is GLOBAL (docs/MIGRATION.md): each host builds
        # global/num_hosts rows and the jit train step sees the assembled
        # global batch (reference: per-GPU batch × world ranks)
        self.global_batch_size = config["train_batch_size"]
        self.host_id = host_id
        self.num_hosts = num_hosts
        if self.global_batch_size % num_hosts:
            raise ValueError(
                f"train_batch_size {self.global_batch_size} must divide by "
                f"num_hosts {num_hosts}"
            )
        self.batch_size = self.global_batch_size // num_hosts  # per-host rows

        self.return_tag_mask = config["loss"] == "prior"
        self.category_by = config["category_by"]
        self.eval_num_cats = config["eval_num_cats"]
        self.neg_sample_by_cat = (
            self.return_tag_mask
            and bool(config["neg_sample_by_cat"])
            and self.category_by == "item"
        )
        self.random_sample = bool(config["pad_random_sample"])

        num_neg = config["num_negatives"]
        if num_neg:
            # per-sample count so that the GLOBAL pool ≈ num_negatives
            # (reference trainset.py:60 divides by world_size × per-GPU
            # batch = the global batch; ours is global outright)
            self.num_negatives = math.ceil(
                num_neg / world_size / self.global_batch_size
            )
        else:
            self.num_negatives = self.max_seq_length

        self.sampler = make_negative_sampler(config, dataload)
        self.locations = dataload.valid_sample_locations
        self.length = len(self.locations)
        self.seed = int(config["seed"] or 0)

        # sparse item-table updates: remap item ids in the batch to local
        # indices into a per-batch unique-id sub-table (the trainer then
        # gathers/updates only the touched rows — the reference's dense
        # FusedAdam over the whole nn.Embedding has no equivalent trick)
        self.sparse_item_table = bool(config.get("sparse_item_adam", False))
        self._remap_lut = None  # lazy [item_num] int32 (sparse remap)
        self.position_negatives = _wants_position_negatives(config)
        self.num_position_negatives = int(config["num_negatives"] or 0)
        if self.sparse_item_table:
            self.unique_cap = unique_id_cap(config, num_hosts=num_hosts)

        if self.category_by == "user" and self.return_tag_mask:
            n_clusters = max(dataload.category_to_int.values()) + 1
            self.one_hot_user_cluster = np.eye(n_clusters, dtype=np.int8)[
                dataload.user_cluster_list
            ]

    def __len__(self):
        return self.length

    @property
    def steps_per_epoch(self) -> int:
        per_host = self.length // self.num_hosts
        return max(per_host // self.batch_size, 1)

    # ------------------------------------------------------------------
    def make_batch(self, rng: np.random.Generator, loc_idx: np.ndarray) -> Dict[str, np.ndarray]:
        d = self.dataload
        L, P, W = self.max_seq_length, self.pred_len, self.window_len
        uid = self.locations[loc_idx, 0]
        context_end = self.locations[loc_idx, 1]
        B = len(uid)

        context_start = np.maximum(0, context_end - L)
        context_pad = L - (context_end - context_start)
        pred_take = np.minimum(d.train_seq_len[uid] - context_end, P)
        pred_pad = P - pred_take

        col = np.arange(W)[None, :]
        src_pos = context_start[:, None] + (col - context_pad[:, None])
        valid = (col >= context_pad[:, None]) & (col < W - pred_pad[:, None])
        flat_idx = d.seq_offsets[uid][:, None] + np.clip(src_pos, 0, None)
        flat_idx = np.minimum(flat_idx, len(d.flat_items) - 1)
        items = np.where(valid, d.flat_items[flat_idx], 0)

        if self.random_sample:
            # pad slots drawn as random negatives excluding the real window
            # items (reference trainset.py:111-122)
            n_pad = W  # upper bound per row
            pad_draws = self.sampler.sample(rng, np.where(valid, items, 0), n_pad)
            pad_fill = np.empty_like(items)
            pad_fill[:, :] = pad_draws[:, :W]
            items = np.where(valid, items, pad_fill)

        masked_index = valid.astype(np.int32)

        # negatives exclude everything in the (already padded) window row,
        # matching reference reconstruct_train_data (trainset.py:124-137)
        K = self.num_negatives
        if self.neg_sample_by_cat:
            negs = [
                self.sampler.sample(rng, items, K, cat_idx=c)
                for c in range(self.eval_num_cats)
            ]
            negs.append(self.sampler.sample(rng, items, K))
            neg_items = np.stack(negs, axis=1)
        else:
            neg_items = self.sampler.sample(rng, items, K)[:, None, :]

        batch = {
            "items": items.astype(np.int32),
            "neg_items": neg_items.astype(np.int32),
            "masked_index": masked_index,
        }

        if self.return_tag_mask:
            if self.category_by == "item":
                batch["tag_categories"] = d.item_tag_matrix[items].astype(np.int8)
            elif self.category_by == "user":
                batch["tag_categories"] = np.broadcast_to(
                    self.one_hot_user_cluster[uid][:, None, :], (B, W, self.eval_num_cats)
                ).astype(np.int8)
            else:  # event
                ev = np.where(valid, d.flat_events[flat_idx], -1)
                onehot = np.zeros((B, W, self.eval_num_cats), dtype=np.int8)
                rows, cols = np.nonzero(ev >= 0)
                onehot[rows, cols, ev[rows, cols]] = 1
                batch["tag_categories"] = onehot
        else:
            batch["tag_categories"] = np.zeros((B, 0, 0), dtype=np.int8)

        if self.position_negatives:
            # per-position uniform draws matching the reference's in-model
            # torch.randint [1, item_num) (sasrec.py:79-86) — pre-sampled on
            # the host so sparse mode can remap them to sub-table indices
            batch["pos_neg_items"] = rng.integers(
                1, self.item_num,
                size=(B, W - 1, self.num_position_negatives),
            ).astype(np.int32)

        if self.sparse_item_table:
            # AFTER all global-id lookups (tags above): remap items/neg_items
            # to local indices into the per-batch unique sub-table. Index 0 is
            # always the pad item (id 0), so pad checks (== 0) keep working.
            remap_keys = ["items", "neg_items"] + (
                ["pos_neg_items"] if self.position_negatives else []
            )
            all_ids = np.concatenate(
                [[0]] + [batch[k].ravel() for k in remap_keys]
            )
            uniq = np.unique(all_ids)  # sorted, uniq[0] == 0
            n = len(uniq)
            assert n <= self.unique_cap, (n, self.unique_cap)
            ids = np.zeros(self.unique_cap, np.int32)
            ids[:n] = uniq
            mask = np.zeros(self.unique_cap, np.float32)
            mask[:n] = 1.0
            batch["unique_ids"] = ids
            batch["unique_mask"] = mask
            # O(1)-per-lookup remap through a persistent [item_num] LUT —
            # 30x faster than the per-value np.searchsorted binary search
            # (a measured hot spot of prior-protocol batch gen). Stale LUT
            # entries from earlier batches are never read: every remapped
            # value is in THIS batch's uniq, whose slots were just written.
            if self._remap_lut is None:
                self._remap_lut = np.zeros(self.item_num, np.int32)
            self._remap_lut[uniq] = np.arange(n, dtype=np.int32)
            for k in remap_keys:
                batch[k] = self._remap_lut[batch[k]]
            if self.num_hosts > 1:
                # multi-host: the global sub-table is the concat of per-host
                # [U_cap] blocks; this host's local indices shift by its block
                # offset — EXCEPT index 0 (the pad item), which must stay 0
                # everywhere (`items != 0` pad checks, hstu.py:389). The same
                # row may appear in several hosts' blocks; the trainer's
                # global dedup (sparse_adam.dedup_touched_rows) sums their
                # gradients before the nonlinear Adam update.
                off = self.host_id * self.unique_cap
                for key in remap_keys:
                    v = batch[key]
                    batch[key] = np.where(v > 0, v + off, 0).astype(np.int32)
        return batch

    # ------------------------------------------------------------------
    def epoch_batches(self, epoch: int, drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Shuffled, host-sharded batches for one epoch (DistributedSampler
        semantics: same global permutation on every host, rank-strided)."""
        rng = np.random.default_rng(self.seed + epoch)
        perm = rng.permutation(self.length)
        shard = perm[self.host_id :: self.num_hosts]
        # identical batch count on every host (SPMD lockstep): derive from
        # the GLOBAL length, not this host's (possibly +1) shard length
        n_batches = (self.length // self.num_hosts) // self.batch_size
        sample_rng = np.random.default_rng(
            (self.seed + epoch) * 1_000_003 + self.host_id
        )
        for b in range(n_batches):
            idx = shard[b * self.batch_size : (b + 1) * self.batch_size]
            yield self.make_batch(sample_rng, idx)

    def infinite_batches(self, prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        """Endless batch stream with background-thread prefetch."""
        def gen():
            epoch = 0
            while True:
                yield from self.epoch_batches(epoch)
                epoch += 1

        return _prefetch_iterator(gen(), prefetch)


def _prefetch_iterator(it: Iterator, depth: int) -> Iterator:
    if depth <= 0:
        return it
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(stop)
        except BaseException as exc:  # propagate into the consumer — a
            # swallowed producer error would silently truncate the stream
            q.put((stop, exc))

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    def drain():
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
                raise item[1]
            yield item

    return drain()
