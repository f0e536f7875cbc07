"""Text batching for the HLLM two-tower stack.

Counterpart of the reference ``TextSEQTrainDataset`` / ``BatchTextDataset``
(trainset.py:180-583, batchset.py:57-268): each item's text is rendered as
``{item_prompt}Title: .. Tag: .. Description: ..`` and tokenized to at most
``MAX_TEXT_LENGTH`` tokens, with one trailing slot reserved for the
learnable item-embedding token.

TPU-first differences from the reference:
* items are tokenized once and cached (the reference re-tokenizes every
  occurrence in every epoch inside DataLoader workers);
* three item-tower batch layouts: dense padded matrices with *static*
  shapes (``pos_tokens [B·(L+P), T+1]``; always-correct default), a packed
  varlen stream for the windowed splash-attention kernel
  (``packed_item_tower``; ~2× faster on TPU at TinyLlama-ish shapes), and
  ``dedup_items`` which encodes each distinct item once per batch and
  gathers back (wins when occurrences repeat; falls back to dense when the
  batch is mostly unique).

Tokenizer resolution: a local HF tokenizer dir when available
(``local_files_only``), else a deterministic hashing tokenizer so the full
pipeline runs hermetically (tests, synthetic data).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, Optional

import numpy as np

from mhrec_tpu.data.trainset import SEQTrainBatcher


class HashTokenizer:
    """Deterministic whitespace+hash tokenizer (no vocab files needed)."""

    def __init__(self, vocab_size: int = 1024):
        self.vocab_size = vocab_size
        self.bos_token_id = 1

    def encode(self, text: str, max_length: int):
        ids = [self.bos_token_id]
        for tok in text.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
            ids.append(2 + h % (self.vocab_size - 2))
            if len(ids) >= max_length:
                break
        return ids


def build_tokenizer(pretrain_dir: Optional[str], vocab_size: int = 1024):
    if pretrain_dir:
        import json as _json
        import os as _os

        model_vocab = None
        cfg_path = _os.path.join(pretrain_dir, "config.json")
        if _os.path.exists(cfg_path):
            try:
                with open(cfg_path) as fh:
                    raw = _json.load(fh)
                # llava-family checkpoints nest the text vocab under
                # text_config (reference modeling_llava_next.py config)
                model_vocab = raw.get("vocab_size") or raw.get(
                    "text_config", {}
                ).get("vocab_size")
            except Exception:
                pass
        try:
            from transformers import AutoTokenizer

            wrapper = _HFTokenizerWrapper(
                AutoTokenizer.from_pretrained(
                    pretrain_dir, local_files_only=True, trust_remote_code=True
                )
            )
            if model_vocab and wrapper.vocab_size > model_vocab:
                # tokenizer/model vocab mismatch (e.g. a weights-only test
                # checkpoint resolving to a stock 32k tokenizer): its ids
                # would index past the embedding table, which jnp.take fills
                # with NaN — use the in-range hash tokenizer instead
                return HashTokenizer(model_vocab)
            return wrapper
        except Exception:
            pass
    return HashTokenizer(model_vocab or vocab_size if pretrain_dir else vocab_size)


class _HFTokenizerWrapper:
    def __init__(self, tok):
        self.tok = tok
        self.vocab_size = tok.vocab_size

    def encode(self, text: str, max_length: int):
        return self.tok.encode(text, truncation=True, max_length=max_length)


class ItemTextCache:
    """Per-item token arrays, computed once.

    With ``image_prefix`` set (use_image), every item's tokens start with
    the fixed ``[vision_start][image_pad × n][vision_end]`` span the vision
    tower splices over (reference chat-template layout, trainset.py:252-254),
    and the text budget shrinks accordingly.
    """

    def __init__(self, dataload, tokenizer, text_keys, item_prompt: str,
                 max_text_length: int, image_prefix: Optional[np.ndarray] = None,
                 n_emb: int = 1, image_store=None):
        self.dataload = dataload
        self.tokenizer = tokenizer
        self.text_keys = list(text_keys or ["title", "tag", "description"])
        self.item_prompt = item_prompt or ""
        self.max_text_length = max_text_length
        self.n_emb = max(int(n_emb), 1)  # columns reserved for emb slots
        self.image_prefix = image_prefix
        # dynamic-resolution mode: per-item prefixes [vs][ip × n_i][ve]
        self.image_store = image_store if (
            image_store is not None and getattr(image_store, "dynamic", False)
        ) else None
        if self.image_store is not None:
            self._img_ids = image_special_ids(tokenizer)
        if image_prefix is not None:
            assert len(image_prefix) < max_text_length, (
                "MAX_TEXT_LENGTH too small for the image-pad span; raise it "
                "or shrink img_height/img_width"
            )
        self._cache: Dict[int, np.ndarray] = {}

    def render(self, item_id: int) -> str:
        df = self.dataload.item_text
        parts = [self.item_prompt] if self.item_prompt else []
        if df is not None and item_id in df.index:
            row = df.loc[item_id]
            for key in self.text_keys:
                if key in row and row[key] is not None:
                    parts.append(f"{key.capitalize()}: {row[key]}")
        return " ".join(str(p) for p in parts) or "unknown item"

    def tokens(self, item_id: int) -> np.ndarray:
        arr = self._cache.get(item_id)
        if arr is None:
            prefix = self.image_prefix
            if self.image_store is not None:
                vs, ip, ve = self._img_ids
                n_i = self.image_store.n_tokens(item_id)
                prefix = np.asarray([vs] + [ip] * n_i + [ve], np.int32)
            budget = self.max_text_length
            if prefix is not None:
                budget -= len(prefix)
            ids = self.tokenizer.encode(self.render(item_id), budget)
            arr = np.asarray(ids[:budget], dtype=np.int32)
            if prefix is not None:
                arr = np.concatenate([prefix, arr])
            self._cache[item_id] = arr
        return arr

    def batch(self, item_ids: np.ndarray):
        """→ (tokens [N, T+n_emb] with trailing emb slot(s), lens [N])."""
        T = self.max_text_length
        N = len(item_ids)
        out = np.zeros((N, T + self.n_emb), dtype=np.int32)
        lens = np.empty(N, dtype=np.int32)
        for i, iid in enumerate(item_ids):
            ids = self.tokens(int(iid))
            out[i, : len(ids)] = ids
            lens[i] = len(ids)
        return out, lens


def image_special_ids(tokenizer):
    """(vision_start, image_pad, vision_end) token ids."""
    tok = getattr(tokenizer, "tok", None)
    if tok is not None:
        try:
            trip = [tok.convert_tokens_to_ids(t) for t in
                    ("<|vision_start|>", "<|image_pad|>", "<|vision_end|>")]
            if all(isinstance(x, int) and x >= 0 for x in trip):
                return tuple(trip)
        except Exception:
            pass
    V = tokenizer.vocab_size  # hash tokenizer: reserve the top of the vocab
    return (V - 3, V - 2, V - 1)


def build_image_prefix(tokenizer, n_tokens: int) -> np.ndarray:
    """``[vision_start][image_pad × n][vision_end]`` token ids (the fixed
    span the vision tower splices over; reference chat-template layout)."""
    vs, ip, ve = image_special_ids(tokenizer)
    return np.asarray([vs] + [ip] * n_tokens + [ve], np.int32)


def _setup_image_store(config, dataload, tokenizer):
    """→ (ItemImageStore | None, image_prefix | None). Dynamic-resolution
    mode returns prefix=None — per-item spans are built by ItemTextCache
    from the store's per-item token counts."""
    if not config.get("use_image", False):
        return None, None
    from mhrec_tpu.data.vision import ItemImageStore

    store = ItemImageStore(config, dataload)
    if store.dynamic:
        return store, None
    return store, build_image_prefix(tokenizer, store.prep.n_tokens)


def dynamic_image_arrays(ids, text_cache, image_store, token_width: int):
    """Host-side dynamic-image maps for a batch of item ids.

    Everything shape-dependent is resolved HERE so the device program is
    static (reference counterpart: the varlen vision path + per-image
    ``get_rope_index`` in modeling_qwen2_vl.py):

      img_src [N, T]    j if position holds this item's j-th image token,
                        else -1 — the gather-splice map consumed by the
                        backbone (replaces the static image_span scatter)
      img_pos [N, 3, T] full (t, h, w) M-RoPE positions per row
      + the DynamicImagePreprocessor capacity arrays (patches/valid/hw).
    """
    out = image_store.dynamic_batch(ids)
    N, T = len(ids), token_width
    s = 1  # span start: position 0 is vision_start
    img_src = np.full((N, T), -1, np.int32)
    if image_store.dyn_kind == "anyres":
        # LLaVA towers use plain sequential positions (image tokens occupy
        # a contiguous span, exactly HF's layout) — no img_pos needed
        for row in range(N):
            n = int(out["n_tokens"][row])
            img_src[row, s:s + n] = np.arange(n, dtype=np.int32)
        out["img_src"] = img_src
        del out["n_tokens"]
        return out
    dyn = image_store.dyn
    m = dyn.merge_size
    img_pos = np.broadcast_to(
        np.arange(T, dtype=np.int32), (N, 3, T)
    ).copy()
    for row in range(N):
        n = int(out["n_tokens"][row])
        # post-merger token grid for this item (hw rows are patch-level)
        gw_m = (int(out["hw"][row, :, 1].max()) + 1) // m if n else 1
        hm = n // max(gw_m, 1)
        j = np.arange(n, dtype=np.int32)
        img_src[row, s:s + n] = j
        img_pos[row, 0, s:s + n] = s
        img_pos[row, 1, s:s + n] = s + j // max(gw_m, 1)
        img_pos[row, 2, s:s + n] = s + j % max(gw_m, 1)
        tail = T - (s + n)
        img_pos[row, :, s + n:] = s + max(hm, gw_m) + np.arange(tail, dtype=np.int32)
    out["img_src"] = img_src
    out["img_pos"] = img_pos
    del out["n_tokens"]
    return out


def _emit_image_keys(batch, prefix, ids, tokens, image_store, text_cache):
    """Attach image arrays for one item group; dynamic mode adds the
    validity/position/gather-map keys alongside the patch tensor."""
    p = f"{prefix}_" if prefix else ""
    if image_store.dynamic:
        arrs = dynamic_image_arrays(ids, text_cache, image_store,
                                    tokens.shape[1])
        batch[f"{p}pixel_patches"] = arrs.pop("patches")
        rename = {"valid": "patch_valid", "hw": "patch_hw"}
        for k, v in arrs.items():  # valid/hw/tok_src/img_src/img_pos
            batch[f"{p}{rename.get(k, k)}"] = v
    else:
        batch[f"{p}pixel_patches"] = image_store.batch(ids)


class TextSEQTrainBatcher(SEQTrainBatcher):
    """SEQTrainBatcher + per-occurrence item-text token matrices (and image
    patch tensors when ``use_image``)."""

    def __init__(self, config, dataload, **kw):
        super().__init__(config, dataload, **kw)
        self.freeze_item_llm = bool(config.get("freeze_item_llm", False))
        self.packed_item_tower = bool(config.get("packed_item_tower", False))
        self.dedup_items = bool(config.get("dedup_items", False))
        self.dedup_quantum = int(config.get("dedup_bucket_quantum", 256))
        self.pack_bucket = int(config.get("pack_bucket", 2048))
        # chunked packing (default): items first-fit into fixed [C, chunk]
        # rows — bounds the splash kernel and compile size; pack_chunk: 0
        # restores the single flat stream
        self.pack_chunk = int(config.get("pack_chunk", 2048) or 0)
        self._chunk_rows_hw = 0
        self.max_text_length = int(config.get("MAX_TEXT_LENGTH", 64))
        tokenizer = build_tokenizer(
            config.get("item_pretrain_dir"), config.get("dummy_vocab_size", 1024)
        )
        self.image_store, image_prefix = _setup_image_store(
            config, dataload, tokenizer
        )
        if self.image_store is not None and self.packed_item_tower:
            raise ValueError("use_image is incompatible with packed_item_tower")
        if self.num_hosts > 1 and (self.packed_item_tower or self.dedup_items):
            # both modes emit per-host arrays whose static shapes (pack
            # buckets / dedup buckets) depend on per-host data — they cannot
            # be concatenated into one coherent global batch yet; the dense
            # per-occurrence tower is multi-host-safe
            raise ValueError(
                "packed_item_tower / dedup_items are single-process only; "
                "use the dense item tower under multi-host"
            )
        self.n_emb = max(int(config.get("item_emb_token_n", 1) or 0), 1)
        self.text_cache = ItemTextCache(
            dataload, tokenizer, config["text_keys"], config.get("item_prompt", ""),
            self.max_text_length, image_prefix=image_prefix, n_emb=self.n_emb,
            image_store=self.image_store,
        )

    def make_batch(self, rng, loc_idx):
        batch = super().make_batch(rng, loc_idx)
        if self.freeze_item_llm:
            return batch
        if self.dedup_items and not self.packed_item_tower:
            # encode each DISTINCT item once per batch and gather back —
            # identical math (an item's embedding is input-independent), far
            # fewer item-tower FLOPs when occurrences repeat. Unique count is
            # padded to a multiple of 256 (bounded recompile variety); when
            # the batch has few duplicates the dense path is used instead.
            ids_all = np.concatenate(
                [batch["items"].ravel(), batch["neg_items"].ravel()]
            )
            uniq, inv = np.unique(ids_all, return_inverse=True)
            q = int(self.dedup_quantum)
            bucket = max(q, -(-len(uniq) // q) * q)
            if bucket < len(ids_all):
                uniq_p = np.zeros(bucket, dtype=uniq.dtype)
                uniq_p[: len(uniq)] = uniq
                tokens, lens = self.text_cache.batch(uniq_p)
                batch["uniq_tokens"], batch["uniq_token_lens"] = tokens, lens
                batch["uniq_inverse"] = inv.astype(np.int32)
                if self.image_store is not None:
                    _emit_image_keys(batch, "uniq", uniq_p, tokens,
                                     self.image_store, self.text_cache)
                return batch
        pos_tokens, pos_lens = self.text_cache.batch(batch["items"].ravel())
        neg_tokens, neg_lens = self.text_cache.batch(batch["neg_items"].ravel())
        if self.packed_item_tower:
            from mhrec_tpu.models.llm.packed import pack_items

            all_tokens = np.concatenate([pos_tokens, neg_tokens], axis=0)
            all_lens = np.concatenate([pos_lens, neg_lens])
            import jax as _jax

            packed = pack_items(all_tokens, all_lens, bucket=self.pack_bucket,
                                n_emb=self.n_emb, chunk=self.pack_chunk,
                                chunk_round=_jax.device_count(),
                                min_rows=self._chunk_rows_hw)
            if self.pack_chunk:
                # high-water mark: steady state compiles ONE [C, chunk] shape
                self._chunk_rows_hw = max(
                    self._chunk_rows_hw, packed["packed_tokens"].shape[0]
                )
            batch.update(packed)
            batch["n_pos_items"] = np.asarray(pos_tokens.shape[0], np.int32)
        else:
            batch["pos_tokens"], batch["pos_token_lens"] = pos_tokens, pos_lens
            batch["neg_tokens"], batch["neg_token_lens"] = neg_tokens, neg_lens
            if self.image_store is not None:
                _emit_image_keys(batch, "pos", batch["items"].ravel(),
                                 pos_tokens, self.image_store, self.text_cache)
                _emit_image_keys(batch, "neg", batch["neg_items"].ravel(),
                                 neg_tokens, self.image_store, self.text_cache)
        return batch


class BatchTextBatcher:
    """All-items corpus iterator for the item-embedding precompute pass
    (reference BatchTextDataset)."""

    def __init__(self, config, dataload, batch_size: Optional[int] = None):
        self.dataload = dataload
        self.max_text_length = int(config.get("MAX_TEXT_LENGTH", 64))
        tokenizer = build_tokenizer(
            config.get("item_pretrain_dir"), config.get("dummy_vocab_size", 1024)
        )
        self.image_store, image_prefix = _setup_image_store(
            config, dataload, tokenizer
        )
        self.n_emb = max(int(config.get("item_emb_token_n", 1) or 0), 1)
        self.text_cache = ItemTextCache(
            dataload, tokenizer, config["text_keys"], config.get("item_prompt", ""),
            self.max_text_length, image_prefix=image_prefix, n_emb=self.n_emb,
            image_store=self.image_store,
        )
        self.batch_size = batch_size or (
            config["MAX_ITEM_LIST_LENGTH"] * config["train_batch_size"]
        )
        # packed corpus chunks remove pad-token compute but measured 3×
        # SLOWER than the dense fwd-only pass on v5e (877 vs 2699 items/s at
        # 12L/1024d; the packed win is train-side where backward activation
        # traffic dominates) — off unless explicitly requested
        self.packed = bool(config.get("packed_corpus_pass", False)) and (
            self.image_store is None
        )
        self.pack_bucket = int(config.get("pack_bucket", 2048))
        self.pack_chunk = int(config.get("pack_chunk", 2048) or 0)
        self._chunk_rows_hw = 0

    def batches(self) -> Iterator[Dict[str, np.ndarray]]:
        n = self.dataload.item_num
        bs = self.batch_size
        for s in range(0, n, bs):
            ids = np.arange(s, min(s + bs, n))
            n_real = len(ids)
            if n_real < bs:  # static shapes
                ids = np.concatenate([ids, np.zeros(bs - n_real, np.int64)])
            tokens, lens = self.text_cache.batch(ids)
            out = {
                "item_ids": ids,
                "n_real": n_real,
            }
            if self.packed:
                from mhrec_tpu.models.llm.packed import pack_items

                import jax as _jax

                packed = pack_items(tokens, lens, bucket=self.pack_bucket,
                                    n_emb=self.n_emb, chunk=self.pack_chunk,
                                    chunk_round=_jax.device_count(),
                                    min_rows=self._chunk_rows_hw)
                if self.pack_chunk:
                    self._chunk_rows_hw = max(
                        self._chunk_rows_hw, packed["packed_tokens"].shape[0]
                    )
                out.update(packed)
            else:
                out["tokens"] = tokens
                out["lens"] = lens
                if self.image_store is not None:
                    _emit_image_keys(out, "", ids, tokens,
                                     self.image_store, self.text_cache)
            yield out
