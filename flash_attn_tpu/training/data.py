"""Language-modeling data pipeline.

Reference: training/src/datamodules/language_modeling_hf.py (HF datasets
tokenized into a uint16 memmap cache, then random-crop batches) and the
fault-tolerant samplers (datamodules/fault_tolerant_sampler.py:9-86
RandomFaultTolerantSampler with state_dict/load_state_dict to resume
mid-epoch data order).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np


class TokenDataset:
    """Flat token-stream dataset (the reference's concatenated-mmap layout):
    sample i is tokens[i*seq : i*seq + seq + 1] -> (input, labels shift)."""

    def __init__(self, tokens: np.ndarray, seqlen: int):
        self.tokens = np.asarray(tokens)
        self.seqlen = seqlen
        self.num_samples = (len(self.tokens) - 1) // seqlen

    @classmethod
    def from_memmap(cls, path: str, seqlen: int, dtype=np.uint16):
        return cls(np.memmap(path, dtype=dtype, mode="r"), seqlen)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        s = self.seqlen
        chunk = np.asarray(self.tokens[idx * s : idx * s + s + 1], np.int32)
        return chunk[:-1], chunk[1:]


class FaultTolerantSampler:
    """Resumable random sampler (maps RandomFaultTolerantSampler,
    fault_tolerant_sampler.py:9): a seeded permutation per epoch plus a
    counter; state_dict/load_state_dict resume the exact mid-epoch order."""

    def __init__(self, num_samples: int, seed: int = 0, shuffle: bool = True):
        self.num_samples = num_samples
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0
        self.counter = 0

    def _perm(self):
        if not self.shuffle:
            return np.arange(self.num_samples)
        rng = np.random.RandomState(self.seed + self.epoch)
        return rng.permutation(self.num_samples)

    def __iter__(self) -> Iterator[int]:
        perm = self._perm()
        while self.counter < self.num_samples:
            idx = int(perm[self.counter])
            self.counter += 1
            yield idx
        self.epoch += 1
        self.counter = 0

    def state_dict(self):
        return {"epoch": self.epoch, "counter": self.counter,
                "seed": self.seed}

    def load_state_dict(self, state):
        self.epoch = state["epoch"]
        self.counter = state["counter"]
        self.seed = state["seed"]


@dataclasses.dataclass
class LMDataModule:
    """Batches (input_ids, labels) from a token stream with a resumable
    sampler; shards batches across data-parallel processes by slicing."""

    dataset: TokenDataset
    batch_size: int
    seed: int = 0
    shuffle: bool = True
    dp_rank: int = 0
    dp_size: int = 1

    def __post_init__(self):
        self.sampler = FaultTolerantSampler(
            len(self.dataset), seed=self.seed, shuffle=self.shuffle
        )

    def batches(self, steps: int):
        it = iter(self.sampler)
        for _ in range(steps):
            xs, ys = [], []
            while len(xs) < self.batch_size:
                try:
                    idx = next(it)
                except StopIteration:
                    it = iter(self.sampler)
                    idx = next(it)
                if (len(xs) + self.sampler.counter) % self.dp_size != self.dp_rank \
                        and self.dp_size > 1:
                    continue
                x, y = self.dataset[idx]
                xs.append(x)
                ys.append(y)
            yield np.stack(xs), np.stack(ys)

    def state_dict(self):
        return {"sampler": self.sampler.state_dict()}

    def load_state_dict(self, state):
        self.sampler.load_state_dict(state["sampler"])


class ImageClassDataset:
    """In-memory / memmap image-classification dataset for ViT training
    (reference: training/src/datamodules imagenet datamodule). Expects
    images as float arrays (n, h, w, c) and int labels (n,) — e.g. a
    preprocessed .npy/.npz dump of ImageNet crops; no torchvision dependency."""

    def __init__(self, images: np.ndarray, labels: np.ndarray):
        assert len(images) == len(labels)
        self.images = images
        self.labels = np.asarray(labels, np.int32)

    @classmethod
    def from_npz(cls, path: str):
        z = np.load(path, mmap_mode="r")
        return cls(z["images"], z["labels"])

    @classmethod
    def synthetic(cls, n: int, image_size: int = 224, channels: int = 3,
                  num_classes: int = 1000, seed: int = 0):
        rng = np.random.RandomState(seed)
        labels = rng.randint(num_classes, size=n).astype(np.int32)
        # Class-dependent mean so a model can learn signal.
        imgs = rng.randn(n, image_size, image_size, channels).astype(np.float32)
        imgs += (labels[:, None, None, None] % 7 - 3) * 0.1
        return cls(imgs, labels)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx: int):
        return np.asarray(self.images[idx], np.float32), self.labels[idx]


@dataclasses.dataclass
class ImageDataModule:
    """Batches (images, labels) with the same resumable-sampler contract as
    LMDataModule (fault-tolerant mid-epoch resume, DP sharding by slicing)."""

    dataset: ImageClassDataset
    batch_size: int
    seed: int = 0
    shuffle: bool = True
    dp_rank: int = 0
    dp_size: int = 1

    def __post_init__(self):
        self.sampler = FaultTolerantSampler(
            len(self.dataset), seed=self.seed, shuffle=self.shuffle
        )

    def batches(self, steps: int):
        it = iter(self.sampler)
        for _ in range(steps):
            xs, ys = [], []
            while len(xs) < self.batch_size:
                try:
                    idx = next(it)
                except StopIteration:
                    it = iter(self.sampler)
                    idx = next(it)
                if (len(xs) + self.sampler.counter) % self.dp_size != self.dp_rank \
                        and self.dp_size > 1:
                    continue
                x, y = self.dataset[idx]
                xs.append(x)
                ys.append(y)
            yield np.stack(xs), np.asarray(ys, np.int32)

    def state_dict(self):
        return {"sampler": self.sampler.state_dict()}

    def load_state_dict(self, state):
        self.sampler.load_state_dict(state["sampler"])


def tokenize_dataset_to_memmap(
    dataset,
    tokenize,
    cache_path: str,
    *,
    text_field: str = "text",
    eos_id: int | None = None,
    map_batch_size: int = 1000,
) -> str:
    """Tokenize a HuggingFace ``datasets.Dataset`` into a flat on-disk
    token memmap (the reference's concatenate-everything cache layout,
    training/src/datamodules/language_modeling_hf.py: tokenize -> append
    eos per document -> one contiguous uint16/uint32 array).

    ``tokenize`` is any callable text -> list[int] (an HF tokenizer's
    ``.encode`` works directly). Returns ``cache_path``; a sidecar
    ``<cache_path>.json`` records dtype + length for reload. Idempotent:
    an existing cache with a valid sidecar is reused.
    """
    import json
    import os

    meta_path = cache_path + ".json"
    if os.path.exists(cache_path) and os.path.exists(meta_path):
        return cache_path

    ids_ds = dataset.map(
        lambda ex: {"_ids": [tokenize(t) for t in ex[text_field]]},
        batched=True, batch_size=map_batch_size,
        remove_columns=dataset.column_names,
    )
    lens = [len(row) for row in ids_ds["_ids"]]
    extra = 1 if eos_id is not None else 0
    total = sum(lens) + extra * len(lens)
    max_id = max(
        (max(row) if row else 0 for row in ids_ds["_ids"]), default=0
    )
    if eos_id is not None:
        max_id = max(max_id, eos_id)
    dtype = np.uint16 if max_id < 2 ** 16 else np.uint32

    mm = np.memmap(cache_path, dtype=dtype, mode="w+", shape=(total,))
    off = 0
    for row in ids_ds["_ids"]:
        mm[off : off + len(row)] = np.asarray(row, dtype)
        off += len(row)
        if eos_id is not None:
            mm[off] = eos_id
            off += 1
    mm.flush()
    with open(meta_path, "w") as f:
        json.dump({"dtype": np.dtype(dtype).name, "length": total}, f)
    return cache_path


def lm_datamodule_from_hf(
    dataset,
    tokenize,
    seqlen: int,
    batch_size: int,
    cache_path: str,
    *,
    text_field: str = "text",
    eos_id: int | None = None,
    **dm_kwargs,
) -> "LMDataModule":
    """LMDataModule over a tokenized-and-cached HF dataset — the TPU-side
    equivalent of the reference's LanguageModelingDataModule (HF datasets +
    memmap cache + fault-tolerant sampler)."""
    import json

    tokenize_dataset_to_memmap(
        dataset, tokenize, cache_path, text_field=text_field, eos_id=eos_id
    )
    with open(cache_path + ".json") as f:
        meta = json.load(f)
    ds = TokenDataset.from_memmap(
        cache_path, seqlen, dtype=np.dtype(meta["dtype"])
    )
    return LMDataModule(ds, batch_size, **dm_kwargs)


def synthetic_tokens(vocab_size: int, n: int, seed: int = 0) -> np.ndarray:
    """Markov-ish synthetic stream so a model can actually learn structure
    (used by tests and the quickstart config)."""
    rng = np.random.RandomState(seed)
    toks = np.zeros(n, np.int32)
    t = rng.randint(vocab_size)
    for i in range(n):
        toks[i] = t
        # next token strongly depends on current -> learnable bigram structure
        t = (t * 7 + 3) % vocab_size if rng.rand() < 0.8 else rng.randint(vocab_size)
    return toks
