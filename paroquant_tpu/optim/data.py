"""Calibration dataset loading (reference optim/util.py:111-214).

Token-block packing: tokenize documents, concatenate, cut into fixed
[batch, seqlen] blocks. Multi-dataset even mixing + seeded shuffle
(util.py:111-139). Dataset names match the reference recipes: pileval,
wikitext2, c4, redpajama — plus `synthetic` (random tokens) for offline
development; this box has zero egress so HF datasets must already be cached.
"""

from __future__ import annotations

import numpy as np

DATASET_SPECS = {
    "pileval": ("mit-han-lab/pile-val-backup", None, "validation", "text"),
    "wikitext2": ("wikitext", "wikitext-2-raw-v1", "train", "text"),
    "c4": ("allenai/c4", "en", "train", "text"),
    "redpajama": ("togethercomputer/RedPajama-Data-1T-Sample", None, "train", "text"),
}


def _pack_blocks(token_stream: list[int], n_samples: int, seqlen: int) -> np.ndarray:
    total = n_samples * seqlen
    if len(token_stream) < total:
        reps = total // max(len(token_stream), 1) + 1
        token_stream = (token_stream * reps)[:total]
    return np.asarray(token_stream[:total], np.int32).reshape(n_samples, seqlen)


def get_calib_dataset(
    name: str,
    tokenizer,
    n_samples: int,
    seqlen: int,
    seed: int = 0,
    vocab_size: int = 32000,
) -> np.ndarray:
    """Returns [n_samples, seqlen] int32."""
    if name == "synthetic":
        rng = np.random.default_rng(seed)
        return rng.integers(0, vocab_size, (n_samples, seqlen)).astype(np.int32)
    if tokenizer is None:
        raise ValueError(f"dataset {name} needs a tokenizer")
    from datasets import load_dataset

    repo, subset, split, field = DATASET_SPECS[name]
    if name == "c4":
        ds = load_dataset(
            repo, data_files={"train": "en/c4-train.00000-of-01024.json.gz"}, split="train"
        )
    else:
        ds = load_dataset(repo, subset, split=split)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(ds))
    stream: list[int] = []
    for i in idx:
        text = ds[int(i)][field]
        if not text:
            continue
        stream.extend(tokenizer(text).input_ids)
        if len(stream) >= n_samples * seqlen:
            break
    return _pack_blocks(stream, n_samples, seqlen)


def get_mixed_calib_dataset(
    names: list[str],
    tokenizer,
    n_samples: int,
    seqlen: int,
    seed: int = 0,
    vocab_size: int = 32000,
) -> np.ndarray:
    """Even mixing across datasets + seeded shuffle (util.py:111-139)."""
    if len(names) == 1:
        return get_calib_dataset(names[0], tokenizer, n_samples, seqlen, seed, vocab_size)
    per = n_samples // len(names)
    parts = []
    for j, name in enumerate(names):
        take = per if j < len(names) - 1 else n_samples - per * (len(names) - 1)
        parts.append(
            get_calib_dataset(name, tokenizer, take, seqlen, seed + j, vocab_size)
        )
    blocks = np.concatenate(parts, axis=0)
    rng = np.random.default_rng(seed)
    return blocks[rng.permutation(len(blocks))]
