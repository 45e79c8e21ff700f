"""Per-impression positive/negative sampling for pairwise and InfoNCE training.

Capability parity with the reference samplers
(``/root/reference/src/news_rec_utils/data_utils.py:275-388``):

- ``sample_pos_neg_pairs``: per impression, equalize positive and negative counts to
  ``max(num_pos, num_neg)`` (optionally capped by ``max_neg_ratio``/``max_pos_ratio``)
  by sampling the larger side without replacement and oversampling the smaller side
  with replacement, then permuting (reference ``split_impressions_pos_neg``,
  ``data_utils.py:337-388``).
- ``sample_pos_neg_infonce``: per positive, ``num_neg_per_pos`` negatives sampled
  without replacement when enough exist, else all negatives plus ``-1`` padding
  (reference ``split_impressions_pos_neg_infonce``, ``data_utils.py:275-334``).

Sampling runs on host with ``np.random.Generator`` (this is input-pipeline work;
model-side randomness uses ``jax.random`` keys). Distributional invariants match the
reference; exact bit-streams are not chased.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .grouping import lengths_to_offsets


def sample_pos_neg_pairs(
    rng: np.random.Generator,
    imp_rev: np.ndarray,
    imp_lens: np.ndarray,
    labels_flat: np.ndarray,
    max_neg_ratio: Optional[float] = None,
    max_pos_ratio: Optional[float] = None,
) -> np.ndarray:
    """Returns [3, total_pairs]: (pos news index, neg news index, impression row id).

    Matches reference output layout (``data_utils.py:382-388``).
    """
    offsets = lengths_to_offsets(imp_lens)
    pos_out: list[np.ndarray] = []
    neg_out: list[np.ndarray] = []
    pair_counts = np.empty(len(imp_lens), dtype=np.int64)
    for i in range(len(imp_lens)):
        seg = slice(offsets[i], offsets[i + 1])
        rev = imp_rev[seg]
        lab = labels_flat[seg]
        pos = rev[lab == 1]
        neg = rev[lab == 0]
        num_pos, num_neg = len(pos), len(neg)
        max_len = max(num_pos, num_neg)
        if max_neg_ratio or max_pos_ratio:
            if max_neg_ratio and (num_neg * max_neg_ratio > num_pos):
                max_len = int(num_pos / max_neg_ratio)
            elif max_pos_ratio and (num_pos * max_pos_ratio > num_neg):
                max_len = int(num_neg / max_pos_ratio)
        def oversample_to(arr: np.ndarray, size: int) -> np.ndarray:
            # Keep every original item, top up with replacement, permute
            # (reference data_utils.py:361-370). If a ratio cap pushed the target
            # below the side's own count, subsample without replacement instead
            # (the reference would crash here; unreachable with sane ratios).
            if size >= len(arr):
                extra = (
                    rng.choice(arr, size=size - len(arr))
                    if size > len(arr)
                    else np.empty(0, dtype=arr.dtype)
                )
                return rng.permutation(np.concatenate([arr, extra]))
            return rng.choice(arr, size=size, replace=False)

        if num_neg >= max_len:
            neg_s = rng.choice(neg, size=max_len, replace=False)
            pos_s = oversample_to(pos, max_len)
        else:
            pos_s = rng.choice(pos, size=max_len, replace=False)
            neg_s = oversample_to(neg, max_len)
        pos_out.append(pos_s)
        neg_out.append(neg_s)
        pair_counts[i] = max_len
    row_ids = np.repeat(np.arange(len(imp_lens), dtype=np.int32), pair_counts)
    return np.stack(
        [
            np.concatenate(pos_out).astype(np.int32),
            np.concatenate(neg_out).astype(np.int32),
            row_ids,
        ]
    )


def sample_pos_neg_infonce(
    rng: np.random.Generator,
    imp_rev: np.ndarray,
    imp_lens: np.ndarray,
    labels_flat: np.ndarray,
    num_neg_per_pos: int = 5,
) -> np.ndarray:
    """Returns [2 + num_neg_per_pos, total_pos] rows:
    (pos index, neg_1..neg_k indices, impression row id), with ``-1`` padding when an
    impression has fewer than ``num_neg_per_pos`` negatives (reference
    ``data_utils.py:294-301,327-334``; note the reference reuses the same padded
    negative list for every positive in that case — preserved here).
    """
    offsets = lengths_to_offsets(imp_lens)
    pos_out: list[np.ndarray] = []
    neg_cols: list[list[np.ndarray]] = [[] for _ in range(num_neg_per_pos)]
    pos_counts = np.empty(len(imp_lens), dtype=np.int64)
    for i in range(len(imp_lens)):
        seg = slice(offsets[i], offsets[i + 1])
        rev = imp_rev[seg]
        lab = labels_flat[seg]
        pos = rev[lab == 1]
        neg = rev[lab == 0]
        num_neg = len(neg)
        if num_neg >= num_neg_per_pos:
            negs = np.stack(
                [
                    rng.choice(neg, size=num_neg_per_pos, replace=False)
                    for _ in range(len(pos))
                ]
            ) if len(pos) else np.empty((0, num_neg_per_pos), dtype=np.int64)
        else:
            padded = np.concatenate(
                [neg, np.full(num_neg_per_pos - num_neg, -1, dtype=neg.dtype)]
            )
            negs = np.tile(padded, (len(pos), 1))
        pos_out.append(pos)
        for j in range(num_neg_per_pos):
            neg_cols[j].append(negs[:, j] if len(pos) else np.empty(0, dtype=np.int64))
        pos_counts[i] = len(pos)
    row_ids = np.repeat(np.arange(len(imp_lens), dtype=np.int32), pos_counts)
    return np.stack(
        [np.concatenate(pos_out).astype(np.int32)]
        + [np.concatenate(c).astype(np.int32) for c in neg_cols]
        + [row_ids]
    )


def batch_aligned_permutation(
    rng: np.random.Generator, total: int, batch_size: int
) -> np.ndarray:
    """Permute whole batch-size blocks, keeping the ragged tail block last.

    Reference epoch reshuffle (``data_utils.py:634-645``): items are pre-chunked
    into batch-size blocks; full blocks are permuted; the final (possibly ragged)
    block stays last so every batch except the last is exactly ``batch_size``.
    """
    num_batches = -(total // -batch_size)
    if num_batches <= 1:
        return np.arange(total, dtype=np.int64)
    block_order = np.concatenate(
        [rng.permutation(num_batches - 1), [num_batches - 1]]
    )
    index = np.concatenate(
        [np.arange(b * batch_size, (b + 1) * batch_size) for b in block_order]
    )
    return index[index < total]
