"""The behaviors compiler: MIND history/impression strings -> flat index arrays.

Capability parity with the reference's ``split_impressions_and_history``
(``/root/reference/src/news_rec_utils/data_utils.py:168-232``) and
``split_impressions`` (``data_utils.py:235-272``), which walk every click in an
interpreted Python loop. Here the whole compile is vectorized (pandas factorize +
numpy), producing identical arrays:

- ``news_ids``: unique news ids in first-appearance order, scanning each row's
  history tokens then its impression tokens (matches the reference's single
  ``position_dict`` threaded through both, ``data_utils.py:174-210``).
- ``imp_rev`` / ``imp_row``: flat reverse-index into ``news_ids`` and owning row id
  for every impression slot (reference ``impression_rev_ind_array``).
- ``hist_rev`` / ``hist_row``: same for history slots. NOTE reference semantics:
  rows without history contribute no entry to ``history_len_list``, so history row
  ids index the *with-history subset* in original order (``data_utils.py:185-192``);
  ``hist_row_index`` maps that subset back to original row indices.
- ``labels_flat``: 0/1 click labels parsed from ``N1234-1`` tokens, aligned with
  ``imp_rev`` (reference ``data_utils.py:194-200``).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Optional

import numpy as np
import pandas as pd


@dataclasses.dataclass
class CompiledBehaviors:
    news_ids: np.ndarray  # [num_unique_news] str, first-appearance order
    imp_rev: np.ndarray  # [total_imp_slots] int32 index into news_ids
    imp_row: np.ndarray  # [total_imp_slots] int32 owning behaviors-row id
    imp_lens: np.ndarray  # [num_rows] int32
    hist_rev: np.ndarray  # [total_hist_slots] int32 index into news_ids
    hist_row: np.ndarray  # [total_hist_slots] int32 owning with-history-row id
    hist_lens: np.ndarray  # [num_hist_rows] int32
    hist_row_index: np.ndarray  # [num_hist_rows] int32 original row ids with history
    labels_flat: Optional[np.ndarray]  # [total_imp_slots] int8, None if no labels
    label_present: bool

    @property
    def num_rows(self) -> int:
        return len(self.imp_lens)

    @property
    def num_news(self) -> int:
        return len(self.news_ids)

    @property
    def has_history(self) -> np.ndarray:
        """Boolean mask over all rows: does this row have click history?"""
        mask = np.zeros(self.num_rows, dtype=bool)
        mask[self.hist_row_index] = True
        return mask

    def with_history_view(self) -> "CompiledBehaviors":
        """Restrict to rows that have click history, renumbering rows to the
        subset. This is the row space every attention trainer works in
        (reference filters with ``history_bool.repeat(imp_len_list)``,
        ``components.py:444-447``, and asserts row-count consistency,
        ``trainer.py:527-532``)."""
        keep = self.hist_row_index
        has = self.has_history
        slot_mask = np.repeat(has, self.imp_lens)
        return CompiledBehaviors(
            news_ids=self.news_ids,
            imp_rev=self.imp_rev[slot_mask],
            imp_row=np.repeat(
                np.arange(len(keep), dtype=np.int32), self.imp_lens[keep]
            ),
            imp_lens=self.imp_lens[keep],
            hist_rev=self.hist_rev,
            hist_row=self.hist_row,
            hist_lens=self.hist_lens,
            hist_row_index=np.arange(len(keep), dtype=np.int32),
            labels_flat=(
                self.labels_flat[slot_mask] if self.labels_flat is not None else None
            ),
            label_present=self.label_present,
        )

    def grouped_labels(self) -> np.ndarray:
        """Per-impression label tuples (object array), as the metric suite consumes
        (reference ``evaluation.py:34-38`` over ``labels`` built at
        ``data_utils.py:231``)."""
        assert self.labels_flat is not None, "Labels not present"
        offsets = np.concatenate([[0], np.cumsum(self.imp_lens)])
        return np.array(
            [
                tuple(self.labels_flat[offsets[i] : offsets[i + 1]].tolist())
                for i in range(self.num_rows)
            ],
            dtype=object,
        )


def _from_native(result) -> CompiledBehaviors:
    (
        news,
        imp_rev,
        imp_row,
        imp_lens,
        hist_rev,
        hist_row,
        hist_lens,
        hist_row_index,
        labels,
        label_present,
    ) = result
    i32 = lambda b: np.frombuffer(b, dtype=np.int32)  # noqa: E731
    return CompiledBehaviors(
        news_ids=np.asarray(news),
        imp_rev=i32(imp_rev),
        imp_row=i32(imp_row),
        imp_lens=i32(imp_lens),
        hist_rev=i32(hist_rev),
        hist_row=i32(hist_row),
        hist_lens=i32(hist_lens),
        hist_row_index=i32(hist_row_index),
        labels_flat=np.frombuffer(labels, dtype=np.int8) if labels is not None else None,
        label_present=bool(label_present),
    )


def _is_missing(value) -> bool:
    if value is None:
        return True
    if isinstance(value, float) and np.isnan(value):
        return True
    if isinstance(value, str) and value.strip() == "":
        return True
    return False


def compile_behaviors(
    impressions: Sequence[str],
    history: Sequence[Optional[str]],
    use_native: bool = True,
) -> CompiledBehaviors:
    """Compile behavior strings into flat index arrays.

    ``impressions[i]`` is a space-separated list of ``NewsID`` or ``NewsID-{0,1}``
    tokens; ``history[i]`` is a space-separated ``NewsID`` list or missing.

    Uses the C++ extension (``native/behaviors_compiler.cpp``) when it builds
    and loads, falling back to the vectorized pandas path — both produce
    identical arrays (cross-checked in tests).
    """
    n = len(impressions)
    assert n > 0, "No impressions given"
    assert len(history) == n, "history and impressions must have equal row counts"

    if use_native:
        from .. import native

        mod = native.load()
        if mod is not None:
            try:
                return _from_native(
                    mod.compile_behaviors(list(impressions), list(history))
                )
            except TypeError:
                # Fall back for exotic input TYPES only. ValueError (malformed
                # labeled tokens) must propagate — the Python path validates
                # identically, so swallowing it here would change nothing but
                # waste a second pass.
                pass

    label_present = "-" in impressions[0]

    hist_tokens: list[list[str]] = []
    hist_row_index: list[int] = []
    for i, h in enumerate(history):
        if not _is_missing(h):
            hist_tokens.append(h.split())
            hist_row_index.append(i)
    imp_tokens = [row.split() for row in impressions]

    hist_lens = np.array([len(t) for t in hist_tokens], dtype=np.int32)
    imp_lens = np.array([len(t) for t in imp_tokens], dtype=np.int32)

    labels_flat: Optional[np.ndarray] = None
    if label_present:
        flat_imp = np.array(
            [tok for row in imp_tokens for tok in row], dtype=np.str_
        )
        # "N1234-1" -> ("N1234", "-", "1"); rpartition handles ids containing "-".
        parts = np.char.rpartition(flat_imp, "-")
        bad = (parts[:, 1] != "-") | ~np.isin(parts[:, 2], ("0", "1"))
        if bad.any():
            # Same strictness as the native path: a labeled token must end in
            # -0 or -1 (reference parses token[-1] as the label, so anything
            # else silently corrupts labels there — here it is an error).
            flat_row = np.repeat(np.arange(len(imp_tokens)), imp_lens)
            raise ValueError(
                f"malformed labeled token in row {int(flat_row[np.flatnonzero(bad)[0]])}"
            )
        imp_news_flat = parts[:, 0]
        labels_flat = parts[:, 2].astype(np.int8)
    else:
        imp_news_flat = np.array(
            [tok for row in imp_tokens for tok in row], dtype=np.str_
        )

    hist_news_flat = np.array(
        [tok for row in hist_tokens for tok in row], dtype=np.str_
    )

    # First-appearance id assignment must interleave per row (history tokens first,
    # then impression tokens — reference data_utils.py:181-210). Build the full token
    # stream in that order, factorize once, then split the codes back out.
    hist_by_row: dict[int, tuple[int, int]] = {}
    hist_offsets = np.concatenate([[0], np.cumsum(hist_lens)]).astype(np.int64)
    for k, row_id in enumerate(hist_row_index):
        hist_by_row[row_id] = (int(hist_offsets[k]), int(hist_offsets[k + 1]))
    imp_offsets = np.concatenate([[0], np.cumsum(imp_lens)]).astype(np.int64)

    total = len(hist_news_flat) + len(imp_news_flat)
    stream = np.empty(total, dtype=imp_news_flat.dtype)
    is_hist = np.zeros(total, dtype=bool)
    pos = 0
    for i in range(n):
        if i in hist_by_row:
            a, b = hist_by_row[i]
            stream[pos : pos + (b - a)] = hist_news_flat[a:b]
            is_hist[pos : pos + (b - a)] = True
            pos += b - a
        a, b = int(imp_offsets[i]), int(imp_offsets[i + 1])
        stream[pos : pos + (b - a)] = imp_news_flat[a:b]
        pos += b - a
    assert pos == total

    codes, uniques = pd.factorize(stream)
    codes = codes.astype(np.int32)

    hist_rev = codes[is_hist]
    imp_rev = codes[~is_hist]

    imp_row = np.repeat(
        np.arange(n, dtype=np.int32), imp_lens
    )
    hist_row = np.repeat(
        np.arange(len(hist_lens), dtype=np.int32), hist_lens
    )

    return CompiledBehaviors(
        news_ids=np.asarray(uniques),
        imp_rev=imp_rev,
        imp_row=imp_row,
        imp_lens=imp_lens,
        hist_rev=hist_rev,
        hist_row=hist_row,
        hist_lens=hist_lens,
        hist_row_index=np.array(hist_row_index, dtype=np.int32),
        labels_flat=labels_flat,
        label_present=label_present,
    )
