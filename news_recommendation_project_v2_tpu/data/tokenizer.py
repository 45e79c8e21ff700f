"""Real text tokenization for the news encoder.

Capability parity with the reference's HF tokenizer path: it loads
``AutoTokenizer.from_pretrained`` (``/root/reference/src/news_rec_utils/
modeling_utils.py:92-103``) and tokenizes eval batches with
``padding=True, truncation=True, max_length=NEWS_TEXT_MAXLEN``
(``data_utils.py:471-482``).

This module wraps the ``tokenizers`` Rust engine directly — the exact engine
inside every HF "fast" tokenizer — so a checkpoint's ``tokenizer.json`` (the
XLM-R sentencepiece-unigram vocabulary, for e5) produces byte-identical token
ids to the reference pipeline, without pulling the ``transformers`` runtime
into the serving path. TPU-first difference: output is padded to a caller-fixed
static length (XLA shape bucketing) instead of the reference's pad-to-batch-max.

``HashTokenizer`` (models/news_encoder.py) remains ONLY as the explicit
offline/test fallback for environments without tokenizer files.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

# Candidate weight-independent tokenizer files inside an HF checkpoint dir.
TOKENIZER_JSON = "tokenizer.json"


class HFTokenizer:
    """Static-shape tokenization over a ``tokenizers.Tokenizer``.

    ``__call__`` returns ``(ids [B, T] int32, mask [B, T] int32)`` where the
    real-token region matches ``transformers.PreTrainedTokenizerFast`` with
    ``truncation=True, max_length=T`` on the same ``tokenizer.json``
    (cross-checked in tests/test_tokenizer.py), and the tail is ``pad_id``.
    """

    def __init__(self, tokenizer, max_length: int = 512, pad_id: Optional[int] = None):
        self._tok = tokenizer
        self.max_length = max_length
        if pad_id is None:
            for cand in ("<pad>", "[PAD]", "<|endoftext|>"):
                t = tokenizer.token_to_id(cand)
                if t is not None:
                    pad_id = t
                    break
        # XLM-R convention (<s>=0 <pad>=1 </s>=2) as the last resort.
        self.pad_id = 1 if pad_id is None else int(pad_id)
        self.vocab_size = int(tokenizer.get_vocab_size())

    @classmethod
    def from_file(cls, path: Path, max_length: int = 512, pad_id: Optional[int] = None):
        from tokenizers import Tokenizer

        return cls(Tokenizer.from_file(str(path)), max_length, pad_id)

    @classmethod
    def from_dir(cls, path: Path, max_length: int = 512, pad_id: Optional[int] = None):
        """Load from an HF checkpoint directory (``tokenizer.json``)."""
        f = Path(path) / TOKENIZER_JSON
        if not f.exists():
            raise FileNotFoundError(
                f"{f} not found: the checkpoint has no fast-tokenizer file. "
                "Export one with tokenizer.save_pretrained(...) (any HF fast "
                "tokenizer writes tokenizer.json)."
            )
        return cls.from_file(f, max_length, pad_id)

    def __call__(
        self, texts: Sequence[str], max_length: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        T = max_length or self.max_length
        # Truncation settings are stateful on the Rust side; pin them per call
        # so callers can vary max_length safely.
        self._tok.enable_truncation(max_length=T)
        self._tok.no_padding()
        encodings = self._tok.encode_batch(list(texts))
        ids = np.full((len(texts), T), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(texts), T), dtype=np.int32)
        for i, enc in enumerate(encodings):
            n = len(enc.ids)
            ids[i, :n] = enc.ids
            mask[i, :n] = 1
        return ids, mask


def has_tokenizer_file(path: Path) -> bool:
    return (Path(path) / TOKENIZER_JSON).exists()
