"""Hash-based tokenizer for the on-device embedder.

The reference delegates all text -> vector work to an external Ollama server
(embedding.go:50-104) and ships no tokenizer.  For the on-chip embedding path
we need a dependency-free, deterministic tokenizer that works with zero
downloaded assets: lowercased word+punctuation split, each token hashed into
a fixed vocab (feature-hashing).  When a real pretrained checkpoint+vocab is
available the embedder can swap in a transformers tokenizer instead.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")

PAD_ID = 0
CLS_ID = 1
_RESERVED = 2


class HashingTokenizer:
    def __init__(self, vocab_size: int = 30522, max_len: int = 128):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def _hash(self, token: str) -> int:
        h = hashlib.blake2s(token.encode(), digest_size=8).digest()
        return _RESERVED + int.from_bytes(h, "little") % (self.vocab_size -
                                                          _RESERVED)

    def encode(self, text: str) -> list[int]:
        tokens = _TOKEN_RE.findall(text.lower())
        ids = [CLS_ID] + [self._hash(t) for t in tokens]
        return ids[: self.max_len]

    def batch_encode(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """-> (ids (B, L) int32, mask (B, L) f32), padded to max_len."""
        batch = [self.encode(t) for t in texts]
        ids = np.full((len(batch), self.max_len), PAD_ID, dtype=np.int32)
        mask = np.zeros((len(batch), self.max_len), dtype=np.float32)
        for i, seq in enumerate(batch):
            ids[i, : len(seq)] = seq
            mask[i, : len(seq)] = 1.0
        return ids, mask
