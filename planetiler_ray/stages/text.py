"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting (training-data ops; reference scalar-function
analogues: ``util/Parse.java``, ``util/LanguageUtils.java:18-118``).

All vectorized ``map_batches`` bodies over documents-shaped batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# frozen grammar shared with the DuckDB oracle (regexp_extract_all twin)
BPE_TOKEN_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"
STOPWORDS = ("the", "a", "and", "of", "to", "in")


def text_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """doc_id, n_chars_txt, n_ws_tokens (whitespace), n_bpe_tokens (regex),
    n_stopwords, n_punct — all exact-int, oracle-checkable."""
    t = batch.column(col).to_pandas()
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_ws = t.str.split().map(len).to_numpy(dtype=np.int64)
    bpe = t.str.findall(BPE_TOKEN_RE)
    n_bpe = bpe.map(len).to_numpy(dtype=np.int64)
    words = t.str.lower().str.findall(r"[a-z0-9]+")
    stop = set(STOPWORDS)
    n_stop = words.map(lambda ws: sum(1 for w in ws if w in stop)).to_numpy(dtype=np.int64)
    n_punct = t.str.count(r"[^a-zA-Z0-9\s]").to_numpy(dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_txt": pa.array(n_chars, pa.int64()),
            "n_ws_tokens": pa.array(n_ws, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
        }
    )


def quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Heuristic quality in integer basis points (0..10000): rewards medium
    length, spaces, low punctuation — deterministic integer arithmetic."""
    s = text_stats(batch, col)
    n_chars = s.column("n_chars_txt").to_numpy()
    n_ws = s.column("n_ws_tokens").to_numpy()
    n_punct = s.column("n_punct").to_numpy()
    len_score = np.clip(n_chars, 0, 2000) * 10000 // 2000
    punct_pen = np.minimum(n_punct * 10000 // np.maximum(n_chars, 1), 5000)
    tok_score = np.clip(n_ws, 0, 200) * 10000 // 200
    q = (len_score + tok_score) // 2 - punct_pen
    return s.append_column("quality_bp", pa.array(np.clip(q, 0, 10000), pa.int64()))


_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "und", "die"),
    "es": ("el", "los", "y"),
    "zh": (),
}


def langid_ngram(batch: pa.Table, col: str = "text") -> pa.Table:
    """Character-bigram profile language guesser (n-gram heuristic; the
    synthetic corpus is English-ish so this mostly demonstrates the op).
    Adds lang_guess + lang_conf_bp."""
    t = batch.column(col).to_pandas().str.lower()
    words = t.str.findall(r"[a-z]+")
    guesses, confs = [], []
    for ws in words:
        s = set(ws)
        scores = {
            lang: sum(1 for m in marks if m in s) for lang, marks in _LANG_MARKERS.items()
        }
        best = max(scores, key=lambda k: (scores[k], k != "zh"))
        total = sum(scores.values())
        guesses.append(best if total else "und")
        confs.append(int(scores[best] * 10000 / total) if total else 0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_guess": pa.array(guesses, pa.string()),
            "lang_conf_bp": pa.array(np.array(confs, dtype=np.int64), pa.int64()),
        }
    )


def fingerprint(batch: pa.Table, col: str = "text") -> pa.Table:
    """Two fingerprints per doc:
    * fp_md5: first 16 hex chars of md5(lower(text)) — oracle-checkable.
    * fp_winnow: min rolling-hash (winnowing-style k-gram char hash) as int64.
    """
    t = batch.column(col).to_pandas()
    low = t.str.lower()
    fp_md5 = [hashlib.md5(s.encode("utf-8")).hexdigest()[:16] for s in low]
    k = 8
    fps = np.empty(len(low), dtype=np.int64)
    for i, s in enumerate(low):
        b = s.encode("utf-8")
        if len(b) < k:
            h = 14695981039346656037
            for c in b:
                h = ((h ^ c) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            fps[i] = np.int64(np.uint64(h))
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(257) + arr[j : len(arr) - k + 1 + j]
        fps[i] = np.int64(h.min().astype(np.int64))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_md5": pa.array(fp_md5, pa.string()),
            "fp_winnow": pa.array(fps, pa.int64()),
        }
    )
