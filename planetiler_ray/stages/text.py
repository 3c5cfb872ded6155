"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting (training-data ops; reference scalar-function
analogues: ``util/Parse.java``, ``util/LanguageUtils.java:18-118``).

All vectorized ``map_batches`` bodies over documents-shaped batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# frozen grammar shared with the DuckDB oracle (regexp_extract_all twin)
BPE_TOKEN_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"
STOPWORDS = ("the", "a", "and", "of", "to", "in")


def text_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """doc_id, n_chars_txt, n_ws_tokens (whitespace), n_bpe_tokens (regex),
    n_punct via RE2 match-count kernels over the Arrow string buffer (the
    oracle's regexp_extract_all uses the same RE2, so counts agree by
    construction; the grammar's alternatives are disjoint, so leftmost-first
    vs leftmost-longest cannot differ); n_stopwords via the shared flat
    tokenizer + is_in + one cumsum-difference per doc.  No per-row Python
    (this stage runs over the full corpus)."""
    import pyarrow.compute as pc

    from .dedup import _flat_tokens

    s = batch.column(col)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n_chars = pc.cast(pc.utf8_length(s), pa.int64())
    n_ws = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int64())
    n_bpe = pc.cast(pc.count_substring_regex(s, BPE_TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(s, r"[^a-zA-Z0-9\s]"), pa.int64())
    flat, lens = _flat_tokens(s)
    hit = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    c = np.concatenate([[0], np.cumsum(hit)])
    b = np.concatenate([[0], np.cumsum(lens)])
    n_stop = c[b[1:]] - c[b[:-1]]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_txt": n_chars,
            "n_ws_tokens": n_ws,
            "n_bpe_tokens": n_bpe,
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "n_punct": n_punct,
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


_MARKER_LANG = {m: lang for lang, marks in _LANG_MARKERS.items() for m in marks}
_LANGS = [l for l in _LANG_MARKERS if _LANG_MARKERS[l]]  # tie order: en,fr,de,es


_MARKER_WORDS = list(_MARKER_LANG)
_MARKER_LANG_IDX = np.array(
    [_LANGS.index(_MARKER_LANG[w]) for w in _MARKER_WORDS], np.int64)


def langid_ngram(batch: pa.Table, col: str = "text") -> pa.Table:
    """Marker-word language guesser (n-gram heuristic; the synthetic corpus
    is English-ish so this mostly demonstrates the op).
    Adds lang_guess + lang_conf_bp.

    Arrow-native (round 5): lower + split + flatten in C, marker matching
    via ``pc.index_in`` against the ~12-word table, DISTINCT (row, marker)
    pairs via one ``np.unique`` over packed int64 keys — no pandas frame,
    no per-document Python."""
    import pyarrow.compute as pc

    n = batch.num_rows
    low = batch.column(col)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(low), "[^a-z]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offs = parts.offsets.to_numpy()
    row = np.repeat(np.arange(n, dtype=np.int64), offs[1:] - offs[:-1])
    midx = pc.index_in(flat, value_set=pa.array(_MARKER_WORDS)).fill_null(
        -1).to_numpy(zero_copy_only=False).astype(np.int64)
    hit = midx >= 0
    m = len(_MARKER_WORDS)
    upair = np.unique(row[hit] * m + midx[hit])  # distinct (row, marker)
    score = np.zeros((n, len(_LANGS)), np.int64)
    if len(upair):
        np.add.at(score, (upair // m, _MARKER_LANG_IDX[upair % m]), 1)
    best_idx = np.argmax(score, axis=1)  # tie -> first col (en,fr,de,es)
    best = score[np.arange(n), best_idx]
    total = score.sum(axis=1)
    langs_arr = np.array(_LANGS)
    guesses = np.where(total > 0, langs_arr[best_idx], "und")
    with np.errstate(divide="ignore", invalid="ignore"):
        confs = np.where(total > 0, best * 10000 // np.maximum(total, 1), 0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_guess": pa.array(guesses.tolist(), pa.string()),
            "lang_conf_bp": pa.array(confs.astype(np.int64), pa.int64()),
        }
    )


def fingerprint(batch: pa.Table, col: str = "text") -> pa.Table:
    """Two fingerprints per doc:
    * fp_md5: first 16 hex chars of md5(lower(text)) — oracle-checkable.
    * fp_winnow: min rolling-hash (winnowing-style k-gram char hash) as int64.
    """
    import pyarrow.compute as pc

    from ..functions.vhash import fnv64_arrow
    from ..functions.vmd5 import md5_hex_arrow

    low = pc.utf8_lower(batch.column(col))
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    fp_md5 = md5_hex_arrow(low, prefix=16)
    # winnow fingerprint, vectorized over the FLAT lowercase buffer:
    # one k-pass rolling polynomial hash over all bytes of the batch at
    # once, cross-document windows masked out, per-doc min via reduceat.
    k = 8
    n = len(low)
    bufs = low.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[low.offset : low.offset + n + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    fps = np.empty(n, dtype=np.uint64)
    N = len(data)
    long_mask = lens >= k
    if N >= k and long_mask.any():
        roll = np.zeros(N - k + 1, dtype=np.uint64)
        for j in range(k):
            roll = roll * np.uint64(257) + data[j : N - k + 1 + j]
        # mask positions whose k-window crosses a doc boundary
        valid = np.zeros(N - k + 2, dtype=np.int64)
        ls, ll = starts[long_mask], lens[long_mask]
        np.add.at(valid, ls, 1)
        np.add.at(valid, ls + ll - k + 1, -1)
        roll[np.cumsum(valid[:-1]) == 0] = np.uint64(0xFFFFFFFFFFFFFFFF)
        segs = np.minimum(ls, N - k)  # reduceat index bound
        mins = np.minimum.reduceat(roll, segs)
        fps[long_mask] = mins
    # short docs (< k bytes): FNV-1a over the whole doc, exactly the
    # scalar fallback of the round-1 implementation
    if (~long_mask).any():
        short = low.filter(pa.array(~long_mask))
        fps[~long_mask] = fnv64_arrow(short)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_md5": fp_md5,
            "fp_winnow": pa.array(fps.astype(np.int64), pa.int64()),
        }
    )


def doc_repetition(batch: pa.Table, k: int = 3, col: str = "text") -> pa.Table:
    """Within-document repetition: duplicate k-word-shingle fraction.

    The classic "repetitive boilerplate" quality signal for web corpora
    (n_shingles, n_distinct, rep_bp = duplicated fraction in basis points
    — all exact integers).  Per-document metric -> embarrassingly parallel
    ``map_batches``, no shuffle; reuses the vectorized shingle kernel of
    the dedup suite (``dedup._shingle_flat``: k-windows over FNV word
    hashes, short docs contribute one all-words shingle).  Distinctness is
    over 64-bit shingle hashes (collision odds ~n^2/2^65 per doc —
    negligible at any batch size).
    """
    from .dedup import _shingle_flat

    sh, starts = _shingle_flat(batch.column(col), k)
    n_sh = np.diff(starts).astype(np.int64)
    if len(sh):
        doc_idx = np.repeat(np.arange(len(n_sh)), n_sh)
        order = np.lexsort((sh, doc_idx))
        s, d = sh[order], doc_idx[order]
        new = np.ones(len(s), dtype=bool)
        new[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        n_distinct = np.bincount(d[new], minlength=len(n_sh)).astype(np.int64)
    else:
        n_distinct = np.zeros(len(n_sh), np.int64)
    rep_bp = (n_sh - n_distinct) * 10000 // np.maximum(n_sh, 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "rep_bp": pa.array(rep_bp, pa.int64()),
        }
    )


def doc_term_freq(batch: pa.Table, col: str = "text") -> pa.Table:
    """Explode documents into (doc_id, term, tf) rows — tokenizer shared
    with the dedup suite (runs of [a-z0-9] on lowercased text); the
    per-(doc, term) count runs in Arrow's C hash aggregator."""
    from .dedup import _flat_tokens

    flat, lens = _flat_tokens(batch.column(col))
    doc_ids = batch.column("doc_id").to_numpy()
    doc_rep = np.repeat(doc_ids, lens)
    tbl = pa.table({"doc_id": pa.array(doc_rep, pa.int64()), "term": flat})
    return tbl.group_by(["doc_id", "term"]).aggregate([([], "count_all")]).rename_columns(
        ["doc_id", "term", "tf"]
    )


class TfIdfTopK:
    """Per-document top-k keyword extraction by tf-idf (actor-pool stage).

    ``df_handle`` is a ``ray.put`` broadcast of the document-frequency
    table (term -> df) built by one partial-aggregated pass; each actor
    deserializes it ONCE in ``__init__`` (the broadcast-small-side
    pattern — vocabulary is bounded by the language, not the corpus, so
    it stays a per-node constant even at 100 TB).  Scoring + per-doc
    top-k selection is one lexsort per batch; score = tf * ln(N / df)
    with the identical float expression in the DuckDB oracle
    (``oracle.sql_tfidf_topk``), ties broken (score desc, term asc) —
    exact because equal scores imply equal (tf, df).
    """

    def __init__(self, df_handle, n_docs: int, k: int = 3):
        import ray

        df_tbl = ray.get(df_handle)
        self._df = pd.Series(
            df_tbl["df"].to_numpy(), index=pd.Index(df_tbl["term"].to_pylist())
        )
        self._n = float(n_docs)
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        tf_tbl = doc_term_freq(batch)
        if tf_tbl.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        terms = tf_tbl.column("term").to_pandas()
        tf = tf_tbl.column("tf").to_numpy().astype(np.int64)
        doc = tf_tbl.column("doc_id").to_numpy()
        df = terms.map(self._df).to_numpy(dtype=np.float64)
        score = tf.astype(np.float64) * np.log(self._n / df)
        order = np.lexsort((terms.to_numpy(), -score, doc))
        d_sorted = doc[order]
        run_start = np.ones(len(d_sorted), dtype=bool)
        run_start[1:] = d_sorted[1:] != d_sorted[:-1]
        rank = np.arange(len(d_sorted)) - np.maximum.accumulate(
            np.where(run_start, np.arange(len(d_sorted)), 0)
        )
        keep = order[rank < self._k]
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], pa.int64()),
                "term": pa.array(terms.iloc[keep].tolist(), pa.string()),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(df[keep].astype(np.int64), pa.int64()),
            }
        )


def bpe_pair_counts(ds, k: int = 20, col: str = "text"):
    """Corpus-wide adjacent byte-pair frequencies — the counting step of a
    BPE tokenizer-training merge round, distributed.

    Vectorized: each batch reads the Arrow string VALUES BUFFER directly
    (one uint8 view per batch), forms pair codes a*256+b with a boundary
    mask (no pair spans two documents), and reduces to <=65536
    (pair_code, count) partial rows via ``np.bincount`` — so the shuffle
    moves a bounded-domain histogram, never corpus bytes; the final
    groupby-sum + top-k is O(domain).  ASCII corpus: byte == char, so the
    DuckDB twin counts 2-char substrings and orders identically."""

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], off_dt)[
            arr.offset: arr.offset + len(arr) + 1
        ].astype(np.int64)
        buf = np.frombuffer(arr.buffers()[2], np.uint8)[offs[0]:offs[-1]]
        offs = offs - offs[0]
        L = len(buf)
        if L < 2:
            return pa.table({"pair_code": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        codes = buf[:-1].astype(np.int64) * 256 + buf[1:]
        mask = np.ones(L - 1, dtype=bool)
        ends = offs[1:]
        cut = ends[(ends >= 1) & (ends <= L - 1)] - 1
        mask[cut] = False  # no pair across a document boundary
        cnt = np.bincount(codes[mask], minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"pair_code": pa.array(nz, pa.int64()),
             "n_part": pa.array(cnt[nz], pa.int64())}
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair_code")
        .aggregate(Sum("n_part", alias_name="n"))
        .sort(["n", "pair_code"], descending=[True, False])
        .limit(k)
    )

    def decode(batch: pa.Table) -> pa.Table:
        code = batch.column("pair_code").to_numpy()
        pair = [chr(c >> 8) + chr(c & 255) for c in code]  # k rows only
        return pa.table(
            {"pair": pa.array(pair, pa.string()), "n": batch.column("n")}
        )

    return merged.map_batches(decode, batch_format="pyarrow")


def keyword_topk(ds, terms=("spark", "join", "vector"), k: int = 10,
                 col: str = "text"):
    """Keyword search: top-k documents by summed query-term frequency —
    the integer-exact core of an inverted-index retrieval stage (BM25
    minus the float idf/length normalization, which would break bitwise
    oracle parity).

    Scale: the query-term set is a constant broadcast; each batch counts
    matches with one Arrow ``is_in`` over the flat token array + one
    ``bincount`` (no per-doc Python), keeps its own top-k partial, and
    only n_blocks x k candidate rows reach the final sort+limit."""
    import pyarrow.compute as pc

    from .dedup import _flat_tokens

    term_set = pa.array(list(terms), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        doc_idx = np.repeat(np.arange(batch.num_rows), lens)
        hit = pc.is_in(flat, value_set=term_set).to_numpy(zero_copy_only=False)
        score = np.bincount(doc_idx[hit],
                            minlength=batch.num_rows).astype(np.int64)
        ids = batch.column("doc_id").to_numpy()
        pos = np.flatnonzero(score > 0)
        score, ids = score[pos], ids[pos]
        n = len(ids)
        if n > k:
            thresh = np.partition(score, n - k)[n - k]
            cand = np.flatnonzero(score >= thresh)
            keep = cand[np.lexsort((ids[cand], -score[cand]))][:k]
        else:
            keep = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "score": pa.array(score[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


# RE2 syntax shared verbatim with the DuckDB oracle (both engines compile
# these with RE2, so match semantics are identical by construction)
EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PHONE_RE = r"\d{3}-\d{4}"


def pii_scrub(batch: pa.Table, col: str = "text") -> pa.Table:
    """Redact email/phone PII (training-data curation op, e.g. the
    RefinedWeb/Dolma scrub stage).  Fully vectorized: two RE2 passes over
    the Arrow string buffer (`pc.replace_substring_regex`), no Python rows.

    Emails are counted/replaced on the raw text, phones on the
    email-scrubbed text (ordering mirrored in ``oracle.sql_pii_scrub``).
    Output: doc_id, n_emails, n_phones, clean_text.
    """
    import pyarrow.compute as pc

    s = batch.column(col)
    n_email = pc.count_substring_regex(s, EMAIL_RE)
    clean = pc.replace_substring_regex(s, EMAIL_RE, "<EMAIL>")
    n_phone = pc.count_substring_regex(clean, PHONE_RE)
    clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_emails": pc.cast(n_email, pa.int64()),
            "n_phones": pc.cast(n_phone, pa.int64()),
            "clean_text": clean,
        }
    )


def pack_sequences(ds, max_tokens: int = 2048, range_size: int = 4096,
                   col: str = "text"):
    """Sequence packing for LLM pretraining: lay documents end-to-end in
    doc_id order and assign each to the fixed-size training sequence that
    holds its first token (seq_id = exclusive-prefix-token-count //
    max_tokens).

    The interesting primitive is the DISTRIBUTED PREFIX SUM: stage 1
    streams per-range token totals (range = doc_id // range_size) into a
    small groupby, the driver builds the exclusive range-offset table
    (corpus/range_size entries — tiny) and broadcasts it; stage 2 shuffles
    docs ONCE by range (bounded groups of <= range_size docs) and computes
    the in-range prefix with one argsort + cumsum plus the broadcast
    offset.  No global sort, no ordered single-scan bottleneck.

    Output: doc_id, n_tokens (whitespace tokens), tok_start, seq_id —
    integer-exact, mirrored by a SQL window function.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        nt = pc.count_substring_regex(
            batch.column(col), r"\S+"
        ).to_numpy().astype(np.int64)
        df = (
            pd.DataFrame({"range_id": d // range_size, "t_part": nt})
            .groupby("range_id", as_index=False)["t_part"]
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("range_id")
        .aggregate(Sum("t_part", alias_name="tok"))
        .to_pandas()  # corpus/range_size rows: small by construction
    )
    if "range_id" not in totals.columns:
        totals = pd.DataFrame({"range_id": [], "tok": []})
    totals = totals.sort_values("range_id")
    rids = totals["range_id"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(totals["tok"].to_numpy(dtype=np.int64))[:-1]]) \
        if len(totals) else np.empty(0, np.int64)
    handle = ray.put((rids, offs))

    def mark(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        nt = pc.count_substring_regex(
            batch.column(col), r"\S+"
        ).to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "range_id": pa.array(d // range_size, pa.int64()),
            }
        )

    def assign(g: pa.Table) -> pa.Table:
        rids_s, offs_s = ray.get(handle)
        d = g.column("doc_id").to_numpy()
        nt = g.column("n_tokens").to_numpy()
        rid = g.column("range_id").to_numpy()
        order = np.argsort(d, kind="stable")
        tok_start = np.empty(len(d), dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(nt[order])[:-1]])
        base = offs_s[np.searchsorted(rids_s, rid[order])]
        tok_start[order] = base + csum
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "tok_start": pa.array(tok_start, pa.int64()),
                "seq_id": pa.array(tok_start // max_tokens, pa.int64()),
            }
        )

    return (
        ds.map_batches(mark, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(
            lambda g: assign(g), batch_format="pyarrow"
        )
    )


def vocab_topk(ds, k: int = 50, col: str = "text"):
    """Corpus-wide vocabulary heavy hitters: top-k tokens by total count
    (ties broken token-ascending, so the answer is deterministic).

    Scale shape: per-batch token counts via Arrow group_by (volume =
    distinct tokens per batch, not tokens) -> ONE groupby-sum over the
    vocabulary -> per-block partial top-k (argpartition, ties kept) ->
    tiny exact sort + limit.  Never a global sort of the token stream.
    """
    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column(col))
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table(
            {"token": g.column("token"), "c_part": g.column("token_count")}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="n"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        if len(n) > k:
            tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
            thresh = np.partition(n, len(n) - k)[len(n) - k]
            cand = np.flatnonzero(n >= thresh)
            order = cand[np.lexsort((tok[cand], -n[cand]))][:k]
            return batch.take(pa.array(order, pa.int64()))
        return batch

    return (
        counts.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def vocab_coverage(ds, ks=(1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024),
                   col: str = "text"):
    """Tokenizer-design coverage curve: what fraction of all corpus tokens
    the top-k vocabulary covers, at k in ``ks`` — integers only (covered,
    total), the ratio is a consumer one-liner.

    Scale shape: per-batch token counts + a SENTINEL row ('' -> batch token
    total, impossible as a real token under the [a-z0-9]+ grammar) so the
    corpus total rides the SAME vocabulary groupby-sum (one execution, no
    second pass); per-block partial top-max(ks) keeps the sentinel; tiny
    single-block finish does the cumulative curve.
    """
    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens

    kmax = max(ks)

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column(col))
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table({
            "token": pa.array(g.column("token").to_pylist() + [""], pa.string()),
            "c_part": pa.array(
                np.concatenate([g.column("token_count").to_numpy(),
                                [len(flat)]]).astype(np.int64), pa.int64()),
        })

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="n"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
        n = batch.column("n").to_numpy()
        sent = tok == ""
        real = np.flatnonzero(~sent)
        if len(real) > kmax:
            nr = n[real]
            thresh = np.partition(nr, len(nr) - kmax)[len(nr) - kmax]
            cand = real[nr >= thresh]
            order = cand[np.lexsort((tok[cand], -n[cand]))][:kmax]
            keep = np.concatenate([np.flatnonzero(sent), order])
            return batch.take(pa.array(keep, pa.int64()))
        return batch

    def finish(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
        n = batch.column("n").to_numpy()
        sent = tok == ""
        total = int(n[sent].sum())
        nr, tr = n[~sent], tok[~sent]
        order = np.lexsort((tr, -nr))
        cum = np.cumsum(nr[order])
        out_k, out_cov = [], []
        for k in ks:
            out_k.append(k)
            out_cov.append(int(cum[min(k, len(cum)) - 1]) if len(cum) else 0)
        return pa.table({
            "k": pa.array(out_k, pa.int64()),
            "covered": pa.array(out_cov, pa.int64()),
            "total": pa.array([total] * len(out_k), pa.int64()),
        })

    return (
        counts.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def bigram_stats(ds, min_count: int = 5, col: str = "text"):
    """Collocation counting (the counting core of PMI phrase mining):
    adjacent-token bigrams with corpus counts c12 >= min_count, each
    joined with its unigram counts c1, c2.  Output columns
    (w1, w2, c12, c1, c2) — all integers, so the oracle is exact; PMI
    itself is a one-line float post-process consumers apply (log is
    engine-dependent, counts are not).

    Scale shape: per-batch bigram/unigram partial counts (volume =
    distinct grams per batch), one groupby-sum each; the >= min_count
    survivor set and the vocabulary are both heavy-hitter-sized (bounded
    by corpus_tokens / min_count and corpus vocab), merged driver-side —
    the token stream itself never shuffles row-wise.
    """
    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens

    bi_partial = _bigram_partial(col)

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column(col))
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table({"token": g.column("token"),
                         "c_part": g.column("token_count")})

    bi = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c_part", alias_name="c12"))
    )
    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="c"))
    )
    # survivors and vocabulary are post-aggregation heavy-hitter tables
    bdf = bi.to_pandas()
    bdf = bdf[bdf["c12"] >= min_count]
    udf = uni.to_pandas()
    out = (
        bdf.merge(udf.rename(columns={"token": "w1", "c": "c1"}), on="w1")
        .merge(udf.rename(columns={"token": "w2", "c": "c2"}), on="w2")
        [["w1", "w2", "c12", "c1", "c2"]]
        .reset_index(drop=True)
    )
    import ray.data as rd

    return rd.from_pandas(out)


def rare_postings(ds, df_cap: int = 400, n_buckets: int = 32,
                  col: str = "text"):
    """Inverted-index construction for RARE tokens: token -> (document
    frequency, comma-joined sorted posting list) for tokens with df <=
    ``df_cap`` — the retrieval-index side of the rare-token family.

    Scale shape (the ``rare_bigrams`` discipline): pass 1 aggregates
    distinct (token, doc) pair counts and broadcasts the COMMON token set
    (df > cap — bounded by distinct_pairs/cap, the broadcastable side);
    pass 2 re-streams docs, drops common tokens, and builds postings in
    token-hash BUCKETS (one lexsort per bucket; the per-token string join
    runs over the bounded rare vocabulary, never corpus rows).
    """
    import pyarrow.compute as pc
    import ray

    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens

    def pair_partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        doc = np.repeat(batch.column("doc_id").to_numpy(),
                        np.asarray(lens, np.int64))
        t = pa.table({"token": flat, "doc_id": pa.array(doc, pa.int64())})
        g = t.group_by(["token", "doc_id"]).aggregate([("doc_id", "count")])
        return pa.table({"token": g.column("token"),
                         "doc_id": g.column("doc_id"),
                         "one": pa.array(
                             np.ones(g.num_rows, np.int64), pa.int64())})

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .aggregate(Sum("one", alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
    dfc = (
        pairs.map_batches(
            lambda b: pa.table({"token": b.column("token"),
                                "one": pa.array(np.ones(b.num_rows, np.int64),
                                                pa.int64())}),
            batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("one", alias_name="df"))
    )
    common = dfc.map_batches(
        lambda b: b.filter(pa.array(b.column("df").to_numpy() > df_cap)),
        batch_format="pyarrow",
    ).to_pandas()  # bounded by distinct_pairs / df_cap
    common_set = ray.put(set(common["token"].tolist()))

    class RareFilter:
        def __init__(self, handle):
            from .joins import _resolve

            self.common = _resolve(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tok = batch.column("token")
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            keep = ~np.asarray(
                pc.is_in(tok, value_set=pa.array(sorted(self.common))
                         if self.common else pa.array([], pa.string()))
                .to_numpy(zero_copy_only=False))
            out = batch.filter(pa.array(keep))
            from ..functions.vhash import fnv64_arrow
            tk = out.column("token")
            if isinstance(tk, pa.ChunkedArray):
                tk = tk.combine_chunks()
            hb = (fnv64_arrow(tk) % np.uint64(n_buckets)).astype(np.int64)
            return out.append_column("bkt", pa.array(hb, pa.int64()))

    def build(g: pa.Table) -> pa.Table:
        tok = np.asarray(g.column("token").to_pandas(), dtype=object)
        doc = g.column("doc_id").to_numpy()
        order = np.lexsort((doc, tok))
        tok, doc = tok[order], doc[order]
        first = np.ones(len(tok), bool)
        first[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(tok))
        toks, dfs, posts = [], [], []
        for s0, e0 in zip(starts, ends):  # loop over the RARE vocab only
            toks.append(tok[s0])
            dfs.append(e0 - s0)
            posts.append(",".join(map(str, doc[s0:e0])))
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "df": pa.array(np.array(dfs, np.int64), pa.int64()),
            "postings": pa.array(posts, pa.string()),
        })

    return (
        pairs.map_batches(RareFilter, fn_constructor_args=(common_set,),
                          batch_format="pyarrow", concurrency=(1, 4),
                          num_cpus=0.5)
        .groupby("bkt")
        .map_groups(lambda g: build(g.drop_columns(["bkt"])),
                    batch_format="pyarrow")
    )


def _bigram_partial(col: str):
    """Per-batch adjacent-bigram partial counts (Arrow-native shifted
    pairing + group_by; pairs spanning a document boundary excluded)."""
    from .dedup import _flat_tokens

    def bi_partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        n = len(flat)
        if n < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_part": pa.array([], pa.int64())})
        starts = np.concatenate([[0], np.cumsum(lens)])
        valid = np.ones(n - 1, dtype=bool)
        ends = starts[1:-1]
        valid[ends[(ends > 0) & (ends <= len(valid))] - 1] = False
        sel = pa.array(valid)
        t = pa.table(
            {"w1": flat.slice(0, n - 1).filter(sel),
             "w2": flat.slice(1, n - 1).filter(sel)}
        )
        g = t.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table(
            {"w1": g.column("w1"), "w2": g.column("w2"),
             "c_part": g.column("w1_count")}
        )

    return bi_partial


def next_token(ds, min_count: int = 5, col: str = "text"):
    """Greedy bigram-LM decode table: for every token w1 (with at least one
    bigram at corpus count >= min_count), the most frequent next token —
    ties break lexicographically on w2.  The per-key-argmax shape, done
    WITHOUT a sort shuffle: global bigram counts (distinct-gram volume,
    ONE groupby-sum) -> per-block partial argmax per w1 -> tiny
    single-block merge (<= vocab rows).  row_number() window twin.

    Output: (w1, w2, c12).
    """
    from ray.data.aggregate import Sum

    bi = (
        ds.map_batches(_bigram_partial(col), batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c_part", alias_name="c12"))
    )

    def best(batch: pa.Table, prefilter: bool = False) -> pa.Table:
        w1 = np.asarray(batch.column("w1").to_pandas(), dtype=object)
        w2 = np.asarray(batch.column("w2").to_pandas(), dtype=object)
        c = batch.column("c12").to_numpy()
        if prefilter:
            keep = c >= min_count
            w1, w2, c = w1[keep], w2[keep], c[keep]
        order = np.lexsort((w2, -c, w1))
        w1, w2, c = w1[order], w2[order], c[order]
        first = np.concatenate([[True], w1[1:] != w1[:-1]])
        return pa.table({
            "w1": pa.array(w1[first].tolist(), pa.string()),
            "w2": pa.array(w2[first].tolist(), pa.string()),
            "c12": pa.array(c[first], pa.int64()),
        })

    return (
        bi.map_batches(lambda b: best(b, prefilter=True), batch_format="pyarrow")
        .repartition(1)  # <= one candidate row per w1 per block
        .map_batches(best, batch_format="pyarrow")
    )


def rare_bigram_rate(ds, min_count: int = 5, col: str = "text"):
    """Per-doc count of corpus-RARE adjacent bigrams (c12 < min_count) —
    the integer core of an n-gram LM quality filter (CCNet-style: docs
    whose transitions the corpus has rarely seen are surprisal outliers).
    Output: doc_id, n_bigrams, n_rare.

    Scale shape: pass 1 aggregates bigram counts (distinct-gram volume)
    and keeps the COMMON set (c12 >= min_count) — bounded by
    total_bigrams / min_count, the broadcastable heavy-hitter side (the
    rare set is the unbounded one); pass 2 re-streams docs, membership-
    tests each bigram against the broadcast 128-bit pair-hash set and
    emits per-doc sums.  No row-level shuffle in either pass.  Engine
    equality is on FNV-128 pair hashes vs the oracle's string pairs —
    divergence needs an FNV collision (the dedup suite's accepted class).
    """
    import pyarrow.compute as pc
    import ray

    from ..functions.vhash import fnv128_arrow
    from .dedup import _flat_tokens, _member2

    def _doc_bigrams(batch: pa.Table):
        """(hi, lo, doc_rep) for every in-doc adjacent pair of the batch."""
        flat, lens = _flat_tokens(batch.column(col))
        n = len(flat)
        doc = batch.column("doc_id").to_numpy()
        if n < 2:
            z = np.empty(0, np.uint64)
            return z, z, np.empty(0, np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)])
        valid = np.ones(n - 1, dtype=bool)
        ends = starts[1:-1]
        valid[ends[(ends > 0) & (ends <= len(valid))] - 1] = False
        sel = pa.array(valid)
        pair = pc.binary_join_element_wise(
            flat.slice(0, n - 1).filter(sel), flat.slice(1, n - 1).filter(sel), " "
        )
        hi, lo = fnv128_arrow(pair)
        # doc id per SURVIVING pair: pair i belongs to the doc of token i
        npairs = np.maximum(lens - 1, 0)
        doc_rep = np.repeat(doc, npairs)
        return hi, lo, doc_rep

    def count_partial(batch: pa.Table) -> pa.Table:
        hi, lo, _ = _doc_bigrams(batch)
        df = (
            pd.DataFrame({"hi": hi.astype(np.int64), "lo": lo.astype(np.int64)})
            .groupby(["hi", "lo"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "hi": pa.array(df["hi"].to_numpy(), pa.int64()),
                "lo": pa.array(df["lo"].to_numpy(), pa.int64()),
                "c_part": pa.array(df["size"].to_numpy(), pa.int64()),
            }
        )

    from .bucketagg import bucketed_sum

    common = bucketed_sum(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["hi", "lo"], [("c_part", "c12")],
        having=lambda kv, ov: ov["c12"] >= min_count,
    ).to_pandas()  # heavy-hitter-bounded by construction
    if "hi" in common.columns and len(common):
        chi = common["hi"].to_numpy(np.int64).astype(np.uint64)
        clo = common["lo"].to_numpy(np.int64).astype(np.uint64)
    else:
        chi = np.empty(0, np.uint64)
        clo = np.empty(0, np.uint64)
    order = np.lexsort((clo, chi))
    handle = ray.put((chi[order], clo[order]))

    def per_doc(batch: pa.Table) -> pa.Table:
        hi, lo, doc_rep = _doc_bigrams(batch)
        bhi, blo = ray.get(handle)
        is_common = _member2(hi, lo, bhi, blo)
        if len(doc_rep) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "n_rare": pa.array([], pa.int64())})
        df = (
            pd.DataFrame(
                {"doc_id": doc_rep, "rare": (~is_common).astype(np.int64)}
            )
            .groupby("doc_id", as_index=False)
            .agg(n_bigrams=("rare", "size"), n_rare=("rare", "sum"))
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "n_bigrams": pa.array(df["n_bigrams"].to_numpy(), pa.int64()),
                "n_rare": pa.array(df["n_rare"].to_numpy(), pa.int64()),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


def chunk_documents(ds, chunk_chars: int = 256, overlap: int = 64,
                    col: str = "text", id_col: str = "doc_id"):
    """Split documents into fixed-size overlapping chunks (the context-
    window prep every LLM training/RAG pipeline runs): chunks start every
    ``chunk_chars - overlap`` characters; the final chunk may be shorter.
    Output: doc_id, chunk_ord, chunk_text, n_chunk_chars.

    Vectorized: all chunk bytes gather from the flat UTF-8 buffer with ONE
    grouped-arange fancy index per batch — no per-doc slicing.  ASCII-only
    guard keeps byte offsets == char offsets (the oracle's ``substr``
    contract, same as dup_spans).
    """
    import pyarrow as pa

    stride = chunk_chars - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_chars")

    def chunk(batch: pa.Table) -> pa.Table:
        s = batch.column(col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        arr = s.cast(pa.large_string())
        n = len(arr)
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
        data = (np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None else np.empty(0, np.uint8))
        if np.any(data[offs[0]:offs[-1]] > 127):
            raise ValueError("chunk_documents: non-ASCII text breaks the "
                             "char==byte oracle contract")
        lens = offs[1:] - offs[:-1]
        nch = np.where(lens > 0, 1 + (lens - 1) // stride, 0)
        total = int(nch.sum())
        ids = np.repeat(batch.column(id_col).to_numpy(), nch)
        excl = np.concatenate([[0], np.cumsum(nch)[:-1]])
        ordv = np.arange(total, dtype=np.int64) - np.repeat(excl, nch)
        starts = np.repeat(offs[:-1], nch) + ordv * stride
        ends = np.minimum(starts + chunk_chars, np.repeat(offs[1:], nch))
        clen = ends - starts
        # grouped arange: one fancy index gathers every chunk's bytes
        cexcl = np.concatenate([[0], np.cumsum(clen)[:-1]])
        gather = (np.arange(int(clen.sum()), dtype=np.int64)
                  - np.repeat(cexcl, clen) + np.repeat(starts, clen))
        out_buf = pa.py_buffer(data[gather].tobytes())
        out_offs = pa.py_buffer(
            np.concatenate([[0], np.cumsum(clen)]).astype(np.int64).tobytes()
        )
        texts = pa.Array.from_buffers(pa.large_string(), total,
                                      [None, out_offs, out_buf])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_ord": pa.array(ordv, pa.int64()),
                "chunk_text": texts,
                "n_chunk_chars": pa.array(clen, pa.int64()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def unigram_surprisal(ds, vocab_k: int = 256, col: str = "text",
                      extra_cols: tuple = ()):
    """Unigram language-model quality scoring — the KenLM-perplexity-filter
    shape of CCNet/RefinedWeb (reference semantics: score each document by
    how surprising its tokens are under a corpus LM), reduced to its
    oracle-expressible integer core.

    Two passes:

    1. corpus pass: token counts (per-batch Arrow group_by partials -> ONE
       groupby-sum over the vocabulary) -> deterministic top-``vocab_k``
       vocabulary (count DESC, token ASC) plus the corpus token total,
       collected SMALL (vocab_k rows) and broadcast to the scorers
       (closure capture here; ``ray.put`` handles on a real cluster);
    2. scoring pass: per document, integer surprisal
       ``sum(bitlen(N_total) - bitlen(count(token)))`` bits, OOV tokens
       priced at count=1 (the pessimistic ``bitlen(N)-1`` fallback).

    ``bitlen`` is the exact integer floor-log2 + 1 (np.frexp here, DuckDB
    ``length(bin(n))`` in the twin), so scores are bitwise reproducible
    while ranking like a real unigram LM filter: rare/garbage tokens cost
    many bits, common words few.  Output: doc_id, n_tokens, n_oov, bits.
    """
    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens
    from ..functions.vhash import fnv64_arrow

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column(col))
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        # sentinel row: "" carries the batch token total through the SAME
        # shuffle ("" can never collide with a real [a-z0-9]+ token), so the
        # corpus total needs no separate Dataset.sum() execution; it ranks
        # first in the (n DESC, token ASC) sort since total >= any count
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [g.column("token").combine_chunks(), pa.array([""], pa.string())]
                ),
                "c_part": pa.concat_arrays(
                    [
                        g.column("token_count").cast(pa.int64()).combine_chunks(),
                        pa.array([len(flat)], pa.int64()),
                    ]
                ),
            }
        )

    keep = vocab_k + 1  # top vocab_k real tokens + the "" total sentinel

    def partial_topk(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        if len(n) > keep:
            tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
            thresh = np.partition(n, len(n) - keep)[len(n) - keep]
            cand = np.flatnonzero(n >= thresh)
            order = cand[np.lexsort((tok[cand], -n[cand]))][:keep]
            return batch.take(pa.array(order, pa.int64()))
        return batch

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="n"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(keep)
        .take_all()
    )
    n_total = sum(int(r["n"]) for r in rows if r["token"] == "")
    top = [r for r in rows if r["token"] != ""][:vocab_k]

    def _bitlen(a: np.ndarray) -> np.ndarray:
        # exact integer bit_length for 0 < a < 2**53 (frexp exponent)
        return np.frexp(a.astype(np.float64))[1].astype(np.int64)

    hraw = (
        fnv64_arrow(pa.array([r["token"] for r in top], pa.string()))
        if top
        else np.empty(0, np.uint64)
    )
    vorder = np.argsort(hraw)
    vh = hraw[vorder]
    vcost = np.zeros(len(top) + 1, np.int64)
    bl_n = int(_bitlen(np.array([max(n_total, 1)]))[0])
    if top:
        cnts = np.array([r["n"] for r in top], np.int64)[vorder]
        vcost[:-1] = bl_n - _bitlen(cnts)
    vcost[-1] = bl_n - 1  # OOV: count=1

    def score(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        if len(flat):
            h = fnv64_arrow(flat)
            if len(vh):
                idx_c = np.minimum(np.searchsorted(vh, h), len(vh) - 1)
                found = vh[idx_c] == h
            else:
                idx_c = np.zeros(len(h), np.int64)
                found = np.zeros(len(h), bool)
            cost = np.where(found, vcost[np.where(found, idx_c, 0)], vcost[-1])
            oov = (~found).astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(cost)])
            osum = np.concatenate([[0], np.cumsum(oov)])
            ends = starts + lens
            bits = csum[ends] - csum[starts]
            n_oov = osum[ends] - osum[starts]
        else:
            bits = np.zeros(len(lens), np.int64)
            n_oov = np.zeros(len(lens), np.int64)
        cols = {"doc_id": batch.column("doc_id")}
        for c in extra_cols:  # passthrough (e.g. lang for ccnet_buckets)
            cols[c] = batch.column(c)
        cols["n_tokens"] = pa.array(lens, pa.int64())
        cols["n_oov"] = pa.array(n_oov, pa.int64())
        cols["bits"] = pa.array(bits, pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def _levenshtein_np(s: bytes, t: bytes) -> int:
    """Exact unit-cost edit distance; the inner row update is fully
    vectorized (insertion closure via the prefix-min + arange trick)."""
    if not s:
        return len(t)
    if not t:
        return len(s)
    sa = np.frombuffer(s, dtype=np.uint8)
    tb = np.frombuffer(t, dtype=np.uint8)
    n = len(tb)
    steps = np.arange(n + 1, dtype=np.int64)
    prev = steps.copy()
    for i, ch in enumerate(sa, 1):
        cand = np.minimum(prev[1:] + 1, prev[:-1] + (tb != ch))
        seed = np.concatenate([[np.int64(i)], cand])
        cur = np.minimum.accumulate(seed - steps) + steps
        prev = cur
    return int(prev[-1])


def edit_distance_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact Levenshtein distance over candidate pairs (consecutive doc ids
    — the verify step every fuzzy-dedup candidate generator feeds into).

    Pairing is ONE native hash join on pair_id = doc_id // 2 (dense int
    schema on both sides, the `tpch_q3` join path); the DP itself runs
    per pair with a vectorized O(|t|) row update, so cost is
    O(pairs · |s| · |t| / simd), never corpus-quadratic — candidates are
    whatever the upstream LSH/blocking stage emitted (here: id-adjacent).
    Output: (pair_id, a, b, lev) with a DuckDB ``levenshtein`` twin.
    """

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                "pair_id": pa.array(ids // 2, pa.int64()),
                "side": pa.array((ids % 2).astype(np.int64), pa.int64()),
                "id": pa.array(ids, pa.int64()),
                "txt": batch.column(text_col),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    left = tagged.filter(expr="side == 0").drop_columns(["side"])
    right = tagged.filter(expr="side == 1").drop_columns(["side"])
    joined = left.join(
        right, join_type="inner", num_partitions=16,
        on=("pair_id",), right_suffix="_r",
    )

    def dist(batch: pa.Table) -> pa.Table:
        a = batch.column("txt").to_pylist()
        b = batch.column("txt_r").to_pylist()
        lev = [
            _levenshtein_np(x.encode("utf-8"), y.encode("utf-8"))
            for x, y in zip(a, b)
        ]
        return pa.table(
            {
                "pair_id": batch.column("pair_id"),
                "a": batch.column("id"),
                "b": batch.column("id_r"),
                "lev": pa.array(lev, pa.int64()),
            }
        )

    return joined.map_batches(dist, batch_format="pyarrow")


def bigram_surprisal(ds, bigram_k: int = 512, unigram_k: int = 256,
                     col: str = "text"):
    """Conditional bigram-LM scoring — the order-2 companion of
    :func:`unigram_surprisal`: per adjacent token pair, integer bits
    ``max(0, bitlen(c(w1)) - bitlen(c(w1,w2)))`` (how surprising w2 is
    GIVEN w1), with counts outside the broadcast top-k vocabularies
    falling back to 1.  All counting reuses the Arrow-native bigram /
    unigram partial machinery; scoring is one vectorized pass with two
    sorted-hash lookups (collision odds ~V·distinct·2^-64, the accepted
    fnv64 risk class).  Output: doc_id, n_pairs, bits.
    """
    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens
    from ..functions.vhash import fnv64_arrow

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def bi_partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        n = len(flat)
        if n < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_part": pa.array([], pa.int64())})
        starts = np.concatenate([[0], np.cumsum(lens)])
        valid = np.ones(n - 1, dtype=bool)
        ends = starts[1:-1]
        valid[ends[(ends > 0) & (ends <= len(valid))] - 1] = False
        sel = pa.array(valid)
        t = pa.table({"w1": flat.slice(0, n - 1).filter(sel),
                      "w2": flat.slice(1, n - 1).filter(sel)})
        g = t.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table({"w1": g.column("w1"), "w2": g.column("w2"),
                         "c_part": g.column("w1_count")})

    def bi_topk(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy()
        if len(c) > bigram_k:
            w1 = np.asarray(batch.column("w1").to_pandas(), dtype=object)
            w2 = np.asarray(batch.column("w2").to_pandas(), dtype=object)
            thresh = np.partition(c, len(c) - bigram_k)[len(c) - bigram_k]
            cand = np.flatnonzero(c >= thresh)
            order = cand[np.lexsort((w2[cand], w1[cand], -c[cand]))][:bigram_k]
            return batch.take(pa.array(order, pa.int64()))
        return batch

    top_bi = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c_part", alias_name="c"))
        .map_batches(bi_topk, batch_format="pyarrow")
        .sort(["c", "w1", "w2"], descending=[True, False, False])
        .limit(bigram_k)
        .take_all()
    )

    def u_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch.column(col))
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table({"token": g.column("token"), "c_part": g.column("token_count")})

    def u_topk(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy()
        if len(c) > unigram_k:
            tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
            thresh = np.partition(c, len(c) - unigram_k)[len(c) - unigram_k]
            cand = np.flatnonzero(c >= thresh)
            order = cand[np.lexsort((tok[cand], -c[cand]))][:unigram_k]
            return batch.take(pa.array(order, pa.int64()))
        return batch

    top_u = (
        ds.map_batches(u_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c_part", alias_name="c"))
        .map_batches(u_topk, batch_format="pyarrow")
        .sort(["c", "token"], descending=[True, False])
        .limit(unigram_k)
        .take_all()
    )

    def _bitlen(a: np.ndarray) -> np.ndarray:
        return np.frexp(a.astype(np.float64))[1].astype(np.int64)

    if top_bi:
        h1 = fnv64_arrow(pa.array([r["w1"] for r in top_bi], pa.string()))
        h2 = fnv64_arrow(pa.array([r["w2"] for r in top_bi], pa.string()))
        hp = h1 * GOLD + h2
        border = np.argsort(hp)
        bh, bcnt = hp[border], np.array([r["c"] for r in top_bi], np.int64)[border]
    else:
        bh, bcnt = np.empty(0, np.uint64), np.empty(0, np.int64)
    if top_u:
        hu = fnv64_arrow(pa.array([r["token"] for r in top_u], pa.string()))
        uorder = np.argsort(hu)
        uh, ucnt = hu[uorder], np.array([r["c"] for r in top_u], np.int64)[uorder]
    else:
        uh, ucnt = np.empty(0, np.uint64), np.empty(0, np.int64)

    def _lookup(sorted_h, vals, h, default):
        if not len(sorted_h):
            return np.full(len(h), default, np.int64)
        i = np.minimum(np.searchsorted(sorted_h, h), len(sorted_h) - 1)
        found = sorted_h[i] == h
        return np.where(found, vals[np.where(found, i, 0)], default)

    def score(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        n = len(flat)
        n_pairs_doc = np.maximum(lens - 1, 0)
        if n >= 2:
            h = fnv64_arrow(flat)
            hp = h[:-1] * GOLD + h[1:]
            c12 = _lookup(bh, bcnt, hp, 1)
            c1 = _lookup(uh, ucnt, h[:-1], 1)
            cost = np.maximum(0, _bitlen(c1) - _bitlen(c12))
            starts = np.concatenate([[0], np.cumsum(lens)])
            valid = np.ones(n - 1, dtype=bool)
            ends = starts[1:-1]
            valid[ends[(ends > 0) & (ends <= len(valid))] - 1] = False
            csum = np.concatenate([[0], np.cumsum(cost * valid)])
            pe = np.minimum(starts[1:] - 1, n - 1)
            ps = starts[:-1]
            bits = np.where(n_pairs_doc > 0, csum[pe] - csum[ps], 0)
        else:
            bits = np.zeros(len(lens), np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_pairs": pa.array(n_pairs_doc.astype(np.int64), pa.int64()),
                "bits": pa.array(bits.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_weights(ds, vocab_k: int = 256, target_lang: str = "en",
                 col: str = "text"):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") reduced to the
    oracle-expressible integer core: each document is scored by the
    log-ratio of its unigram likelihood under the TARGET distribution
    (docs with ``lang == target_lang``) vs the RAW corpus distribution,
    in exact bits — ``sum over in-vocab tokens of
    bitlen(count_target + 1) - bitlen(count_raw + 1)`` (add-one keeps the
    bitlen defined when the target never saw a token; out-of-vocab tokens
    contribute 0, mirroring DSIR's hashed-feature truncation).

    Two passes, same scale shape as :func:`unigram_surprisal`:
    1. ONE token-count shuffle carrying BOTH distributions (raw count and
       target count per token as two partial columns) -> deterministic
       top-``vocab_k`` vocabulary by raw count (count DESC, token ASC),
       collected SMALL and broadcast;
    2. per-doc vectorized scoring over hashed token lookups.
    Output: doc_id, n_tokens, n_vocab, dsir_bits (positive = looks like
    the target domain)."""
    from ray.data.aggregate import Sum

    from .dedup import _flat_tokens
    from ..functions.vhash import fnv64_arrow

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_pandas()
        flat, lens = _flat_tokens(batch.column(col))
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "r_part": pa.array([], pa.int64()),
                             "t_part": pa.array([], pa.int64())})
        is_t = np.repeat((lang == target_lang).to_numpy(), lens)
        tt = pa.table({"token": flat,
                       "t": pa.array(is_t.astype(np.int64), pa.int64())})
        g = tt.group_by("token").aggregate([("t", "count"), ("t", "sum")])
        return pa.table({
            "token": g.column("token"),
            "r_part": g.column("t_count").cast(pa.int64()),
            "t_part": g.column("t_sum").cast(pa.int64()),
        })

    def partial_topk(batch: pa.Table) -> pa.Table:
        n = batch.column("r_n").to_numpy()
        if len(n) > vocab_k:
            tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
            thresh = np.partition(n, len(n) - vocab_k)[len(n) - vocab_k]
            cand = np.flatnonzero(n >= thresh)
            order = cand[np.lexsort((tok[cand], -n[cand]))][:vocab_k]
            return batch.take(pa.array(order, pa.int64()))
        return batch

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("r_part", alias_name="r_n"),
                   Sum("t_part", alias_name="t_n"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .sort(["r_n", "token"], descending=[True, False])
        .limit(vocab_k)
        .take_all()
    )

    def _bitlen(a: np.ndarray) -> np.ndarray:
        return np.frexp(a.astype(np.float64))[1].astype(np.int64)

    hraw = (fnv64_arrow(pa.array([r["token"] for r in rows], pa.string()))
            if rows else np.empty(0, np.uint64))
    vorder = np.argsort(hraw)
    vh = hraw[vorder]
    if rows:
        rn = np.array([r["r_n"] for r in rows], np.int64)[vorder]
        tn = np.array([r["t_n"] for r in rows], np.int64)[vorder]
        vcost = _bitlen(tn + 1) - _bitlen(rn + 1)
    else:
        vcost = np.zeros(0, np.int64)

    def score(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column(col))
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        if len(flat) and len(vh):
            h = fnv64_arrow(flat)
            idx_c = np.minimum(np.searchsorted(vh, h), len(vh) - 1)
            found = vh[idx_c] == h
            cost = np.where(found, vcost[np.where(found, idx_c, 0)], 0)
            inv = found.astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(cost)])
            isum = np.concatenate([[0], np.cumsum(inv)])
            ends = starts + lens
            bits = csum[ends] - csum[starts]
            n_v = isum[ends] - isum[starts]
        else:
            bits = np.zeros(len(lens), np.int64)
            n_v = np.zeros(len(lens), np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_vocab": pa.array(n_v, pa.int64()),
            "dsir_bits": pa.array(bits, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def readability(ds):
    """Integer Flesch-style readability scoring per document (the classic
    quality-filter feature): words = [a-z0-9]+ runs, sentences = [.!?]
    marks, syllable proxy = [aeiou]+ vowel groups, and
    ``flesch_milli = 206835 - (1015 * words) // max(sent, 1)
    - (84600 * vgroups) // max(words, 1)`` — all floor arithmetic on
    positive ints, so the SQL twin (DuckDB RE2 regexp_extract_all counts)
    is bitwise.  Embarrassingly parallel, zero shuffles."""
    import pyarrow.compute as pc

    def per_batch(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        low = pc.utf8_lower(col)
        words = pc.count_substring_regex(low, "[a-z0-9]+").to_numpy().astype(np.int64)
        sents = pc.count_substring_regex(col, "[.!?]").to_numpy().astype(np.int64)
        vg = pc.count_substring_regex(low, "[aeiou]+").to_numpy().astype(np.int64)
        flesch = (206835
                  - (1015 * words) // np.maximum(sents, 1)
                  - (84600 * vg) // np.maximum(words, 1))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(words, pa.int64()),
            "n_sentences": pa.array(sents, pa.int64()),
            "n_vowel_groups": pa.array(vg, pa.int64()),
            "flesch_milli": pa.array(flesch, pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")
