"""doc_repetition + tf-idf top-k: edge cases the sf-table gate can't hit
(empty / short / fully-repetitive docs, exact score ties)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def test_doc_repetition_edges():
    from planetiler_ray.stages.text import doc_repetition

    out = doc_repetition(
        _batch(
            [
                "",  # no tokens -> 0/0/0
                "one two",  # short doc: single all-words shingle
                "a b c a b c a b c",  # 7 windows, 3 distinct
                "x y z w",  # 2 windows, both distinct
            ]
        )
    ).to_pandas()
    assert out["n_shingles"].tolist() == [0, 1, 7, 2]
    assert out["n_distinct"].tolist() == [0, 1, 3, 2]
    # 4 duplicated of 7 -> 5714 bp
    assert out["rep_bp"].tolist() == [0, 0, 4 * 10000 // 7, 0]


def test_doc_repetition_matches_string_shingles():
    rng = np.random.default_rng(3)
    words = list("abcdefg")
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 12)).tolist())
        for _ in range(200)
    ]
    from planetiler_ray.stages.text import doc_repetition

    out = doc_repetition(_batch(texts)).to_pandas()
    for txt, row in zip(texts, out.itertuples()):
        toks = [w for w in txt.split() if w]
        if len(toks) >= 3:
            sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        elif toks:
            sh = [" ".join(toks)]
        else:
            sh = []
        assert row.n_shingles == len(sh)
        assert row.n_distinct == len(set(sh))


def test_tfidf_topk_ranks_and_ties(ray_session):
    import ray

    from planetiler_ray.stages.text import TfIdfTopK, doc_term_freq

    # corpus: 'rare' appears in 1 doc, 'common' in all 4
    texts = [
        "rare common common",
        "common beta beta gamma",
        "common beta",
        "common",
    ]
    tf = doc_term_freq(_batch(texts)).to_pandas()
    df_tbl = tf.groupby("term", as_index=False).agg(df=("doc_id", "count"))
    handle = ray.put(
        pa.table({"term": pa.array(df_tbl["term"]), "df": pa.array(df_tbl["df"], pa.int64())})
    )
    top = TfIdfTopK(handle, n_docs=4, k=2)(_batch(texts)).to_pandas()
    d0 = top[top.doc_id == 0]
    # rare: tf=1, idf=ln(4); common: tf=2, idf=0 -> rare wins despite tf
    assert d0.iloc[0]["term"] == "rare"
    # doc 3 has only the zero-idf term; still emitted (k cap, not score gate)
    assert set(top[top.doc_id == 3]["term"]) == {"common"}
    # doc 1: beta tf=2 ranks first; gamma (idf=ln(4)) beats common (idf=0)
    d1 = top[top.doc_id == 1]["term"].tolist()
    assert d1 == ["beta", "gamma"]


def test_langid_oracle_parity_multilang():
    """Engine vs DuckDB oracle on a corpus that actually exercises the
    fr/de/es branches and ties (the sf tables are English-ish)."""
    import duckdb

    from planetiler_ray import oracle
    from planetiler_ray.stages.text import langid_ngram

    texts = [
        "the cat and the dog of york",      # en
        "le chat et la mer",                # fr
        "der hund und die katze",           # de
        "el mar y los rios",                # es
        "the le der el",                    # 4-way tie -> en (first max)
        "nothing here matches",             # und? ('nothing' has no marker)
        "",                                 # und
        "und und und",                      # de marker only
        "y the",                            # tie en/es -> en
    ]
    batch = _batch(texts)
    eng = langid_ngram(batch).to_pandas().sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    ora = con.execute(oracle.sql_langid()).fetchdf().sort_values(
        "doc_id", ignore_index=True
    )
    assert eng["lang_guess"].tolist() == ora["lang_guess"].tolist()
    assert eng["lang_conf_bp"].tolist() == ora["lang_conf_bp"].tolist()
    assert eng["lang_guess"].tolist()[:5] == ["en", "fr", "de", "es", "en"]


def test_pii_scrub_redacts_and_counts():
    from planetiler_ray.stages.text import pii_scrub

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "write to bob7@mail.org or 555-1234 now",
                "no pii here, 12-34 and a@b are not matches",
                "two mails x@y.com z9@q.net and 999-0000 123-4567",
            ],
        }
    )
    out = pii_scrub(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 1 and out.loc[1, "n_phones"] == 1
    assert out.loc[1, "clean_text"] == "write to <EMAIL> or <PHONE> now"
    assert out.loc[2, "n_emails"] == 0 and out.loc[2, "n_phones"] == 0
    assert out.loc[2, "clean_text"] == t.column("text")[1].as_py()
    assert out.loc[3, "n_emails"] == 2 and out.loc[3, "n_phones"] == 2


def test_line_dedup_drops_high_df_lines(ray_session):
    import ray

    from planetiler_ray.stages.dedup import line_dedup

    # 12 docs share the line "boiler"; each doc also has a unique line and
    # doc 0 consists ONLY of boilerplate (must still be emitted, empty).
    rows = []
    for d in range(12):
        if d == 0:
            rows.append({"doc_id": d, "text": "boiler"})
        else:
            rows.append({"doc_id": d, "text": f"unique {d}\nboiler\ntail {d}"})
    ds = ray.data.from_items(rows)
    out = (
        line_dedup(ds, max_df=10)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert len(out) == 12
    assert out.loc[0, "n_lines"] == 1 and out.loc[0, "n_kept"] == 0
    assert out.loc[0, "clean_text"] == ""
    for d in range(1, 12):
        assert out.loc[d, "n_lines"] == 3 and out.loc[d, "n_kept"] == 2
        assert out.loc[d, "clean_text"] == f"unique {d}\ntail {d}"


def test_line_dedup_keeps_lines_at_or_below_df_cap(ray_session):
    import ray

    from planetiler_ray.stages.dedup import line_dedup

    rows = [{"doc_id": d, "text": f"shared\nmine {d}"} for d in range(5)]
    out = (
        line_dedup(ray.data.from_items(rows), max_df=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["n_kept"] == 2).all()  # df == 5 <= max_df: kept


def test_pack_sequences_prefix_and_boundaries(ray_session):
    import ray

    from planetiler_ray.stages.text import pack_sequences

    # token counts: 3, 4, 0, 5, 2 -> prefixes 0, 3, 7, 7, 12
    rows = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "d e f g"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "h i j k l"},
        {"doc_id": 4, "text": "m n"},
    ]
    out = (
        pack_sequences(ray.data.from_items(rows), max_tokens=5, range_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out["n_tokens"].tolist() == [3, 4, 0, 5, 2]
    assert out["tok_start"].tolist() == [0, 3, 7, 7, 12]
    assert out["seq_id"].tolist() == [0, 0, 1, 1, 2]


def test_vocab_topk_counts_and_ties(ray_session):
    import ray

    from planetiler_ray.stages.text import vocab_topk

    rows = [
        {"doc_id": 0, "text": "apple banana apple Cherry"},
        {"doc_id": 1, "text": "banana apple date cherry"},
        {"doc_id": 2, "text": "egg egg egg egg"},
    ]
    out = vocab_topk(ray.data.from_items(rows), k=3).to_pandas()
    # counts: egg=4, apple=3, banana=2, cherry=2, date=1 -> tie at rank 3
    # broken token-ascending => banana beats cherry
    assert out["token"].tolist() == ["egg", "apple", "banana"]
    assert out["n"].tolist() == [4, 3, 2]


def test_dup_spans_planted(ray_session):
    import ray

    from planetiler_ray.stages.dedup import dup_spans

    # doc 0 and 1 share an exact 64-char run -> both get flagged; doc 2 is
    # unique text of the same length -> absent; doc 3 is too short for one
    # 32-char window -> absent.
    # prefixes are multiples of the stride so the shared run is window-
    # aligned in both docs (the detector is exact, not shift-invariant)
    shared = "x" * 30 + "SHARED RUN OF TEXT " + "y" * 30  # 79 chars
    rows = [
        {"doc_id": 0, "text": "a" * 16 + shared + " bbb"},
        {"doc_id": 1, "text": "c" * 32 + shared + " dd"},
        {"doc_id": 2, "text": "".join(chr(97 + (i * 7) % 26) for i in range(80))},
        {"doc_id": 3, "text": "tiny"},
    ]
    ds = ray.data.from_items(rows)
    out = (
        dup_spans(ds, length=32, stride=16)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert set(out.index) == {0, 1}
    # windows at in-shared offsets 0, 16, 48 are fully inside the shared
    # run in both docs (offset 32 straddles nothing — also inside): each
    # doc counts the same >=3 duplicated stride positions
    assert (out["n_dup_spans"] >= 3).all()


def test_dup_spans_same_doc_repeat_not_flagged(ray_session):
    import ray

    from planetiler_ray.stages.dedup import dup_spans

    # a window repeated WITHIN one doc only (distinct-doc count == 1) must
    # not be reported; stride-aligned identical windows guaranteed by the
    # 32-char period of the repeated block
    block = "0123456789abcdef" * 2  # 32 chars, repeats at stride 32
    rows = [
        {"doc_id": 7, "text": block * 4},
        {"doc_id": 8, "text": "completely different content herewith padding z"},
    ]
    ds = ray.data.from_items(rows)
    out = dup_spans(ds, length=32, stride=16).to_pandas()
    # no cross-doc duplicate exists at all -> empty result
    assert len(out) == 0


def test_grouped_quantiles_ceil_convention(ray_session):
    import ray

    from planetiler_ray.stages.events import grouped_quantiles

    # group "a": 1..10 -> p50 = 5 (ceil(5)=5th), p90 = 9, p99 = 10
    # group "b": [3, 3, 7] -> p50 = 3, p90 = 7, p99 = 7
    rows = [{"g": "a", "v": i} for i in range(1, 11)]
    rows += [{"g": "b", "v": v} for v in (3, 3, 7)]
    ds = ray.data.from_items(rows)
    out = (
        grouped_quantiles(ds, "g", "v")
        .to_pandas()
        .sort_values("g")
        .set_index("g")
    )
    assert out.loc["a", ["p50", "p90", "p99", "n_rows"]].tolist() == [5, 9, 10, 10]
    assert out.loc["b", ["p50", "p90", "p99", "n_rows"]].tolist() == [3, 7, 7, 3]


def test_bigram_stats_boundaries_and_counts(ray_session):
    import ray

    from planetiler_ray.stages.text import bigram_stats

    rows = [
        {"doc_id": 0, "text": "red fox red fox red"},
        {"doc_id": 1, "text": "fox red fox"},
        {"doc_id": 2, "text": ""},            # empty doc: no pairs
        {"doc_id": 3, "text": "solo"},        # single token: no pairs
    ]
    out = (
        bigram_stats(ray.data.from_items(rows), min_count=2)
        .to_pandas()
        .set_index(["w1", "w2"])
    )
    # "red fox": docs 0 (x2) + 1 (x1) = 3; "fox red": doc 0 (x2) + doc 1 (x1) = 3
    assert out.loc[("red", "fox"), "c12"] == 3
    assert out.loc[("fox", "red"), "c12"] == 3
    # the doc boundary between doc 0 ("...red") and doc 1 ("fox...") must
    # NOT create an extra "red fox" pair (counts above already prove it,
    # since a leak would give 4)
    assert out.loc[("red", "fox"), "c1"] == 4  # 'red' total occurrences
    assert out.loc[("red", "fox"), "c2"] == 4  # 'fox' total occurrences


def test_unigram_surprisal_ranks_garbage_higher(ray_session):
    """Common-vocabulary docs cost fewer bits/token than OOV garbage; zero-
    token docs survive with zeros (LEFT JOIN parity with the SQL twin)."""
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.text import unigram_surprisal

    common = "the cat sat on the mat " * 20
    garbage = "zqxv kjhw pqzr wvnm xkcd qwpv"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": [common, garbage, "..."]})
    )
    out = {r["doc_id"]: r for r in unigram_surprisal(ds, vocab_k=5).take_all()}
    assert out[3]["n_tokens"] == 0 and out[3]["bits"] == 0
    bpt1 = out[1]["bits"] / out[1]["n_tokens"]
    bpt2 = out[2]["bits"] / out[2]["n_tokens"]
    assert bpt2 > bpt1
    assert out[2]["n_oov"] == out[2]["n_tokens"]  # all garbage OOV
    assert out[1]["n_oov"] == 0  # the 5 common words fill vocab_k=5


def test_levenshtein_kernel_matches_duckdb():
    """The vectorized prefix-min DP equals DuckDB's levenshtein() on random
    strings including empty edges — the exactness claim behind the
    edit_distance oracle."""
    import duckdb
    import numpy as np

    from planetiler_ray.stages.text import _levenshtein_np

    rng = np.random.default_rng(0)
    con = duckdb.connect()
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting")]
    for _ in range(150):
        n1, n2 = rng.integers(0, 25, 2)
        cases.append((
            "".join(rng.choice(list("abcd")) for _ in range(n1)),
            "".join(rng.choice(list("abcd")) for _ in range(n2)),
        ))
    for s, t in cases:
        got = _levenshtein_np(s.encode(), t.encode())
        want = con.sql("SELECT levenshtein(?, ?)", params=[s, t]).fetchall()[0][0]
        assert got == want, (s, t, got, want)
