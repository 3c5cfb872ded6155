"""Training-data operator queries: dedup / similarity / text analysis /
windows — each returns a Dataset from ``sf_dir`` (driver contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..stages import ann, dedup, events, text


def join_args(max_partitions: int = 64, size_hint_rows: int | None = None,
              rows_per_partition: int = 500_000) -> dict:
    """Cluster-sized kwargs for ``Dataset.join``: hash-partition width
    derived from total CPUs (ADVICE r2: no hardcoded shuffle parallelism)
    and FRACTIONAL aggregator CPUs — Ray's hash-shuffle aggregator pool
    reserves ``num_cpus`` per aggregator up front, so the default of 1
    deadlocks any session where num_partitions exceeds the CPU count
    (e.g. the 4-cpu pytest fixture) by starving the upstream map tasks.

    ``size_hint_rows`` (big-side row count, usually free from the parquet
    footer) sizes the pool by DATA, not just cores: each join aggregator
    is an actor with fixed startup cost, so a 600k-row join wants ~8
    partitions while a 10^12-row join wants the full 2x-cores width —
    measured on tpch_q5 at sf0.1, 64 partitions cost 10.7 s vs 6.1 s at
    16 (the shuffle itself is trivial; the pool is the overhead)."""
    n_cpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    floor = min(8, max(2, n_cpu))  # ADVICE r3: scale the floor with the
    # cluster so a 1-2 CPU session doesn't reserve 8 x 0.25 = 2.0 CPUs of
    # aggregators and starve its own upstream map tasks
    width = max(floor, min(max_partitions, 2 * n_cpu))
    if size_hint_rows is not None:
        width = max(floor, min(width, -(-size_hint_rows // rows_per_partition)))
    # cap the aggregator pool's total reservation at ~n_cpu/2: 0.25/agg
    # whenever width <= 2*n_cpu (i.e. everywhere today, incl. the 32-cpu
    # bench), shrinking fractionally only when a small session meets a
    # wide hint
    agg_cpus = min(0.25, round(n_cpu / (2 * width), 3))
    return {
        "num_partitions": width,
        "aggregator_ray_remote_args": {"num_cpus": agg_cpus},
    }


def docs_ds(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def events_ds(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def q_exact_dedup(sf_dir: str):
    return dedup.exact_dedup(docs_ds(sf_dir, ["doc_id", "text"])).select_columns(
        ["keep_id", "n_dups"]
    )


def q_jaccard_pairs(sf_dir: str):
    """Exact-Jaccard pairs on a deterministic 1/5 doc sample (the synthetic
    corpus shares a tiny vocabulary, so all-pairs blocking is quadratic; the
    operator itself is general — the sample only bounds the oracle query)."""
    import pyarrow as pa

    def sample(batch: pa.Table) -> pa.Table:
        keep = batch.column("doc_id").to_numpy() % 5 == 0
        return batch.filter(pa.array(keep))

    ds = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(sample, batch_format="pyarrow")
    return dedup.jaccard_pairs(ds, threshold=0.5)


def q_jaccard_rare(sf_dir: str, df_cap: int = 80):
    """Exact Jaccard over RARE tokens only (document frequency <= df_cap on
    the same 1/5 sample) — the 100-TB scale path of :func:`q_jaccard_pairs`:
    hot tokens are excluded from the similarity universe on BOTH the engine
    and oracle side, bounding every inverted-index group at df_cap."""
    import pyarrow as pa

    def sample(batch: pa.Table) -> pa.Table:
        keep = batch.column("doc_id").to_numpy() % 5 == 0
        return batch.filter(pa.array(keep))

    ds = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(sample, batch_format="pyarrow")
    return dedup.jaccard_pairs(ds, threshold=0.5, df_cap=df_cap)


def q_containment_pairs(sf_dir: str, df_cap: int = 80, threshold: float = 0.7):
    """Set-CONTAINMENT near-dup pairs (quote / boilerplate detection):
    shared / min(|A|, |B|) >= threshold over rare tokens (df <= df_cap on
    the same deterministic 1/5 sample as the Jaccard family) — the
    asymmetric metric that catches a short doc embedded verbatim in a long
    one, which Jaccard misses.  Same inverted-index + df-cap machinery as
    :func:`q_jaccard_rare` (the 100-TB-bounded path); only the finish
    arithmetic differs."""
    import pyarrow as pa

    def sample(batch: pa.Table) -> pa.Table:
        keep = batch.column("doc_id").to_numpy() % 5 == 0
        return batch.filter(pa.array(keep))

    ds = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(sample, batch_format="pyarrow")
    return dedup.jaccard_pairs(ds, threshold=threshold, df_cap=df_cap,
                               metric="containment")


def q_minhash_lsh(sf_dir: str):
    """Probabilistic near-dup candidates (rows-only check)."""
    sigs = dedup.minhash_signatures(docs_ds(sf_dir, ["doc_id", "text"]))
    return dedup.lsh_candidate_pairs(sigs)


def q_simhash(sf_dir: str):
    """SimHash near-dup pairs, hamming <= 3 (rows-only check)."""
    return dedup.simhash_candidates(docs_ds(sf_dir, ["doc_id", "text"]))


def planted_text_ds(sf_dir: str, n_words: int = 24, stride: int = 40):
    """Decoration-invariant planted near-dup corpus (the neardup_planted
    trick applied to the TEXT dedup suite): docs 2d and 2d+1 tokenize to
    the SAME word sequence (2d+1 is uppercased with punctuation inserted),
    while distinct d share no words at all (disjoint word-id ranges).  The
    expected near-dup pair set is therefore exactly {(2d, 2d+1)}, which a
    one-line SQL twin derives — turning the probabilistic LSH/simhash
    operators into exact-oracle queries on this corpus."""

    def plant(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        text_a = np.full(len(d), "", dtype=object)
        cols = [
            np.char.add("w", (d * stride + j).astype("U16"))
            for j in range(n_words)
        ]
        text_a = cols[0]
        for c in cols[1:]:
            text_a = np.char.add(np.char.add(text_a, " "), c)
        text_b = np.char.replace(np.char.upper(text_a), " ", " , ")
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([d * 2, d * 2 + 1]), pa.int64()
                ),
                "text": pa.array(
                    np.concatenate([text_a, text_b]).tolist(), pa.string()
                ),
            }
        )

    return docs_ds(sf_dir, ["doc_id"]).map_batches(plant, batch_format="pyarrow")


def q_minhash_planted(sf_dir: str):
    """MinHash+LSH over the planted corpus — exact pair-set oracle
    (identical shingle sets => all bands collide; disjoint vocabularies
    => no other candidates)."""
    sigs = dedup.minhash_signatures(planted_text_ds(sf_dir))
    return dedup.lsh_candidate_pairs(sigs)


def q_simhash_planted(sf_dir: str):
    """SimHash blocking over the planted corpus — exact oracle (siblings
    hash identically => hamming 0)."""
    return dedup.simhash_candidates(planted_text_ds(sf_dir))


def q_text_stats(sf_dir: str):
    return docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        text.text_stats, batch_format="pyarrow"
    )


def q_quality(sf_dir: str):
    return docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        text.quality_score, batch_format="pyarrow"
    ).select_columns(["doc_id", "quality_bp"])


def q_fingerprint(sf_dir: str):
    return docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        text.fingerprint, batch_format="pyarrow"
    ).select_columns(["doc_id", "fp_md5"])


def _plant_pii(batch: pa.Table) -> pa.Table:
    """Deterministic PII injection (SQL-mirrorable concat): every doc gains
    one email and one phone so the scrub operator has work to do."""
    import pyarrow.compute as pc

    d = batch.column("doc_id").to_numpy()
    out = pc.binary_join_element_wise(
        batch.column("text"),
        " mail u", pa.array(d.astype("U20"), pa.string()),
        "@ex", pa.array((d % 5).astype("U4"), pa.string()),
        ".com tel 555-", pa.array((1000 + d % 9000).astype("U4"), pa.string()),
        "",
    )
    return pa.table({"doc_id": batch.column("doc_id"), "text": out})


def q_pii_scrub(sf_dir: str):
    """RE2 regex PII redaction over a deterministically planted corpus —
    exact oracle (pyarrow and DuckDB both compile the shared patterns with
    RE2, so replace semantics match by construction)."""
    return docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _plant_pii, batch_format="pyarrow"
    ).map_batches(text.pii_scrub, batch_format="pyarrow")


def _plant_boilerplate(batch: pa.Table) -> pa.Table:
    """Append two boilerplate lines per doc (one global, one per doc_id%7
    cohort) so corpus-level line dedup has planted high-df lines; the SQL
    twin replays the identical concat."""
    import pyarrow.compute as pc

    d = batch.column("doc_id").to_numpy()
    out = pc.binary_join_element_wise(
        batch.column("text"),
        "\nall rights reserved\nshare this page on network ",
        pa.array((d % 7).astype("U4"), pa.string()),
        "",
    )
    return pa.table({"doc_id": batch.column("doc_id"), "text": out})


def q_line_dedup(sf_dir: str, max_df: int = 10):
    """Corpus-level duplicate-line scrub (C4/RefinedWeb boilerplate
    removal) over the planted corpus — exact full-text oracle."""
    ds = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _plant_boilerplate, batch_format="pyarrow"
    )
    return dedup.line_dedup(ds, max_df=max_df)


def _v2_docs(batch: pa.Table, n: int) -> pa.Table:
    """Deterministic second snapshot: drop d%10==0, append ' v2' to text
    when d%7==0, and add brand-new ids n+d for d%13==0."""
    import pyarrow.compute as pc

    d = batch.column("doc_id").to_numpy()
    keep = d % 10 != 0
    kept = batch.filter(pa.array(keep))
    kd = kept.column("doc_id").to_numpy()
    changed = kd % 7 == 0
    suffix = pa.array(np.where(changed, " v2", "").tolist(), pa.string())
    text2 = pc.binary_join_element_wise(kept.column("text"), suffix, "")
    newd = d[d % 13 == 0]
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate([kd, n + newd]), pa.int64()),
            "text": pa.concat_arrays(
                [text2.combine_chunks() if isinstance(text2, pa.ChunkedArray)
                 else text2,
                 pa.array(["fresh doc " + str(x) for x in newd], pa.string())]
            ),
        }
    )


def q_range_join(sf_dir: str):
    """Broadcast range join: doc length mapped to the nation whose
    [n_nationkey*22, +22) band contains it (the IP-geolocation shape —
    interval table broadcast once per actor, searchsorted per batch, no
    shuffle).  Inner-join semantics; exact SQL twin."""
    from ..stages.joins import RangeJoiner

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey"])
    keys = nat.column("n_nationkey").to_numpy().astype(np.int64)
    handle = ray.put((keys * 22, keys * 22 + 22, keys))
    out = docs_ds(sf_dir, ["doc_id", "n_chars"]).map_batches(
        RangeJoiner(handle, value_col="n_chars", out_col="n_nationkey"),
        batch_format="pyarrow",
    )
    return out.filter(lambda r: r["n_nationkey"] >= 0).select_columns(
        ["doc_id", "n_chars", "n_nationkey"]
    )


def q_mad_outliers(sf_dir: str, k: int = 3):
    """Robust per-source outlier flags: |x - median| > k * MAD, all in
    integers (two rounds of the histogram-partial exact quantile +
    broadcast join-backs) — the quality-filter shape that is robust to the
    heavy tails a mean/stddev z-score chokes on."""
    from ..stages import events as E

    med = (
        E.grouped_quantiles(docs_ds(sf_dir, ["source", "n_chars"]),
                            "source", "n_chars", qs=(0.5,))
        .to_pandas()
    )
    med_lk = dict(zip(med["source"], med["p50"].astype(np.int64)))
    h_med = ray.put(med_lk)

    def add_dev(batch: pa.Table) -> pa.Table:
        lk = ray.get(h_med)
        src = batch.column("source").to_pandas()
        m = src.map(lk).to_numpy().astype(np.int64)
        d = batch.column("n_chars").to_numpy().astype(np.int64) - m
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "dev": pa.array(d, pa.int64()),
                "absdev": pa.array(np.abs(d), pa.int64()),
            }
        )

    devs = docs_ds(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        add_dev, batch_format="pyarrow"
    )
    mad = (
        E.grouped_quantiles(devs.select_columns(["source", "absdev"]),
                            "source", "absdev", qs=(0.5,))
        .to_pandas()
    )
    mad_lk = dict(zip(mad["source"], mad["p50"].astype(np.int64)))
    h_mad = ray.put(mad_lk)

    def flag(batch: pa.Table) -> pa.Table:
        lk = ray.get(h_mad)
        src = batch.column("source").to_pandas()
        m = src.map(lk).to_numpy().astype(np.int64)
        ad = batch.column("absdev").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "dev": batch.column("dev"),
                "is_outlier": pa.array(ad > k * m),
            }
        )

    return devs.map_batches(flag, batch_format="pyarrow")


def q_window_ohlc(sf_dir: str):
    """Per (event_type, 1h window) open/close/lo/hi value-cents — the
    streaming OHLC shape via combinable candidate partials; exact SQL twin
    (arg_min/arg_max with (ts, event_id) tiebreak)."""
    return events.window_ohlc(
        events_ds(sf_dir, ["event_id", "ts", "event_type", "value"])
    )


def q_funnel(sf_dir: str):
    """Ordered view->click->purchase conversion funnel — user counts per
    level with first-match-in-order semantics; exact SQL twin."""
    return events.funnel(events_ds(sf_dir, ["user_id", "ts", "event_type"]))


def q_tile_invalidate(sf_dir: str, zooms=(2, 6), n_buckets: int = 64):
    """Incremental tile invalidation — the recompute-the-delta composition
    the north rule's checkpoint/lineage story exists for: given a corpus
    delta (v2 snapshot), find every tile whose OLD content must re-render
    (tiles touched by mentions of changed-or-removed docs), counted per
    (z, tile_x, tile_y).

    Scale shape, stage by stage (TWO shuffles total — profiled at sf0.1
    the wall time was three serialized sort barriers, not CPU, so the
    diff-classify and the mention semi-join are FUSED into one exchange):
    * old docs, v2 docs and the old snapshot's mentions are all projected
      to compact side-tagged rows — the doc sides ship (id, FNV-128 of
      text), never the text (``corpus_diff``'s accepted collision class);
      the mention side ships (id, lat, lon) — and union into ONE
      doc-id-hash bucket shuffle;
    * each bucket classifies its ids with one lexsort over the two doc
      sides (dirty = changed-or-removed = old-side ids minus hash-equal
      pairs), filters its mentions to dirty ids, and immediately expands
      survivors through the real tile kernel (``assign_tiles``) into
      per-bucket (z, x, y) count partials — the delta stays a DATASET
      end to end (at 10^12 docs it is still billions; never a driver
      list or broadcast);
    * partials merge via the bucketed reduceat merge (``stages/bucketagg``,
      the second exchange, over distinct tile keys only).
    Exact SQL twin: the dirty predicate collapses to
    ``doc_id % 10 = 0 OR doc_id % 7 = 0`` over the points CTE.
    """
    from ..functions.vhash import fnv128_arrow
    from ..stages.bucketagg import bucketed_sum
    from ..stages.tiling import assign_tiles
    from .webgeo import mentions_ds

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    old = docs_ds(sf_dir, ["doc_id", "text"])
    new = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _v2_docs, batch_format="pyarrow", fn_kwargs={"n": n}
    )

    MIX = np.uint64(0x9E3779B97F4A7C15)

    def _jbucket(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * MIX) >> np.uint64(33)
                ).astype(np.int64) % n_buckets

    def tag_docs(side: int):
        def f(batch: pa.Table) -> pa.Table:
            s = batch.column("text")
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            hi, lo = fnv128_arrow(s)
            ids = batch.column("doc_id").to_numpy()
            m = len(ids)
            # overloaded narrow exchange: a/b carry the 128-bit content
            # hash on doc sides and BIT-CAST lat/lon float64s on the
            # mention side (view-cast, exact round trip)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "a": pa.array(hi.astype(np.int64), pa.int64()),
                "b": pa.array(lo.astype(np.int64), pa.int64()),
                "side": pa.array(np.full(m, side, np.int8), pa.int8()),
                "jbucket": pa.array(_jbucket(ids), pa.int64()),
            })
        return f

    def tag_mentions(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        m = len(ids)
        lat = batch.column("lat").to_numpy().astype(np.float64)
        lon = batch.column("lon").to_numpy().astype(np.float64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "a": pa.array(lat.view(np.int64), pa.int64()),
            "b": pa.array(lon.view(np.int64), pa.int64()),
            "side": pa.array(np.full(m, 2, np.int8), pa.int8()),
            "jbucket": pa.array(_jbucket(ids), pa.int64()),
        })

    def sift_expand(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "z": pa.array([], pa.int64()),
            "tile_x": pa.array([], pa.int64()),
            "tile_y": pa.array([], pa.int64()),
            "n_part": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        ids = g.column("doc_id").to_numpy()
        docs = side < 2
        di, ds_, dhi, dlo = (ids[docs], side[docs],
                             g.column("a").to_numpy()[docs],
                             g.column("b").to_numpy()[docs])
        order = np.lexsort((ds_, di))
        i, s = di[order], ds_[order]
        h1, h2 = dhi[order], dlo[order]
        first = np.ones(len(i), dtype=bool)
        first[1:] = i[1:] != i[:-1]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, len(i)))
        # dirty = old-side ids minus (both-sides AND hash-equal) pairs
        old_only = (runlen == 1) & (s[starts] == 0)
        both = runlen == 2
        bs = starts[both]
        changed = np.zeros(len(starts), dtype=bool)
        changed[both] = (h1[bs] != h1[bs + 1]) | (h2[bs] != h2[bs + 1])
        dirty_sorted = i[starts[old_only | changed]]  # sorted by build
        mm = side == 2
        keep = np.zeros(len(ids), dtype=bool)
        if dirty_sorted.size and mm.any():
            pos = np.searchsorted(dirty_sorted, ids[mm])
            pos_c = np.minimum(pos, dirty_sorted.size - 1)
            keep[mm] = (pos < dirty_sorted.size) & (
                dirty_sorted[pos_c] == ids[mm])
        if not keep.any():
            return empty
        pts = pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "lat": pa.array(g.column("a").to_numpy()[keep].view(np.float64),
                            pa.float64()),
            "lon": pa.array(g.column("b").to_numpy()[keep].view(np.float64),
                            pa.float64()),
        })
        t = assign_tiles(pts, zooms=list(zooms))
        z = t.column("z").to_numpy().astype(np.int64)
        x = t.column("tile_x").to_numpy().astype(np.int64)
        y = t.column("tile_y").to_numpy().astype(np.int64)
        order = np.lexsort((y, x, z))
        z_s, x_s, y_s = z[order], x[order], y[order]
        new_run = np.concatenate(
            [[True], (z_s[1:] != z_s[:-1]) | (x_s[1:] != x_s[:-1])
             | (y_s[1:] != y_s[:-1])])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(z_s))
        return pa.table({
            "z": pa.array(z_s[starts], pa.int64()),
            "tile_x": pa.array(x_s[starts], pa.int64()),
            "tile_y": pa.array(y_s[starts], pa.int64()),
            "n_part": pa.array(ends - starts, pa.int64()),
        })

    partials = (
        old.map_batches(tag_docs(0), batch_format="pyarrow")
        .union(
            new.map_batches(tag_docs(1), batch_format="pyarrow"),
            mentions_ds(sf_dir).map_batches(tag_mentions,
                                            batch_format="pyarrow"))
        .groupby("jbucket")
        .map_groups(lambda g: sift_expand(g.drop_columns(["jbucket"])),
                    batch_format="pyarrow")
    )

    return bucketed_sum(
        partials, ["z", "tile_x", "tile_y"], [("n_part", "n_affected")],
    )


def q_delta_dedup(sf_dir: str, n_buckets: int | None = None):
    """Dedup the DELTA against the existing corpus — the recurring-crawl
    companion of ``exact_dedup``: newly added docs (planted: every
    ``doc_id % 13 == 0`` re-enters as id ``n + doc_id`` with its old text)
    are matched against the OLD corpus by content; output
    ``(new_id, old_id)`` with old_id = the min content-equal old doc.

    Scale shape: both sides project to (id, FNV-128) — the new side never
    re-hashes the old corpus' text storage, only its ids+hashes move; ONE
    side-tagged content-hash bucket shuffle; in-group matching is a sorted
    searchsorted probe (old side sorted by (hash, id), so min-id-per-hash
    is positional).  Hash equality stands in for text equality (the dedup
    suite's accepted FNV-128 collision class; the oracle joins on the text
    itself)."""
    from ..functions.vhash import fnv128_arrow
    from .flagship import shuffle_partitions

    if n_buckets is None:
        n_buckets = shuffle_partitions()
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def project(side: int):
        def f(batch: pa.Table) -> pa.Table:
            s = batch.column("text")
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            ids = batch.column("doc_id").to_numpy()
            if side == 1:
                keep = ids % 13 == 0
                sel = pa.array(keep)
                s = s.filter(sel)
                ids = ids[keep] + n
            hi, lo = fnv128_arrow(s)
            m = len(ids)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "h_hi": pa.array(hi.astype(np.int64), pa.int64()),
                "h_lo": pa.array(lo.astype(np.int64), pa.int64()),
                "side": pa.array(np.full(m, side, np.int8), pa.int8()),
                "bucket": pa.array(
                    (hi % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
            })

        return f

    def match(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        ids = g.column("doc_id").to_numpy()
        hi = g.column("h_hi").to_numpy()
        lo = g.column("h_lo").to_numpy()
        om = side == 0
        o_order = np.lexsort((ids[om], lo[om], hi[om]))
        ohi, olo, oid = hi[om][o_order], lo[om][o_order], ids[om][o_order]
        # first row of each (hi, lo) run = min old id for that content
        first = np.concatenate(
            [[True], (ohi[1:] != ohi[:-1]) | (olo[1:] != olo[:-1])])
        ohi_f, olo_f, oid_f = ohi[first], olo[first], oid[first]
        nm = ~om
        nhi, nlo, nid = hi[nm], lo[nm], ids[nm]
        if not len(nid) or not len(oid_f):
            return pa.table({"new_id": pa.array([], pa.int64()),
                             "old_id": pa.array([], pa.int64())})
        # two-key searchsorted on (hi, lo) via a sorted structured array
        o_struct = np.empty(len(ohi_f), dtype=[("hi", np.int64), ("lo", np.int64)])
        o_struct["hi"], o_struct["lo"] = ohi_f, olo_f
        n_struct = np.empty(len(nhi), dtype=[("hi", np.int64), ("lo", np.int64)])
        n_struct["hi"], n_struct["lo"] = nhi, nlo
        pos = np.searchsorted(o_struct, n_struct)
        pos_c = np.minimum(pos, len(o_struct) - 1)
        hit = (pos < len(o_struct)) & (o_struct[pos_c] == n_struct)
        return pa.table({
            "new_id": pa.array(nid[hit], pa.int64()),
            "old_id": pa.array(oid_f[pos_c[hit]], pa.int64()),
        })

    docs = docs_ds(sf_dir, ["doc_id", "text"])
    tagged = docs.map_batches(project(0), batch_format="pyarrow").union(
        docs.map_batches(project(1), batch_format="pyarrow"))
    return tagged.groupby("bucket").map_groups(match, batch_format="pyarrow")


def q_corpus_diff(sf_dir: str):
    """Incremental snapshot diff: old vs deterministically-derived v2
    corpus -> per-id added/removed/changed/same, one side-tagged
    hash-bucket shuffle.  Exact SQL twin (full outer join on doc_id with
    direct text comparison)."""
    from ..stages.incremental import corpus_diff

    import pyarrow.parquet as pq2

    n = pq2.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    old = docs_ds(sf_dir, ["doc_id", "text"])
    new = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _v2_docs, batch_format="pyarrow", fn_kwargs={"n": n}
    )
    return corpus_diff(old, new)


def q_ivm_counts(sf_dir: str):
    """INCREMENTAL VIEW MAINTENANCE: the per-lang (n_docs, n_chars) view
    of the v2 snapshot computed WITHOUT scanning v2 — one pass over v1
    emits the base contributions PLUS the compensating deltas of the
    deterministic change feed (removed d%10==0: -1/-len; changed d%7==0
    survivors: +3 chars for the ' v2' suffix; added d%13==0: +1 under the
    synthetic lang 'xx'), one groupby-sum merges base and delta, groups
    maintained down to zero docs drop out.  The oracle aggregates the v2
    snapshot DIRECTLY — agreement proves the maintenance algebra, which
    is the whole point of IVM.  Same change feed as ``corpus_diff``."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def contrib(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lang = np.asarray(batch.column("lang").to_pandas(), dtype=object)
        ln = pc.utf8_length(batch.column("text")).to_numpy().astype(np.int64)
        removed = d % 10 == 0
        changed = (d % 7 == 0) & ~removed
        added = d % 13 == 0
        langs = [lang, lang[removed], lang[changed]]
        dn = [np.ones(len(d), np.int64),
              np.full(int(removed.sum()), -1, np.int64),
              np.zeros(int(changed.sum()), np.int64)]
        dc = [ln, -ln[removed], np.full(int(changed.sum()), 3, np.int64)]
        if added.any():
            fresh = np.array(
                [len(f"fresh doc {x}") for x in d[added]], np.int64)
            langs.append(np.full(int(added.sum()), "xx", dtype=object))
            dn.append(np.ones(int(added.sum()), np.int64))
            dc.append(fresh)
        df = pd.DataFrame({
            "lang": np.concatenate(langs),
            "dn": np.concatenate(dn),
            "dc": np.concatenate(dc),
        })
        agg = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    merged = (
        docs_ds(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(contrib, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("dn", alias_name="n_docs"),
                   Sum("dc", alias_name="n_chars"))
    )

    def drop_empty(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return batch.filter(pc2.not_equal(batch.column("n_docs"), 0))

    return merged.map_batches(drop_empty, batch_format="pyarrow")


def q_canonical_docs(sf_dir: str):
    """End-to-end dedup pipeline composition: planted corpus -> MinHash
    signatures -> LSH candidate pairs -> connected components -> canonical
    (min-id) representative per doc.  The planted construction (siblings
    2d/2d+1 with identical shingle sets, disjoint across d) makes the
    component structure exact, so the whole composed pipeline sits under a
    closed-form SQL oracle."""
    sigs = dedup.minhash_signatures(planted_text_ds(sf_dir))
    pairs = dedup.lsh_candidate_pairs(sigs)
    return dedup.connected_components(pairs)


def q_rare_bigrams(sf_dir: str):
    """Per-doc rare-bigram counting (n-gram LM quality-filter core):
    broadcast the heavy-hitter common set, count per-doc misses."""
    return text.rare_bigram_rate(docs_ds(sf_dir, ["doc_id", "text"]), min_count=5)


def q_bigram_stats(sf_dir: str):
    """Collocation (PMI-core) bigram/unigram counts, min_count=5 —
    integer-only output so the SQL twin is exact."""
    return text.bigram_stats(docs_ds(sf_dir, ["doc_id", "text"]), min_count=5)


def q_retention(sf_dir: str):
    """Weekly cohort retention matrix over events — exact SQL twin; the
    user-hash bucket makes it join-free and distinct-shuffle-free."""
    return events.retention(events_ds(sf_dir, ["user_id", "ts"]))


def link_graph(sf_dir: str) -> tuple[ray.data.Dataset, int]:
    """The deterministic synthetic link graph every graph query shares:
    doc d links to (d*d + a) % N for a in (7, 13, 29) — quadratic maps
    give varied in-degree so ranks/cores/distances differentiate.
    Returns (edges Dataset (src, dst), n_nodes)."""
    import pyarrow.parquet as pq2

    n = pq2.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        src = np.concatenate([d, d, d])
        dst = np.concatenate([(d * d + a) % n for a in (7, 13, 29)])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    e = docs_ds(sf_dir, ["doc_id"]).map_batches(edges, batch_format="pyarrow")
    return e, n


def q_pagerank(sf_dir: str, iters: int = 5):
    """Integer fixed-point PageRank (5 unrolled iterations) over the
    shared :func:`link_graph`.  Exact SQL twin (floor-division
    arithmetic).  Dispatches to the bucketed no-driver-state path when V
    exceeds the broadcast budget (``graph.BROADCAST_MAX_NODES``)."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    if n > graph.BROADCAST_MAX_NODES:
        return graph.pagerank_bucketed(e, n_nodes=n, iters=iters)
    return ray.data.from_pandas(graph.pagerank_int(e, n_nodes=n, iters=iters))


def q_pagerank_bucketed(sf_dir: str, iters: int = 5):
    """:func:`q_pagerank` FORCED through the bucketed scale-out path —
    rank state as a hash-partitioned sparse Dataset, 2 exchanges per
    iteration, zero V-sized driver vectors (``graph.pagerank_bucketed``).
    Same oracle as ``pagerank`` (the two paths are bitwise identical)."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    return graph.pagerank_bucketed(e, n_nodes=n, iters=iters)


def q_triangles(sf_dir: str):
    """Exact triangle count over the shared :func:`link_graph`, via the
    degree-ordered node-iterator (``graph.triangle_count``).  Dispatches
    to the bucketed path past the broadcast V budget."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    if n > graph.BROADCAST_MAX_NODES:
        return graph.triangles_bucketed(e, n_nodes=n)
    return graph.triangle_count(e, n_nodes=n)


def q_triangles_bucketed(sf_dir: str):
    """:func:`q_triangles` FORCED through the bucketed path — degree table
    as a Dataset attached via two side-tagged exchanges, orientation by
    direct (deg, id) comparison, no V-sized driver vectors
    (``graph.triangles_bucketed``).  Same oracle as ``triangles``."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    return graph.triangles_bucketed(e, n_nodes=n)


def q_weighted_sample(sf_dir: str):
    """Deterministic importance sampling: keep probability proportional to
    doc length (weight_bp = min(n_chars*20, 9999)) via the SQL-mirrorable
    Mersenne-61 hash — exact oracle, no shuffle, reproducible."""
    from ..stages.sampling import weighted_sample

    def w(batch):
        return np.minimum(
            batch.column("n_chars").to_numpy().astype(np.int64) * 20, 9999
        )

    return weighted_sample(
        docs_ds(sf_dir, ["doc_id", "lang", "n_chars"]), w, key_col="doc_id"
    )


def q_mixture_sample(sf_dir: str, total: int = 100):
    """Data mixing (Pile/DoReMi reshaping): sample so the output follows
    TARGET source weights (1000 + 2000*i bp over sources sorted asc), not
    the observed mix — largest-remainder apportionment over the weights,
    capped at each stratum's size, M61-hash rank within stratum."""
    from ..stages.sampling import proportional_sample

    srcs = sorted(set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").to_pylist()
    ))
    target = {s: 1000 + 2000 * i for i, s in enumerate(srcs)}
    return proportional_sample(docs_ds(sf_dir, ["doc_id", "source"]),
                               "source", "doc_id", total=total,
                               target_bp=target)


def q_fastss_pairs(sf_dir: str):
    """Typo-squat detection: host pairs at edit distance exactly 1 via
    FastSS deletion-neighborhood blocking + exact DP verify; DuckDB
    levenshtein twin over the distinct host set."""
    from ..stages.dedup import fastss_pairs

    def hosts(batch: pa.Table) -> pa.Table:
        k = np.unique(batch.column("doc_id").to_numpy() % 997)
        return pa.table({
            "host": pa.array([f"example{int(v)}.com" for v in k], pa.string())
        })

    return fastss_pairs(
        docs_ds(sf_dir, ["doc_id"]).map_batches(hosts, batch_format="pyarrow"),
        col="host",
    )


def q_proportional_sample(sf_dir: str, total: int = 100):
    """Largest-remainder proportional stratified sample (100 docs across
    langs, zero allocation drift); M61-hash rank twin."""
    from ..stages.sampling import proportional_sample

    return proportional_sample(docs_ds(sf_dir, ["doc_id", "lang"]),
                               "lang", "doc_id", total=total)


def q_source_median_dev(sf_dir: str):
    """Per-source median broadcast join-back: each doc's deviation from its
    source's exact median length.  The aggregate side is the histogram-
    partial quantile (O(distinct values) per group), the join-back is a
    broadcast map — no row-level shuffle at any point."""
    from ..stages import events as E

    med = (
        E.grouped_quantiles(docs_ds(sf_dir, ["source", "n_chars"]),
                            "source", "n_chars", qs=(0.5,))
        .to_pandas()  # post-aggregation: one row per source
    )
    lookup = dict(zip(med["source"], med["p50"].astype(np.int64)))
    handle = ray.put(lookup)

    def dev(batch: pa.Table) -> pa.Table:
        lk = ray.get(handle)
        src = batch.column("source").to_pandas()
        meds = src.map(lk).to_numpy().astype(np.int64)
        d = batch.column("n_chars").to_numpy().astype(np.int64) - meds
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "dev": pa.array(d, pa.int64()),
            }
        )

    return docs_ds(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        dev, batch_format="pyarrow"
    )


def q_hll_users(sf_dir: str):
    """HyperLogLog register table (p=8) for distinct users per event type —
    EXACT oracle: the Mersenne-61 multiplicative hash and trailing-zero rho
    are integer-for-integer mirrorable in DuckDB HUGEINT arithmetic, so the
    sketch itself (not just its estimate) is correctness-gated."""
    from ..stages import sketch

    return sketch.hll_registers(
        events_ds(sf_dir, ["event_type", "user_id"]), "event_type", "user_id", p=8
    )


def q_quantiles_by_lang(sf_dir: str):
    """Exact per-language length quantiles (p50/p90/p99) via distributed
    histogram partials — per-group state is O(distinct lengths), never
    O(rows); matches DuckDB quantile_disc exactly."""
    from ..stages import events

    return events.grouped_quantiles(
        docs_ds(sf_dir, ["lang", "n_chars"]), "lang", "n_chars"
    )


def q_dup_spans(sf_dir: str):
    """Exact duplicated-substring detection (Lee et al. 2022 detection
    pass, stride-16 32-char windows) — per-doc count of windows whose
    content recurs in another document; exact SQL twin."""
    return dedup.dup_spans(docs_ds(sf_dir, ["doc_id", "text"]))


def q_vocab_topk(sf_dir: str, k: int = 50):
    """Corpus-wide top-k vocabulary with deterministic tie-break —
    heavy-hitter aggregation, exact SQL twin."""
    return text.vocab_topk(docs_ds(sf_dir, ["doc_id", "text"]), k=k)


def q_bpe_pairs(sf_dir: str, k: int = 20):
    """BPE merge-round pair counting (bounded-domain histogram shuffle)."""
    return text.bpe_pair_counts(docs_ds(sf_dir, ["doc_id", "text"]), k=k)


def q_keyword_topk(sf_dir: str, k: int = 10):
    """Inverted-search scoring: top-k docs by summed query-term tf."""
    return text.keyword_topk(docs_ds(sf_dir, ["doc_id", "text"]), k=k)


def q_pack_sequences(sf_dir: str, max_tokens: int = 2048):
    """LLM sequence packing via distributed prefix sum — integer-exact
    window-function oracle (docs laid end-to-end in doc_id order, each
    assigned to the sequence holding its first token)."""
    return text.pack_sequences(
        docs_ds(sf_dir, ["doc_id", "text"]), max_tokens=max_tokens
    )


def q_decontaminate(sf_dir: str, k: int = 3, mod: int = 97):
    """Benchmark decontamination: flag docs containing any probe k-gram
    (probes = first k words of every doc_id % mod == 0 doc, so the query
    is self-contained and the oracle re-derives the probe set in SQL)."""
    probes = dedup.probe_gram_hashes(
        docs_ds(sf_dir, ["doc_id", "text"]), k=k, mod=mod
    )
    return dedup.decontaminate(
        docs_ds(sf_dir, ["doc_id", "text"]), ray.put(probes), k=k
    )


def q_partitioned_roundtrip(sf_dir: str):
    """Hive-partitioned parquet round trip: write documents partitioned by
    lang (the resumable-output layout — one directory per partition), then
    read back ONLY the 'en' partition with column pruning and aggregate
    per source.  Exercises partition pruning at the read (a directory
    filter, zero bytes from other langs) — the layout every 100-TB rerun
    depends on.  Oracle: direct filtered aggregate."""
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    out = tempfile.mkdtemp(prefix="pr_docs_")
    try:
        docs_ds(sf_dir, ["doc_id", "lang", "source", "n_chars"]).write_parquet(
            out, partition_cols=["lang"])
        part = ray.data.read_parquet(
            f"{out}/lang=en", columns=["source", "n_chars"])

        def partial(batch: pa.Table) -> pa.Table:
            df = (
                pd.DataFrame({
                    "source": np.asarray(batch.column("source").to_pandas(),
                                         dtype=object),
                    "n_chars": batch.column("n_chars").to_numpy(),
                })
                .groupby("source", as_index=False)
                .agg(n_part=("n_chars", "size"), chars_part=("n_chars", "sum"))
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        return (
            part.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_part", alias_name="n_docs"),
                       Sum("chars_part", alias_name="sum_chars"))
            .materialize()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_window_deltas(sf_dir: str):
    """Hour-over-hour deltas per event type (lag on an AGGREGATE): the
    trend table behind alerting.  The aggregate is the bounded tumbling
    window (partials -> groupby-sum, state <= types x hours); the lag runs
    in ONE single-block pass over that small table.  lag() twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        win = batch.column("ts").cast(pa.int64()).to_numpy() // 3_600_000_000
        df = (
            pd.DataFrame({"event_type": et, "window_id": win})
            .groupby(["event_type", "window_id"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        events_ds(sf_dir, ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def deltas(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        win = batch.column("window_id").to_numpy()
        n = batch.column("n").to_numpy()
        order = np.lexsort((win, et))
        et, win, n = et[order], win[order], n[order]
        same = np.zeros(len(et), bool)
        same[1:] = et[1:] == et[:-1]
        prev = np.full(len(et), -1, np.int64)
        prev[same] = n[np.flatnonzero(same) - 1]
        keep = same  # first window per type has no prior: dropped (lag NULL)
        return pa.table({
            "event_type": pa.array(et[keep].tolist(), pa.string()),
            "window_id": pa.array(win[keep], pa.int64()),
            "n": pa.array(n[keep], pa.int64()),
            "delta": pa.array(n[keep] - prev[keep], pa.int64()),
        })

    return agg.repartition(1).map_batches(deltas, batch_format="pyarrow")


def q_cusum_alert(sf_dir: str):
    """Change-point detection per event type: the max CUSUM statistic of
    hourly counts vs the global per-cell mean — via the CLOSED FORM
    max_t(prefix_t - min_{j<=t} prefix_j), so it's running-sum +
    running-min window algebra (no recursion, no sequential scan).  The
    windowed aggregate is bounded (types x hours); the scan runs in one
    block.  Window-function twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame({
                "event_type": np.asarray(
                    batch.column("event_type").to_pandas(), dtype=object),
                "window_id": batch.column("ts").cast(pa.int64()).to_numpy()
                // 3_600_000_000,
            })
            .groupby(["event_type", "window_id"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        events_ds(sf_dir, ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def cusum(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        win = batch.column("window_id").to_numpy()
        n = batch.column("n").to_numpy()
        k = int(n.sum()) // len(n)  # global mean per occupied cell (floor)
        order = np.lexsort((win, et))
        et, win, n = et[order], win[order], n[order]
        first = np.ones(len(et), bool)
        first[1:] = et[1:] != et[:-1]
        seg = np.cumsum(first) - 1
        x = n - k
        cum = np.cumsum(x)
        base = np.where(first, cum - x, 0)
        seg_base = base[np.flatnonzero(first)][seg]
        prefix = cum - seg_base           # per-type prefix of (n - k)
        # running min of {0, prefix_1..prefix_t} per type segment (the
        # closed-form denominator of CUSUM); bounded rows: types x hours
        rm = np.empty_like(prefix)
        cur = 0
        for i in range(len(prefix)):
            cur = min(0, prefix[i]) if first[i] else min(cur, prefix[i])
            rm[i] = cur
        s = prefix - rm
        rows = []
        for g in np.unique(seg):
            m = seg == g
            sm = s[m]
            best = int(sm.max())
            peak = int(win[m][np.flatnonzero(sm == best)[0]])
            rows.append((et[m][0], best, peak, k))
        return pa.table({
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "max_cusum": pa.array([r[1] for r in rows], pa.int64()),
            "peak_window": pa.array([r[2] for r in rows], pa.int64()),
            "ref_k": pa.array([r[3] for r in rows], pa.int64()),
        })

    return agg.repartition(1).map_batches(cusum, batch_format="pyarrow")


def q_benford_census(sf_dir: str):
    """Benford first-digit census of value cents per event type — the
    classic numeric-fraud audit, exact integers end to end (first digit by
    repeated integer division, vectorized; zero-cent rows excluded)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        keep = cents > 0
        cents, et = cents[keep], et[keep]
        d = cents.copy()
        while (d >= 10).any():
            m = d >= 10
            d[m] //= 10
        df = (
            pd.DataFrame({"event_type": et, "digit": d})
            .groupby(["event_type", "digit"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events_ds(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "digit"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def q_length_hist_sim(sf_dir: str, bucket: int = 64):
    """Distribution similarity between languages: histogram-intersection
    (sum of min bucket counts) of the doc-length distributions per lang
    pair — the integer-exact distribution-drift metric.  The histograms
    are a bounded aggregate (langs x length buckets); the pair matrix is a
    single-block pass over that small table.  least()-join twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame({
                "lang": np.asarray(batch.column("lang").to_pandas(),
                                   dtype=object),
                "b": batch.column("n_chars").to_numpy() // bucket,
            })
            .groupby(["lang", "b"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        docs_ds(sf_dir, ["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "b"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        langs = sorted(df["lang"].unique())
        piv = df.pivot_table(index="b", columns="lang", values="n",
                             fill_value=0, aggfunc="sum")
        rows = []
        for i in range(len(langs)):
            for j in range(i + 1, len(langs)):
                inter = int(np.minimum(piv[langs[i]].to_numpy(),
                                       piv[langs[j]].to_numpy()).sum())
                rows.append((langs[i], langs[j], inter))
        return pa.table({
            "lang_a": pa.array([r[0] for r in rows], pa.string()),
            "lang_b": pa.array([r[1] for r in rows], pa.string()),
            "n_common": pa.array([r[2] for r in rows], pa.int64()),
        })

    return hist.repartition(1).map_batches(pairs, batch_format="pyarrow")


def q_embed_dim_stats(sf_dir: str, fp: int = 16384):
    """Per-dimension embedding statistics in fixed point (floor(x * 2^14))
    — the feature-drift / normalization audit over the vector store.
    Per-batch per-dim partials (sum/min/max over the batch matrix, one
    vectorized pass) -> ONE groupby over #dims rows.  Series-join twin."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False),
                       np.float64).reshape(batch.num_rows, -1)
        q = np.floor(m * fp).astype(np.int64)
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "n_part": pa.array(np.full(d, q.shape[0], np.int64), pa.int64()),
            "sum_part": pa.array(q.sum(axis=0), pa.int64()),
            "min_part": pa.array(q.min(axis=0), pa.int64()),
            "max_part": pa.array(q.max(axis=0), pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("sum_part", alias_name="sum_fp"),
            Min("min_part", alias_name="min_fp"),
            Max("max_part", alias_name="max_fp"),
        )
    )


def q_lang_overlap(sf_dir: str):
    """Cross-language vocabulary overlap matrix: for every lang pair, how
    many distinct tokens they share — the corpus-similarity table.  One
    (token -> lang bitmask) aggregate (per-batch OR partials), then a
    bincount over <= 2^langs masks; never a token-level self-join.
    Exact intersection twin."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import _flat_tokens

    langs = sorted(set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])
        .column("lang").to_pylist()))
    lidx = {l: i for i, l in enumerate(langs)}

    def or_by_token(tok: np.ndarray, bits: np.ndarray) -> pa.Table:
        order = np.lexsort((bits, tok))
        t, b = tok[order], bits[order]
        first = np.ones(len(t), bool)
        first[1:] = t[1:] != t[:-1]
        starts = np.flatnonzero(first)
        masks_arr = np.bitwise_or.reduceat(b, starts) if len(t) else b
        return pa.table({
            "token": pa.array(t[starts].tolist(), pa.string()),
            "mask_part": pa.array(masks_arr, pa.int64()),
        })

    def partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column("text").to_pandas())
        lab = np.asarray(batch.column("lang").to_pandas(), dtype=object)
        bit = np.repeat(
            np.array([1 << lidx[l] for l in lab], np.int64),
            np.asarray(lens, np.int64))
        tok = np.asarray(flat.to_pandas(), dtype=object)
        return or_by_token(tok, bit)

    # Ray has no BitOr aggregate, so the OR-combine of the (bounded,
    # vocabulary-sized) partial masks runs as token-hash BUCKETS with one
    # lexsort + bitwise_or.reduceat per bucket — never per-token groups.
    def tag_bucket(batch: pa.Table) -> pa.Table:
        from planetiler_ray.functions.vhash import fnv64_arrow

        tk = batch.column("token")
        if isinstance(tk, pa.ChunkedArray):
            tk = tk.combine_chunks()
        b = (fnv64_arrow(tk) % np.uint64(32)).astype(np.int64)
        return batch.append_column("bkt", pa.array(b, pa.int64()))

    masks = (
        docs_ds(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(tag_bucket, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(
            lambda g: or_by_token(
                np.asarray(g.column("token").to_pandas(), dtype=object),
                g.column("mask_part").to_numpy(),
            ).rename_columns(["token", "mask"]),
            batch_format="pyarrow",
        )
    )

    def pair_counts(batch: pa.Table) -> pa.Table:
        m = batch.column("mask").to_numpy()
        bc = np.bincount(m, minlength=1 << len(langs))
        rows = []
        for i in range(len(langs)):
            for j in range(i + 1, len(langs)):
                both = sum(int(bc[x]) for x in range(len(bc))
                           if (x >> i) & 1 and (x >> j) & 1)
                rows.append((langs[i], langs[j], both))
        return pa.table({
            "lang_a": pa.array([r[0] for r in rows], pa.string()),
            "lang_b": pa.array([r[1] for r in rows], pa.string()),
            "n_shared": pa.array([r[2] for r in rows], pa.int64()),
        })

    return masks.repartition(1).map_batches(pair_counts, batch_format="pyarrow")


def q_cube_counts(sf_dir: str):
    """OLAP CUBE over (lang, source): all four grouping sets — (lang,
    source), (lang), (source), () — computed in ONE pass: each batch emits
    partials for every grouping set with an '(all)' sentinel on the
    rolled-up dimension, then one groupby-sum.  GROUP BY CUBE twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": np.asarray(batch.column("lang").to_pandas(), dtype=object),
            "source": np.asarray(batch.column("source").to_pandas(),
                                 dtype=object),
            "n_chars": batch.column("n_chars").to_numpy(),
        })
        outs = []
        for keep_lang, keep_src in ((True, True), (True, False),
                                    (False, True), (False, False)):
            g = df.copy()
            if not keep_lang:
                g["lang"] = "(all)"
            if not keep_src:
                g["source"] = "(all)"
            outs.append(
                g.groupby(["lang", "source"], as_index=False)
                .agg(n_part=("n_chars", "size"),
                     chars_part=("n_chars", "sum"))
            )
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    return (
        docs_ds(sf_dir, ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_part", alias_name="n_docs"),
                   Sum("chars_part", alias_name="sum_chars"))
    )


def q_dedup_by_source(sf_dir: str):
    """Dedup impact report: per source, total docs vs distinct contents —
    the "how much of this crawl is boilerplate" census.  Per-batch
    (source, 128-bit content hash) partials -> ONE groupby over distinct
    (source, hash) -> tiny per-source rollup; COUNT(DISTINCT text) twin."""
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import add_content_hash

    def partial(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch)
        df = (
            b.select(["source", "hash_hi", "hash_lo"])
            .to_pandas()
            .groupby(["source", "hash_hi", "hash_lo"], as_index=False)
            .size()
        )
        return pa.Table.from_pandas(df.rename(columns={"size": "n_part"}),
                                    preserve_index=False)

    return (
        docs_ds(sf_dir, ["doc_id", "text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "hash_hi", "hash_lo"])
        .aggregate(Sum("n_part", alias_name="n"))
        .groupby("source")
        .aggregate(Count(alias_name="n_unique"), Sum("n", alias_name="n_docs"))
    )


def q_ab_assign(sf_dir: str, arms: int = 4):
    """A/B experiment census: users assigned to ``arms`` buckets by the
    M61 hash, per-arm distinct users and purchase events — the
    deterministic experiment-slicing primitive.  Per-batch partials over
    (arm, user) -> distinct-user groupby -> tiny arm rollup."""
    from ray.data.aggregate import Count, Sum

    from ..stages.sketch import hash61

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        arm = (hash61(uid) % arms).astype(np.int64)
        buys = (np.asarray(batch.column("event_type").to_pandas()) ==
                "purchase").astype(np.int64)
        df = (
            pd.DataFrame({"arm": arm, "user_id": uid, "buys": buys})
            .groupby(["arm", "user_id"], as_index=False)["buys"].sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events_ds(sf_dir, ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["arm", "user_id"])
        .aggregate(Sum("buys", alias_name="n_buys"))
        .groupby("arm")
        .aggregate(Count(alias_name="n_users"), Sum("n_buys", alias_name="n_purchases"))
    )


def q_split_leakage(sf_dir: str):
    """Train->test k-gram contamination audit over the dataset_split rule;
    EXISTS-semijoin SQL twin (gram strings vs 64-bit shingle hashes —
    divergence needs an FNV collision, the accepted class)."""
    return dedup.split_leakage(docs_ds(sf_dir, ["doc_id", "text"]))


def q_doc_repetition(sf_dir: str):
    """Within-doc duplicate-shingle ratio (boilerplate quality signal) —
    per-doc metric, embarrassingly parallel, exact-integer oracle."""
    return docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        text.doc_repetition, batch_format="pyarrow"
    )


def q_tfidf_topk(sf_dir: str, k: int = 3):
    """Per-doc top-k keywords by tf-idf.

    Two-pass broadcast design: (1) DF pass — per-batch partial (term,
    count-of-docs) aggregates -> ONE small groupby-sum over the
    vocabulary (bounded by the language, not the corpus); (2) scoring
    pass — the DF table is ``ray.put`` once and each ``TfIdfTopK`` actor
    builds its lookup in ``__init__``, then per-batch vectorized scoring
    + lexsort top-k.  No all-to-all over the doc-term explosion.
    """
    from ..stages.text import TfIdfTopK, doc_term_freq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = docs_ds(sf_dir, ["doc_id", "text"])

    def partial_df(batch: pa.Table) -> pa.Table:
        t = doc_term_freq(batch)  # (doc, term) distinct by construction
        return t.group_by("term").aggregate([("doc_id", "count")]).rename_columns(
            ["term", "n"]
        )

    df_pd = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
        .to_pandas()  # vocab-sized (small side), not the corpus
    )
    handle = ray.put(
        pa.table(
            {
                "term": pa.array(df_pd["term"], pa.string()),
                "df": pa.array(df_pd["sum(n)"].to_numpy(np.int64), pa.int64()),
            }
        )
    )
    return ds.map_batches(
        TfIdfTopK,
        fn_constructor_kwargs={"df_handle": handle, "n_docs": n_docs, "k": k},
        concurrency=(1, 8),
        num_cpus=0.5,
        batch_format="pyarrow",
    )


def q_langid(sf_dir: str):
    """Heuristic language guess (exact oracle: the marker-count argmax is
    deterministic integer logic, mirrored in ``oracle.sql_langid``)."""
    return docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        text.langid_ngram, batch_format="pyarrow"
    )


def q_rare_postings(sf_dir: str):
    """Inverted-index postings for rare tokens (df <= 400): token -> df +
    sorted posting list; string_agg twin."""
    return text.rare_postings(docs_ds(sf_dir, ["doc_id", "text"]))


def q_langs_above_median(sf_dir: str):
    """Aggregate-of-aggregate HAVING: languages whose median doc length
    exceeds the CORPUS median — two exact histogram-quantile passes (the
    global one is the per-group machinery with a constant key), joined by
    a driver-side scalar broadcast, never a row-level shuffle."""
    from ..stages import events as E

    glob = E.grouped_quantiles(
        docs_ds(sf_dir, ["lang", "n_chars"]).map_batches(
            lambda b: pa.table({"all": pa.array(["x"] * b.num_rows),
                                "n_chars": b.column("n_chars")}),
            batch_format="pyarrow"),
        "all", "n_chars", qs=(0.5,)).to_pandas()
    g_med = int(glob["p50"].iloc[0])
    per = E.grouped_quantiles(docs_ds(sf_dir, ["lang", "n_chars"]),
                              "lang", "n_chars", qs=(0.5,))
    return (
        per.filter(expr=f"p50 > {g_med}")
        .map_batches(
            lambda b: pa.table({"lang": b.column("lang"),
                                "median_len": b.column("p50")}),
            batch_format="pyarrow")
    )


def q_langid_confusion(sf_dir: str):
    """Language-ID QA confusion matrix: declared ``lang`` x heuristic
    ``lang_guess``, counted — the label-quality audit every classifier
    pipeline reports.  Per-batch classify + partial pivot counts -> ONE
    tiny groupby-sum (state <= langs x guesses)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = text.langid_ngram(batch)
        t = pa.table({"lang": batch.column("lang"),
                      "lang_guess": g.column("lang_guess")})
        agg = t.group_by(["lang", "lang_guess"]).aggregate([("lang", "count")])
        return pa.table({
            "lang": agg.column("lang"),
            "lang_guess": agg.column("lang_guess"),
            "n_part": agg.column("lang_count"),
        })

    return (
        docs_ds(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_guess"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def _query_vectors(sf_dir: str, n: int = 10):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mask = ids < n
    mat = np.stack(t.column("embedding").to_pylist())[mask].astype(np.float64)
    return ids[mask], mat


def q_ann_brute(sf_dir: str):
    handle = ray.put(_query_vectors(sf_dir))
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    return ann.brute_topk(embs, handle, k=5)


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k (rows-only: approximate by design)."""
    q = _query_vectors(sf_dir)
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    sample = np.stack(embs.limit(2048).to_pandas()["embedding"].to_numpy()).astype(np.float64)
    cent = ann.train_centroids(sample)
    return ann.ivf_topk(embs, ray.put(q), ray.put(cent), k=5)


def q_ann_pq(sf_dir: str):
    """IVFADC-style PQ top-k (rows-only: approximate by design; recall
    pinned against brute_topk by unit test)."""
    q = _query_vectors(sf_dir)
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    sample = np.stack(embs.limit(2048).to_pandas()["embedding"].to_numpy()).astype(np.float64)
    books = ann.train_pq(sample, n_subspaces=8, n_codes=64)
    return ann.pq_topk(embs, ray.put(q), ray.put(books), k=5)


def _plant_siblings(batch: pa.Table) -> pa.Table:
    """Deterministic planted near-dups: every vector gains a sibling
    (vec_id + 1_000_000) displaced by a tiny splitmix-hash perturbation —
    fully vectorized (one integer-mix over an (n, dim) grid; no per-row
    RNG objects).  Noise amplitude ±0.01/dim keeps sibling cosine >> tau
    while leaving unrelated random vectors near-orthogonal."""
    ids = batch.column("vec_id").to_numpy()
    mat = ann._to_matrix(batch).astype(np.float32)
    dim = mat.shape[1]
    with np.errstate(over="ignore"):
        h = (
            ids.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
        ) ^ (np.arange(dim, dtype=np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9))
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    pert = mat + ((u - 0.5) * 0.02).astype(np.float32)
    out_ids = np.concatenate([ids, ids + 1_000_000])
    out_mat = np.concatenate([mat, pert])
    return pa.table(
        {
            "vec_id": pa.array(out_ids, pa.int64()),
            "embedding": pa.array(list(out_mat), pa.list_(pa.float32())),
        }
    )


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (rows-only: bucketed approximation).

    Random vectors are near-orthogonal, so to demonstrate the operator the
    query plants near-duplicates via :func:`_plant_siblings`; the operator
    should recover exactly those pairs."""
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_plant_siblings, batch_format="pyarrow")
    return ann.embedding_neardup(embs, tau=0.99, count_hint=2 * n_rows)


def q_corpus_clean(sf_dir: str, min_quality_bp: int = 2000, sample_mod: int = 4):
    """Composed curation pipeline — the canonical training-data flow:
    quality filter -> exact dedup (keep min doc_id per content group) ->
    deterministic hash sample.  Every step integer-exact, full SQL twin.
    Output: keep_id, n_dups (count of qualifying duplicates)."""
    import pyarrow as pa

    from ..stages import text as T

    def keep_quality(batch: pa.Table) -> pa.Table:
        q = T.quality_score(batch)
        m = q.column("quality_bp").to_numpy() >= min_quality_bp
        return batch.filter(pa.array(m))

    ds = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        keep_quality, batch_format="pyarrow"
    )
    deduped = dedup.exact_dedup(ds)

    def sample(batch: pa.Table) -> pa.Table:
        k = batch.column("keep_id").to_numpy()
        m = (k * 2654435761 % 4294967296) % sample_mod == 0
        return pa.table(
            {
                "keep_id": batch.column("keep_id").filter(pa.array(m)),
                "n_dups": batch.column("n_dups").filter(pa.array(m)),
            }
        )

    return deduped.map_batches(sample, batch_format="pyarrow")


def q_ngram_jaccard(sf_dir: str, n: int = 4, threshold: float = 0.3):
    """Exact character-n-gram Jaccard pairs (the char-shingle variant of
    :func:`q_jaccard_pairs`) on a deterministic 1/25 sample — SQL twin
    enumerates substrings positionally."""
    import pyarrow as pa

    def sample(batch: pa.Table) -> pa.Table:
        keep = batch.column("doc_id").to_numpy() % 25 == 0
        return batch.filter(pa.array(keep))

    ds = docs_ds(sf_dir, ["doc_id", "text"]).map_batches(sample, batch_format="pyarrow")
    return dedup.jaccard_pairs(ds, threshold=threshold,
                               tokenize=lambda s: dedup.char_ngrams(s, n))


def q_neardup_planted(sf_dir: str):
    """Exact-oracle variant of :func:`q_embedding_neardup`: with planted
    sibling pairs (:func:`_plant_siblings`) the correct answer is EXACTLY
    {(v, v+1e6)}; centroids are trained from a deterministic sample
    (parquet head, bounded driver read) so the bucketing — and hence full
    recall — is reproducible."""
    meta = pq.read_metadata(f"{sf_dir}/embeddings.parquet")
    sample = np.stack(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .slice(0, 2048)
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    n_clusters = int(max(16, np.ceil(2 * meta.num_rows / 512)))
    cent = ann.train_centroids(sample, n_clusters)
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_plant_siblings, batch_format="pyarrow")
    # cap high enough that no in-bucket recursive split can ever separate a
    # sibling pair at gate scales (buckets are ~n_probe*N/n_clusters ~ 1k)
    return ann.embedding_neardup(
        embs, tau=0.99, centroids=cent, cap=1 << 17
    ).select_columns(["a", "b"])


def _hadamard8() -> np.ndarray:
    h = np.array([[1.0]])
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    return h


def q_pq_planted(sf_dir: str, k: int = 5):
    """Exact-oracle twin of :func:`q_ann_pq` — the PQ/ADC scan machinery
    (encode -> LUT gather-sum -> candidate cut -> exact rescore -> merge)
    on a corpus where ADC IS exact, so the answer equals brute top-k and
    has a pure-integer SQL twin.

    Construction: vector v = concat of 8 Hadamard rows H[j_s] with
    j_s = (vec_id >> 3s) & 7 — every vector has norm exactly 8, so the
    normalized subvectors are EXACTLY the codebook entries H/8 (encode
    distance 0, Hadamard orthogonality separates codes cleanly).  Query m
    is built so q_m . v = sum_s ((j_s + m) % 8) * 9^s — a base-9 positional
    integer, distinct for every vec_id < 8^8, so the ADC candidate cut and
    the exact rescore agree bit-for-bit and ties never arise.  Codebooks
    are passed directly (training itself is pinned by unit tests against
    brute recall); the full :func:`stages.ann.pq_topk` scan path runs
    unmodified."""
    H = _hadamard8()
    books = np.repeat(H[None] / 8.0, 8, axis=0)  # (n_sub=8, n_codes=8, 8)
    q_ids = np.arange(9_000_001, 9_000_005, dtype=np.int64)
    q_mat = np.stack([
        np.concatenate([
            H @ np.array([((j + m) % 8) * 9 ** s for j in range(8)],
                         dtype=np.float64) / 8.0
            for s in range(8)
        ])
        for m in range(4)
    ])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        js = (ids[:, None] >> (3 * np.arange(8, dtype=np.int64))[None, :]) & 7
        mat = H[js].reshape(len(ids), 64)  # (n, 8, 8) -> (n, 64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(mat.astype(np.float32)),
                                      pa.list_(pa.float32())),
            }
        )

    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(plant, batch_format="pyarrow")
    return ann.pq_topk(embs, ray.put((q_ids, q_mat)), ray.put(books), k=k)


def q_chunk_documents(sf_dir: str):
    """Fixed-size overlapping document chunking (256 chars, 64 overlap) —
    the context-window prep op; exact substr oracle."""
    return text.chunk_documents(docs_ds(sf_dir, ["doc_id", "text"]))


def q_vocab_growth(sf_dir: str, n_buckets_out: int = 10):
    """Heaps'-law vocabulary GROWTH curve over the EXTRACTED page text
    (coordinate tokens keep arriving through the whole corpus, so the
    curve is non-trivial — documents.text alone has a ~31-word closed
    vocabulary): how many distinct tokens first appear in each doc-id
    decile, and cumulatively — the "does more data still add vocabulary"
    scaling diagnostic.  Scale shape: per-batch (token, min doc_id)
    partials -> ONE token groupby min (the only big exchange; state =
    distinct tokens) -> decile bucketing -> a <=10-row census with a
    cumulative pass.  Exact SQL twin (unnest over the reconstructed page
    text + min + window cumsum)."""
    import pyarrow.parquet as pq2
    from ray.data.aggregate import Min, Sum

    from .webgeo import extracted_pages_ds

    n = pq2.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.dedup import _flat_tokens

        flat, lens = _flat_tokens(batch.column("extracted").to_pandas())
        did = np.repeat(batch.column("doc_id").to_numpy(), lens)
        df = pd.DataFrame({"token": flat.to_pandas(), "doc_id": did})
        agg = df.groupby("token", as_index=False)["doc_id"].min()
        agg = agg.rename(columns={"doc_id": "first_part"})
        return pa.Table.from_pandas(agg, preserve_index=False)

    firsts = (
        extracted_pages_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Min("first_part", alias_name="first_doc"))
    )

    def decile_partial(batch: pa.Table) -> pa.Table:
        fd = batch.column("first_doc").to_numpy()
        dec = fd * n_buckets_out // max(n, 1)
        u, c = np.unique(dec, return_counts=True)
        return pa.table({"decile": pa.array(u, pa.int64()),
                         "n_part": pa.array(c, pa.int64())})

    per_dec = (
        firsts.map_batches(decile_partial, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("n_part", alias_name="new_tokens"))
        .to_pandas()  # <= n_buckets_out rows
        .sort_values("decile", ignore_index=True)
    )
    per_dec["cum_tokens"] = per_dec["new_tokens"].cumsum()
    return ray.data.from_pandas(per_dec.astype(np.int64))


def q_reshard_moves(sf_dir: str, n_shards: int = 12):
    """Rendezvous (HRW) consistent-hashing reshard audit: each doc's
    shard is ``argmax over s of hash61(doc_id * 64 + s)``; growing the
    ring N -> N+1 should move only ~1/(N+1) of keys (HRW's
    minimal-disruption guarantee — the elastic-cluster resharding
    story).  Output per old shard: (shard_old, n_docs, n_moved).
    Embarrassingly parallel: one vectorized (B, N+1) hash argmax per
    batch, bounded partial census, tiny groupby.  The hash chain is
    ``stages.sketch.hash61``, mirrored integer-for-integer in SQL."""
    from ray.data.aggregate import Sum
    from ..stages.sketch import hash61

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        keys = d[:, None] * 64 + np.arange(n_shards + 1)[None, :]
        h = hash61(keys.reshape(-1)).reshape(len(d), n_shards + 1)
        old = np.argmax(h[:, :n_shards], axis=1)   # first max = smallest s
        new = np.argmax(h, axis=1)
        moved = (new != old).astype(np.int64)
        df = pd.DataFrame({"shard_old": old, "one": 1, "moved": moved})
        agg = df.groupby("shard_old", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        docs_ds(sf_dir, ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard_old")
        .aggregate(Sum("one", alias_name="n_docs"),
                   Sum("moved", alias_name="n_moved"))
    )


def q_dataset_split(sf_dir: str):
    """Deterministic 98/1/1 train/val/test split by the SQL-mirrorable
    M61 hash — reproducible, shuffle-free, stratified in expectation."""
    from ..stages.sampling import dataset_split

    return dataset_split(docs_ds(sf_dir, ["doc_id", "lang"]), key_col="doc_id")


def q_table_profile(sf_dir: str):
    """Per-column profiling of documents (nulls / exact distincts /
    lexicographic min-max over value strings) — ONE shuffle for all
    columns; exact SQL twin (CAST-to-VARCHAR semantics on both sides)."""
    from ..stages.profiling import table_profile

    return table_profile(
        docs_ds(sf_dir, ["lang", "source", "n_chars"]),
        ["lang", "source", "n_chars"],
    )


def q_media_phash(sf_dir: str):
    """Per-item 64-bit perceptual hash over the (stub-decoded) media path
    (rows-only: the DCT is float math with no finite SQL mirror;
    noise-invariance/discrimination/determinism pinned by unit tests)."""
    from ..stages import multimodal as M

    return M.image_phash_pipeline(docs_ds(sf_dir, ["doc_id"]))


def q_media_features(sf_dir: str):
    """Multimodal plumbing demo (rows-only; stub decoder)."""
    from ..stages.multimodal import media_pipeline

    return media_pipeline(docs_ds(sf_dir, ["doc_id"]))


def q_media_stats(sf_dir: str):
    """Exact-oracle twin of the media feature path: same synthesize ->
    actor-pool decode+extract pipeline, with the list<float32> feature
    exploded to scalar columns (f0..f7) so the oracle compares plain
    REAL values.  pixel_mean/hist are integer-exact byte arithmetic over
    the md5-string payload, fully re-derived in SQL."""
    import pyarrow as pa

    from ..stages.multimodal import media_pipeline

    def expand(batch: pa.Table) -> pa.Table:
        feats = batch.column("feature")
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        mat = np.asarray(feats.values).reshape(batch.num_rows, -1)
        cols = {
            "item_id": batch.column("item_id"),
            "pixel_mean": batch.column("pixel_mean"),
        }
        for j in range(mat.shape[1]):
            cols[f"f{j}"] = pa.array(mat[:, j], pa.float32())
        return pa.table(cols)

    return media_pipeline(docs_ds(sf_dir, ["doc_id"])).map_batches(
        expand, batch_format="pyarrow"
    )


def q_media_frames(sf_dir: str):
    """Video frame sampling — per-frame row explosion with exact-count
    oracle (frames = ceil(n_frames / 4), n_frames = 4 + doc_id % 13)."""
    import pyarrow as pa

    from ..stages import multimodal as M

    return (
        docs_ds(sf_dir, ["doc_id"])
        .map_batches(M.synthesize_video, batch_format="pyarrow")
        .map_batches(M.sample_frames, batch_format="pyarrow", batch_size=64)
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b.column("item_id"),
                    "frame_idx": b.column("frame_idx"),
                    "frame_len": pa.array(
                        [len(x) for x in b.column("frame").to_pylist()], pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def q_window(sf_dir: str):
    return events.tumbling_window(events_ds(sf_dir, ["user_id", "ts", "value"]))


def q_active_seconds(sf_dir: str):
    """Per-user total covered activity time (union of 30-min event
    windows, overlap-clipped) — see ``stages.events.active_seconds``."""
    return events.active_seconds(events_ds(sf_dir, ["user_id", "ts"]))


def q_rolling_active(sf_dir: str, w: int = 24):
    """Sliding-window distinct users (rolling 24h DAU) — exact via the
    per-user coverage-interval sweep, see ``stages.events.rolling_active``."""
    return events.rolling_active(events_ds(sf_dir, ["user_id", "ts"]), w=w)


def q_decay_score(sf_dir: str):
    """Time-decayed heat per event type with exact bit-shift halving —
    see ``stages.events.decay_score``."""
    return events.decay_score(
        events_ds(sf_dir, ["event_type", "ts", "value"]))


def q_readability(sf_dir: str):
    """Integer Flesch-style readability per doc — see
    ``stages.text.readability``."""
    return text.readability(docs_ds(sf_dir, ["doc_id", "text"]))


def q_trend_slope(sf_dir: str):
    """Exact OLS trend NUMERATORS per event type over the hourly count
    series (the alerting trend-line: is this event type growing?):
    x = hour, y = count(hour), slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
    reported as the two integer halves so the oracle is bitwise.  Scale
    shape: per-batch (type, hour) count partials -> ONE bounded
    groupby-sum (state <= types x hours) -> single-block moment pass.
    Hours are re-based to the per-type minimum so the int64 moments stay
    small at any calendar epoch."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        h = batch.column("ts").cast(pa.int64()).to_numpy() // 3_600_000_000
        df = pd.DataFrame({"event_type": et, "h": h})
        agg = df.groupby(["event_type", "h"], as_index=False).size()
        agg = agg.rename(columns={"size": "n_part"})
        return pa.Table.from_pandas(agg, preserve_index=False)

    hourly = (
        events_ds(sf_dir, ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .aggregate(Sum("n_part", alias_name="y"))
    )

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for et, g in df.groupby("event_type"):
            x = g["h"].to_numpy().astype(np.int64)
            x = x - x.min()
            y = g["y"].to_numpy().astype(np.int64)
            n = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxy, sxx = int((x * y).sum()), int((x * x).sum())
            rows.append((et, n * sxy - sx * sy, n * sxx - sx * sx, n))
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["event_type", "slope_num",
                                        "slope_den", "n_hours"]),
            preserve_index=False)

    return hourly.repartition(1).map_batches(moments, batch_format="pyarrow")


def q_burst_hours(sf_dir: str, w: int = 24):
    """Burst detection (Kleinberg-lite alerting): hours where an event
    type's count exceeds 2x its trailing-``w``-hour mean, i.e.
    ``n * w > 2 * sum(prior w calendar hours)`` — missing hours count as
    ZERO (dense grid), evaluated only once a full window of history
    exists.  Exact integers end to end.  Scale shape: per-batch (type,
    hour) partials -> ONE bounded groupby-sum (state <= types x hours) ->
    dense-grid prefix sums in a single small block.  Window-sum SQL twin
    over a generate_series calendar."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        h = batch.column("ts").cast(pa.int64()).to_numpy() // 3_600_000_000
        df = pd.DataFrame({"event_type": et, "h": h})
        agg = df.groupby(["event_type", "h"], as_index=False).size()
        agg = agg.rename(columns={"size": "n_part"})
        return pa.Table.from_pandas(agg, preserve_index=False)

    hourly = (
        events_ds(sf_dir, ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def bursts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for et, g in df.groupby("event_type"):
            h = g["h"].to_numpy().astype(np.int64)
            n = g["n"].to_numpy().astype(np.int64)
            lo, hi = int(h.min()), int(h.max())
            dense = np.zeros(hi - lo + 1, np.int64)
            dense[h - lo] = n
            pref = np.concatenate([[0], np.cumsum(dense)])
            idx = np.arange(len(dense))
            ok = idx >= w
            trail = np.where(ok, pref[np.maximum(idx, w)]
                             - pref[np.maximum(idx - w, 0)], 0)
            burst = ok & (dense * w > 2 * trail)
            for i in np.flatnonzero(burst):
                rows.append((et, lo + int(i), int(dense[i]), int(trail[i])))
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["event_type", "h", "n", "trail"]),
            preserve_index=False)

    return hourly.repartition(1).map_batches(bursts, batch_format="pyarrow")


def q_sessionize(sf_dir: str):
    return events.sessionize(events_ds(sf_dir, ["user_id", "event_id", "ts"]))


def q_kanon_audit(sf_dir: str, k: int = 5, bucket: int = 64):
    """k-anonymity audit over the (lang, length-bucket) quasi-identifier:
    groups with fewer than ``k`` documents — the re-identification-risk
    census run before releasing corpus statistics.  Per-batch partial
    counts -> ONE bounded groupby-sum (state <= #langs x #buckets) ->
    filter n < k.  Exact HAVING-count twin."""
    import pyarrow as pa
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        lb = (pc.utf8_length(batch.column("text")).to_numpy() // bucket)
        t = pa.table({"lang": lang, "len_bucket": pa.array(lb, pa.int64())})
        df = t.to_pandas().groupby(["lang", "len_bucket"], as_index=False).size()
        df = df.rename(columns={"size": "n_part"})
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        docs_ds(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "len_bucket"])
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
    return agg.map_batches(
        lambda b: b.filter(pa.array(b.column("n_docs").to_numpy() < k)),
        batch_format="pyarrow",
    )


def q_max_streak(sf_dir: str):
    """Longest consecutive-day streak per user (gaps-and-islands without a
    window operator); day - row_number() island twin."""
    return events.max_streak(events_ds(sf_dir, ["user_id", "ts"]))


def q_inter_event_gaps(sf_dir: str):
    """Per-user inter-arrival gap histogram (minutes, capped at 120) — the
    lag()-window shape via the user-hash bucket; exact lag() SQL twin."""
    return events.inter_event_gaps(
        events_ds(sf_dir, ["user_id", "event_id", "ts"]))


def q_running_total(sf_dir: str):
    """Ordered cumulative window (SUM OVER ... ROWS UNBOUNDED PRECEDING)
    via the user-hash bucket + segment-cumsum kernel."""
    return events.running_total(
        events_ds(sf_dir, ["user_id", "event_id", "ts", "value"])
    )


def q_event_seq(sf_dir: str):
    """Per-user ordered behaviour-sequence strings (string_agg ORDER BY
    twin), built from buffer slices inside the user-hash bucket."""
    return events.event_seq(
        events_ds(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    )


def q_pivot_counts(sf_dir: str):
    """Per-user event-type pivot: wide one-hot count features, partial
    pivot inside map_batches + narrow groupby-sum."""
    return events.pivot_counts(events_ds(sf_dir, ["user_id", "event_type"]))


def q_interval_join(sf_dir: str):
    """Event-time band join: prior-hour view count per purchase."""
    return events.interval_join_views(
        events_ds(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    )


def q_pctl_by_type(sf_dir: str):
    """Integer percentile-bucket normalization (0..99 within event_type) —
    the feature-scaling companion of rank_in_type, same broadcast CDF."""
    return events.rank_in_group(
        events_ds(sf_dir, ["event_id", "event_type", "value"]), with_pctl=True
    ).select_columns(["event_id", "event_type", "pctl"])


def q_hourly_active(sf_dir: str):
    """Exact distinct-users-per-hour (the hll_users exact companion)."""
    return events.hourly_active(events_ds(sf_dir, ["user_id", "ts"]))


def q_latest_per_user(sf_dir: str):
    """Upsert/log-compaction: latest event per user via two-level argmax."""
    return events.latest_per_user(
        events_ds(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    )


def q_rank_in_type(sf_dir: str):
    """Exact per-partition RANK() via broadcast CDF — no sort shuffle."""
    return events.rank_in_group(
        events_ds(sf_dir, ["event_id", "event_type", "value"])
    )


def q_asof(sf_dir: str):
    return events.asof_join_views(
        events_ds(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    )


def q_topk_events(sf_dir: str, k: int = 10):
    """Global top-k by value, cents-int output.

    Scale shape (round-3 rework): a global ``ds.sort`` for k=10 is an
    all-to-all shuffle of every row.  Instead each batch keeps its own
    top-k partial (one argpartition per batch — the ``stages/ann.py``
    brute-top-k pattern), and only n_blocks x k candidate rows reach the
    final exact sort+limit."""
    import pyarrow as pa

    def partial_topk(batch):
        cents = np.round(batch.column("value").to_numpy() * 100).astype(np.int64)
        eid = batch.column("event_id").to_numpy()
        if len(cents) > k:
            # exact top-k by (cents desc, event_id asc): O(n) partition for
            # the kth-largest cents, keep every row at-or-above it (ties
            # included so the event_id tie-break stays exact), sort those
            thresh = np.partition(cents, len(cents) - k)[len(cents) - k]
            cand = np.flatnonzero(cents >= thresh)
            order = cand[np.lexsort((eid[cand], -cents[cand]))][:k]
        else:
            order = np.lexsort((eid, -cents))[:k]
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": batch.column("user_id").take(pa.array(order)),
                "cents": pa.array(cents[order], pa.int64()),
            }
        )

    ds = events_ds(sf_dir, ["event_id", "user_id", "value"]).map_batches(
        partial_topk, batch_format="pyarrow"
    )
    out = ds.sort(["cents", "event_id"], descending=[True, False]).limit(k)
    return out.select_columns(["event_id", "user_id", "cents"])


def q_tpch_q3(sf_dir: str, segment: str = "BUILDING",
              cutoff_us: int = 883_612_800_000_000,  # 1998-01-01 epoch us
              k: int = 10):
    """TPC-H Q3-shaped multi-join analytics (shipping priority): the
    big-big equi-join demonstrator for the relational surface.

    Scale plan, stage by stage:
    * customer (tiny after the segment filter) never shuffles — its key
      set is a driver-side filtered parquet read, broadcast into the
      orders scan (semi-join by ``np.isin``; the reference's
      small-side-lookup discipline);
    * orders x lineitem is the one genuine big-big exchange — Ray Data's
      native hash-partitioned ``Dataset.join``, both sides pre-filtered
      and pre-projected so only (key, date) and (key, revenue-int) rows
      move;
    * revenue is exact integers (price_cents x (100 - disc_pct)), so the
      post-join groupby-sum and the DuckDB twin agree bitwise;
    * final top-k: per-batch partial top-k, then sort+limit over the tiny
      candidate stream (never a global sort of the join output)."""
    ckeys = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filters=[("c_mktsegment", "==", segment)],
    ).column("c_custkey").to_numpy()

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (odate < cutoff_us) & np.isin(
            batch.column("o_custkey").to_numpy(), ckeys
        )
        return pa.table(
            {
                "l_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
                "odate_us": pa.array(odate[keep], pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        sdate = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = sdate > cutoff_us
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        disc_pct = np.round(
            batch.column("l_discount").to_numpy()[keep] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").filter(pa.array(keep)),
                "rev": pa.array(price_c * (100 - disc_pct), pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow")

    from ..stages.bucketagg import bucketed_sum

    n_line = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    joined = line.join(orders, join_type="inner",
                       **join_args(size_hint_rows=n_line),
                       on=("l_orderkey",))

    def rev_partial(batch: pa.Table) -> pa.Table:
        # per-batch combiner BEFORE the merge shuffle: distinct orders per
        # batch, not joined lines, is what moves
        if batch.num_rows == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "odate_us": pa.array([], pa.int64()),
                "rev_part": pa.array([], pa.int64()),
            })
        key = batch.column("l_orderkey").to_numpy()
        od = batch.column("odate_us").to_numpy()
        rev = batch.column("rev").to_numpy()
        order = np.argsort(key, kind="stable")
        key_s, od_s, rev_s = key[order], od[order], rev[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(key_s)) + 1])
        return pa.table({
            "l_orderkey": pa.array(key_s[starts], pa.int64()),
            "odate_us": pa.array(od_s[starts], pa.int64()),
            "rev_part": pa.array(np.add.reduceat(rev_s, starts), pa.int64()),
        })

    agg = bucketed_sum(
        joined.map_batches(rev_partial, batch_format="pyarrow"),
        ["l_orderkey", "odate_us"], [("rev_part", "revenue")],
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue").to_numpy()
        okey = batch.column("l_orderkey").to_numpy()
        n = len(rev)
        if n > k:
            thresh = np.partition(rev, n - k)[n - k]
            cand = np.flatnonzero(rev >= thresh)
            order = cand[np.lexsort((okey[cand], -rev[cand]))][:k]
        else:
            order = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(order))

    return (
        agg.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(k)
        .select_columns(["l_orderkey", "odate_us", "revenue"])
    )


def q_quantize_embed(sf_dir: str):
    """Int8 embedding quantization (the vector-store compression step):
    per-vector symmetric scale = max|x|, q_i = round_even(x/scale*127) —
    census columns (scale_ppb, q_sum, q_min, q_max) all integers, so the
    list-lambda SQL twin matches bitwise (float32 -> float64 promotion and
    the divide/multiply chain are identical IEEE ops on both sides).
    Embarrassingly parallel map_batches; no shuffle."""

    def quant(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False),
                       np.float64).reshape(batch.num_rows, -1)
        scale = np.abs(m).max(axis=1)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.rint(m / safe[:, None] * 127.0)
        q[scale == 0] = 0.0
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "scale_ppb": pa.array(np.rint(scale * 1e9).astype(np.int64),
                                  pa.int64()),
            "q_sum": pa.array(q.sum(axis=1).astype(np.int64), pa.int64()),
            "q_min": pa.array(q.min(axis=1).astype(np.int64), pa.int64()),
            "q_max": pa.array(q.max(axis=1).astype(np.int64), pa.int64()),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(quant, batch_format="pyarrow")


def q_tpch_q5(sf_dir: str, region: str = "ASIA",
              lo_us: int = 820_454_400_000_000,   # 1996-01-01 epoch us
              hi_us: int = 852_076_800_000_000):  # 1997-01-01
    """TPC-H Q5 (local supplier volume): the 6-way join — region⋈nation⋈
    customer⋈orders⋈lineitem⋈supplier with the c_nation = s_nation twist.

    Scale plan: region/nation/customer/supplier are the SMALL side —
    collapsed driver-side into two compact int->int broadcast maps
    (custkey->nationkey restricted to the region, suppkey->nationkey);
    orders and lineitem are pre-projected scans that attach the nation via
    vectorized broadcast lookup; the ONE big-big exchange is a side-tagged
    union bucketed on orderkey (the osm.py join pattern — profiled faster
    than native join THEN groupby, which serialized two barriers), whose
    group body fuses the probe join, the c_nation = s_nation filter and a
    bincount-by-nation partial; the final 25-row groupby-sum is a trivial
    second exchange over <= n_buckets x 25 partial rows.  Revenue in exact
    integer cents x (100 - disc_pct), so the DuckDB twin matches
    bitwise."""
    from ray.data.aggregate import Sum

    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pydict()
    rkey = {n: k for k, n in zip(reg["r_regionkey"], reg["r_name"])}[region]
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    in_region = {int(k): str(n) for k, n, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if int(r) == rkey}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy()
    keep_c = np.isin(cn, np.array(sorted(in_region), np.int64))
    cmap_keys = np.sort(ck[keep_c])
    cmap_vals = cn[keep_c][np.argsort(ck[keep_c], kind="stable")]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = np.sort(supp.column("s_suppkey").to_numpy())
    sv = supp.column("s_nationkey").to_numpy()[
        np.argsort(supp.column("s_suppkey").to_numpy(), kind="stable")]

    N_BUCKETS = 64

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        okey = batch.column("o_custkey").to_numpy()
        pos = np.searchsorted(cmap_keys, okey)
        posc = np.minimum(pos, max(len(cmap_keys) - 1, 0))
        hit = (len(cmap_keys) > 0) & (pos < len(cmap_keys))
        hit = hit & (cmap_keys[posc] == okey) if len(cmap_keys) else \
            np.zeros(len(okey), bool)
        keep = (odate >= lo_us) & (odate < hi_us) & hit
        kept = batch.column("o_orderkey").to_numpy()[keep]
        m = len(kept)
        # overloaded narrow exchange: p = c_nation on this side
        return pa.table({
            "l_orderkey": pa.array(kept, pa.int64()),
            "p": pa.array(cmap_vals[pos[keep]], pa.int64()),
            "q": pa.array(np.zeros(m, np.int64), pa.int64()),
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "obucket": pa.array(kept % N_BUCKETS, pa.int64()),
        })

    def line_side(batch: pa.Table) -> pa.Table:
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_pct = np.round(
            batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        skey = batch.column("l_suppkey").to_numpy()
        pos = np.searchsorted(sk, skey)
        okey = batch.column("l_orderkey").to_numpy()
        m = len(okey)
        # overloaded narrow exchange: p = s_nation, q = rev on this side
        return pa.table({
            "l_orderkey": pa.array(okey, pa.int64()),
            "p": pa.array(sv[np.minimum(pos, len(sk) - 1)], pa.int64()),
            "q": pa.array(price_c * (100 - disc_pct), pa.int64()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "obucket": pa.array(okey % N_BUCKETS, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        # fused join + partial aggregate (one exchange instead of the
        # native-join barrier THEN a groupby barrier; volume unchanged —
        # the join shipped every row anyway): order keys in this bucket
        # are sorted once, line rows probe via searchsorted, the
        # c_nation = s_nation filter and a bincount-by-nation partial
        # run in the same body.  Output <= 25 rows per bucket.
        empty = pa.table({"s_nation": pa.array([], pa.int64()),
                          "rev_part": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        om = side == 0
        okeys = g.column("l_orderkey").to_numpy()[om]
        if okeys.size == 0:
            return empty
        order = np.argsort(okeys, kind="stable")
        okeys_s = okeys[order]
        cnat_s = g.column("p").to_numpy()[om][order]
        lm = ~om
        lkey = g.column("l_orderkey").to_numpy()[lm]
        pos = np.searchsorted(okeys_s, lkey)
        posc = np.minimum(pos, okeys_s.size - 1)
        hit = (pos < okeys_s.size) & (okeys_s[posc] == lkey)
        snat = g.column("p").to_numpy()[lm]
        match = hit & (cnat_s[posc] == snat)
        if not match.any():
            return empty
        rev = g.column("q").to_numpy()[lm][match]
        nat = snat[match]
        u, inv = np.unique(nat, return_inverse=True)
        return pa.table({
            "s_nation": pa.array(u, pa.int64()),
            "rev_part": pa.array(np.bincount(inv, rev).astype(np.int64),
                                 pa.int64()),
        })

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(orders_side, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["obucket"])),
                    batch_format="pyarrow")
        .groupby("s_nation")
        .aggregate(Sum("rev_part", alias_name="revenue"))
    )

    def name_back(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nation").to_numpy()
        return pa.table({
            "n_name": pa.array([in_region[int(k)] for k in nk], pa.string()),
            "revenue": batch.column("revenue"),
        })

    return agg.map_batches(name_back, batch_format="pyarrow")


def q_left_join_audit(sf_dir: str, price_threshold: float = 250_000.0):
    """LEFT OUTER join audit — the null-fill half of the relational join
    surface: every lineitem against the high-value orders subset, then a
    per-returnflag match/miss census (row count, matched count, matched
    order-value cents).

    Scale: both join inputs are pre-projected to (key, one int) rows; the
    outer join is Ray Data's native hash-partitioned exchange; the audit
    aggregate is per-batch partials -> 3-row groupby-sum, so nothing wide
    ever materializes."""
    from ray.data.aggregate import Sum

    def orders_side(batch: pa.Table) -> pa.Table:
        tp = batch.column("o_totalprice").to_numpy()
        keep = tp >= price_threshold
        return pa.table(
            {
                "l_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
                "otp_cents": pa.array(
                    np.round(tp[keep] * 100).astype(np.int64), pa.int64()
                ),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(orders_side, batch_format="pyarrow")
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    joined = line.join(
        orders, join_type="left_outer",
        **join_args(size_hint_rows=pq.read_metadata(
            f"{sf_dir}/lineitem.parquet").num_rows),
        on=("l_orderkey",))

    def audit_partial(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_pandas()
        otp = batch.column("otp_cents").to_pandas()
        part = pd.DataFrame(
            {
                "l_returnflag": rf,
                "n_part": 1,
                "n_matched_part": otp.notna().astype(np.int64),
                "cents_part": otp.fillna(0).astype(np.int64),
            }
        ).groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    return (
        joined.map_batches(audit_partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_part", alias_name="n_rows"),
            Sum("n_matched_part", alias_name="n_matched"),
            Sum("cents_part", alias_name="matched_cents"),
        )
    )


def q_anti_join(sf_dir: str, cutoff_us: int = 804_556_800_000_000):
    """Distributed ANTI join (customers with no order before 1995-07-01),
    per-nation census — completes the join family
    (inner/left/semi/anti/range/asof).

    Scale: the order side collapses to DISTINCT custkeys inside
    map_batches partials + one groupby BEFORE the join (the exchange
    moves keys, not orders); anti = native left_outer + null filter —
    no driver-side key set, both sides stream."""
    from ray.data.aggregate import Sum

    def okeys_partial(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = odate < cutoff_us
        t = pa.table({"c_custkey": batch.column("o_custkey").filter(pa.array(keep))})
        t = t.group_by(["c_custkey"]).aggregate([])
        return t.append_column(
            "has_order",
            pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64()),
        )

    okeys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(okeys_partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t.column("c_custkey"),
                    "has_order": pa.array(
                        np.ones(t.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = cust.join(
        okeys, join_type="left_outer",
        **join_args(size_hint_rows=pq.read_metadata(
            f"{sf_dir}/orders.parquet").num_rows),
        on=("c_custkey",))

    def census(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        miss = batch.filter(pc.is_null(batch.column("has_order")))
        t = pa.table({"c_nationkey": miss.column("c_nationkey")})
        g = t.group_by(["c_nationkey"]).aggregate([([], "count_all")])
        return g.rename_columns(["c_nationkey", "n_part"])

    return (
        joined.map_batches(census, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n_part", alias_name="n_inactive"))
    )


def q_lineitem_agg(sf_dir: str):
    """Plain wide groupby-aggregate (TPC-H Q1-shaped) with batch combiners."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # integer units so distributed summation order can't change the result
        df["qty_i"] = df["l_quantity"].round().astype("int64")
        df["price_c"] = (df["l_extendedprice"] * 100).round().astype("int64")
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_part=("qty_i", "sum"),
            price_part=("price_c", "sum"),
            n_part=("qty_i", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_part", alias_name="sum_qty"),
            Sum("price_part", alias_name="sum_price"),
            Sum("n_part", alias_name="n_rows"),
        )
    )


def q_distinct_langs(sf_dir: str):
    """DISTINCT over two columns (ds.unique analogue via groupby)."""
    from ray.data.aggregate import Count

    return (
        docs_ds(sf_dir, ["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"))
    )


def q_semi_join(sf_dir: str):
    """Broadcast semi-join: orders whose customer is in the AUTOMOBILE
    segment.  The small key set is broadcast (ray.put) and applied as a
    vectorized filter inside map_batches — no shuffle (SURVEY §2.4 broadcast
    pattern / bloom-filter semi-join analogue)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    keys = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keyset = set(
        k
        for k, seg in zip(
            keys.column("c_custkey").to_pylist(), keys.column("c_mktsegment").to_pylist()
        )
        if seg == "AUTOMOBILE"
    )
    handle = ray.put(np.array(sorted(keyset), dtype=np.int64))

    def semi(batch: pa.Table) -> pa.Table:
        ks = ray.get(handle) if isinstance(handle, ray.ObjectRef) else handle
        ok = np.isin(batch.column("o_custkey").to_numpy(), ks)
        return batch.filter(pa.array(ok))

    return (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
        .map_batches(semi, batch_format="pyarrow")
        .select_columns(["o_orderkey", "o_custkey"])
    )


def q_hash_sample(sf_dir: str):
    """Deterministic 1/16 sample by key hash (reproducible sampling — the
    engine's deterministic alternative to random_sample)."""
    import pyarrow as pa

    def sample(batch: pa.Table) -> pa.Table:
        k = batch.column("event_id").to_numpy()
        ok = (k * 2654435761 % 2**32) % 16 == 0
        return batch.filter(pa.array(ok))

    return events_ds(sf_dir, ["event_id", "user_id", "event_type"]).map_batches(
        sample, batch_format="pyarrow"
    )


def q_sliding_window(sf_dir: str):
    return events.sliding_window(events_ds(sf_dir, ["user_id", "ts", "value"]))


def q_median_by_type(sf_dir: str):
    return events.median_by_type(events_ds(sf_dir, ["event_type", "value"]))


def q_dedup_components(sf_dir: str):
    """Connected components over a deterministic chain-edge graph derived
    from the documents table (edge (d-1, d) unless d % 7 == 0): components
    are the 7-blocks {7k..7k+6}, reached only after the propagation walks
    the chain (diameter 6) — exercising multiple shuffle-join rounds.
    Output (node, comp=min id of component); oracle is the closed form."""
    import pyarrow as pa

    def chain_edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        m = d % 7 != 0
        return pa.table(
            {
                "a": pa.array(d[m] - 1, pa.int64()),
                "b": pa.array(d[m], pa.int64()),
            }
        )

    edges = docs_ds(sf_dir, ["doc_id"]).map_batches(chain_edges, batch_format="pyarrow")
    return dedup.connected_components(edges)


def q_stratified_sample(sf_dir: str, k: int = 20):
    """Deterministic k-per-event_type sample (multiplicative-hash rank;
    exact row_number SQL twin)."""
    from ..stages.sampling import stratified_sample

    return stratified_sample(
        events_ds(sf_dir, ["event_id", "event_type"]),
        group_col="event_type", id_col="event_id", k=k,
    ).select_columns(["event_id", "event_type", "hv"])


def q_kmeans_lloyd(sf_dir: str, k: int = 8, iters: int = 2):
    """Distributed Lloyd k-means — the ITERATIVE-algorithm demonstrator,
    in exact fixed-point integers so even the per-vector output of a
    2-iteration run has a bitwise DuckDB twin.

    Semantics: centroids init to the k lowest-vec_id embeddings
    (quantized floor(x * 2^14) like :func:`q_cluster_assign`); each
    iteration assigns every vector to the argmin integer squared-L2
    centroid (ties -> smallest cluster id) and recomputes centroids as
    TRUNCATING integer division sum//n (DuckDB ``//`` parity; numpy's
    floor division is adjusted for negative sums); empty clusters drop,
    mirroring the SQL GROUP BY.  Output: final per-vector
    (vec_id, cluster, dist2).

    Scale plan: each Lloyd iteration is ONE streaming pass — centroids
    (k x d int64) are a tiny closure broadcast; each batch emits at most
    k x d (cluster, dim, sum, n) partial rows regardless of batch size;
    a k*d-row groupby-sum comes back to the driver (bounded small).  The
    input is RE-SCANNED per iteration rather than cached — at 100 TB a
    re-read beats pinning the corpus in the object store, and the partial
    rows are the only shuffle traffic."""
    from ray.data.aggregate import Sum

    cent_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    cids = cent_tbl.column("vec_id").to_numpy().astype(np.int64)
    cq = ann.quantize_embedding(
        np.stack(cent_tbl.column("embedding").to_numpy(zero_copy_only=False)))

    def read():
        return ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def _quant(batch: pa.Table) -> np.ndarray:
        return ann.quantize_embedding(
            np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))

    def _assign(q: np.ndarray, ids: np.ndarray, cent: np.ndarray):
        d2 = ((q * q).sum(axis=1, keepdims=True) - 2 * (q @ cent.T)
              + (cent * cent).sum(axis=1)[None, :])
        pos = d2.argmin(axis=1)  # first occurrence = smallest cluster id
        return ids[pos], d2[np.arange(len(pos)), pos]

    for _ in range(iters):
        ids_it, cq_it = cids, cq

        def partial(batch: pa.Table, ids=ids_it, cent=cq_it) -> pa.Table:
            q = _quant(batch)
            cl, _ = _assign(q, ids, cent)
            d = q.shape[1]
            u, inv = np.unique(cl, return_inverse=True)
            sums = np.zeros((len(u), d), np.int64)
            np.add.at(sums, inv, q)  # scatter over <= k rows — cheap
            cnt = np.bincount(inv).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(u, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                        len(u)), pa.int64()),
                "s_part": pa.array(sums.reshape(-1), pa.int64()),
                "n_part": pa.array(np.repeat(cnt, d), pa.int64()),
            })

        rows = (read().map_batches(partial, batch_format="pyarrow")
                .groupby(["cluster", "dim"])
                .aggregate(Sum("s_part", alias_name="s"),
                           Sum("n_part", alias_name="n"))
                .to_pandas())  # bounded: <= k x d rows
        rows = rows.sort_values(["cluster", "dim"], ignore_index=True)
        d = int(rows["dim"].max())
        cids = rows["cluster"].to_numpy()[::d].astype(np.int64)
        s = rows["s"].to_numpy().astype(np.int64).reshape(-1, d)
        n = rows["n"].to_numpy().astype(np.int64).reshape(-1, d)
        q_ = s // n  # floor; adjust to DuckDB's truncation for negatives
        r = s - q_ * n
        cq = q_ + ((r != 0) & (s < 0)).astype(np.int64)

    ids_f, cq_f = cids, cq

    def final(batch: pa.Table) -> pa.Table:
        q = _quant(batch)
        cl, d2 = _assign(q, ids_f, cq_f)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(cl, pa.int64()),
            "dist2": pa.array(d2, pa.int64()),
        })

    return read().map_batches(final, batch_format="pyarrow")


def q_cluster_assign(sf_dir: str, k: int = 8):
    """Exact nearest-centroid assignment (Lloyd map step / IVF routing) in
    fixed-point integers: centroids are the k lowest-vec_id embeddings
    (bounded, filter-pushdown driver read, broadcast into the stage); each
    batch does one (B, k, d) integer GEMM — zero shuffles, exact SQL twin
    (``sql_cluster_assign`` re-derives the same int64 distances)."""
    cent_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    cq = ann.quantize_embedding(
        np.stack(cent_tbl.column("embedding").to_numpy(zero_copy_only=False))
    )
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann.kmeans_assign(embs, cq)


def q_doc_vector_join(sf_dir: str):
    """Text x vector fusion (the corpus<->embedding-store join every
    embedding-filtered curation pipeline needs): documents metadata inner-
    joined to per-vector fixed-point norms.

    Scale: the embedding side reduces to (id, int64 norm2) INSIDE
    map_batches (one vectorized square-sum per batch — raw vectors never
    cross the exchange); the join is Ray Data's hash-partitioned native
    join on pre-projected narrow rows; norm2 is exact fixed-point so the
    SQL twin agrees bitwise."""

    def norms(batch: pa.Table) -> pa.Table:
        q = ann.quantize_embedding(
            np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "doc_id": batch.column("vec_id"),
                "norm2": pa.array((q * q).sum(axis=1), pa.int64()),
            }
        )

    vecs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(norms, batch_format="pyarrow")
    docs = docs_ds(sf_dir, ["doc_id", "lang", "n_chars"])
    return docs.join(
        vecs, join_type="inner",
        **join_args(size_hint_rows=pq.read_metadata(
            f"{sf_dir}/documents.parquet").num_rows),
        on=("doc_id",))


def q_source_centroid(sf_dir: str, fp: int = 16384):
    """Per-source embedding centroid NUMERATORS in fixed point (the
    domain-centroid table behind clustering / data-mixing diagnostics):
    docs(source) ⋈ embeddings on the dense id key (native hash join,
    vectors pre-quantized to int64 inside map_batches), then per-batch
    per-(source, dim) partial sums -> ONE groupby over sources x dims.
    Output: (source, dim, n, sum_fp); the mean is a consumer division."""
    from ray.data.aggregate import Sum

    def quant(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False),
                       np.float64).reshape(batch.num_rows, -1)
        q = np.floor(m * fp).astype(np.int64)
        d = q.shape[1]
        cols = {"doc_id": batch.column("vec_id")}
        for j in range(d):
            cols[f"q{j}"] = pa.array(q[:, j], pa.int64())
        return pa.table(cols)

    vecs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(quant, batch_format="pyarrow")
    docs = docs_ds(sf_dir, ["doc_id", "source"])
    joined = docs.join(
        vecs, join_type="inner",
        **join_args(size_hint_rows=pq.read_metadata(
            f"{sf_dir}/documents.parquet").num_rows),
        on=("doc_id",))

    def partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source").to_pandas(), dtype=object)
        qcols = [c for c in batch.column_names if c.startswith("q")]
        m = np.column_stack([batch.column(c).to_numpy() for c in qcols])
        uniq, inv = np.unique(src, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.int64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        d = m.shape[1]
        return pa.table({
            "source": pa.array(np.repeat(uniq, d).tolist(), pa.string()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq)),
                            pa.int64()),
            "n_part": pa.array(np.repeat(cnt, d), pa.int64()),
            "sum_part": pa.array(sums.ravel(), pa.int64()),
        })

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "dim"])
        .aggregate(Sum("n_part", alias_name="n"),
                   Sum("sum_part", alias_name="sum_fp"))
    )


def q_peak_concurrency(sf_dir: str):
    """Peak simultaneous sessions via the distributed sweep line; window
    prefix twin over the sessionize CTE."""
    return events.peak_concurrency(
        events_ds(sf_dir, ["user_id", "event_id", "ts"]))


def q_event_transitions(sf_dir: str):
    """Behaviour Markov-transition census: counts of adjacent
    (type_from -> type_to) pairs in each user's (ts, event_id) order — the
    funnel-analytics transition matrix, via the user-hash bucket (one
    lexsort + shifted compare per bucket, partial counts, tiny final
    groupby).  lag() twin."""
    from ray.data.aggregate import Sum

    from ..stages.events import _bucketed_by_user

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        et = np.asarray(g.column("event_type").to_pandas(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], et[order]
        same = u[1:] == u[:-1]
        df = (
            pd.DataFrame({"type_from": t[:-1][same], "type_to": t[1:][same]})
            .groupby(["type_from", "type_to"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        _bucketed_by_user(
            events_ds(sf_dir, ["user_id", "event_id", "ts", "event_type"]))
        .map_groups(lambda g: per_bucket(g.drop_columns(["ubucket"])),
                    batch_format="pyarrow")
        .groupby(["type_from", "type_to"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def q_mutual_nn(sf_dir: str, k_cent: int = 8):
    """Reciprocal nearest neighbours inside integer k-means cells
    (``ann.mutual_nn``) — exact SQL twin re-derives assignment, in-cell
    NN (ties -> smaller id) and the both-directions check."""
    cent_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k_cent)],
    ).sort_by("vec_id")
    cq = ann.quantize_embedding(
        np.stack(cent_tbl.column("embedding").to_numpy(zero_copy_only=False))
    )
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann.mutual_nn(embs, cq)


def q_ivf_exact(sf_dir: str, k_cent: int = 8, nq: int = 4, k: int = 5,
                n_probe: int = 2):
    """Inverted-file ANN with a bitwise SQL twin: centroids are the
    ``k_cent`` lowest-vec_id embeddings, queries the next ``nq``; routing,
    probing and scoring all happen in fixed-point integers
    (``ann.ivf_exact_topk``), so DuckDB re-derives the identical top-k —
    the exact-oracle companion to the float ``ann_ivf`` path."""
    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k_cent + nq)],
    ).sort_by("vec_id")
    mat = ann.quantize_embedding(
        np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    )
    ids = head.column("vec_id").to_numpy()
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann.ivf_exact_topk(
        embs, mat[:k_cent], ids[k_cent:], mat[k_cent:], k=k, n_probe=n_probe
    )


def q_ivf_recall(sf_dir: str, k_cent: int = 8, nq: int = 4, k: int = 5,
                 n_probe: int = 2):
    """ANN quality EVALUATION as a first-class operator: recall@k of the
    IVF search (n_probe lists) against the exact answer — the metric
    every vector-store deployment monitors.  The exact side is the SAME
    integer search with ``n_probe = k_cent`` (probing every list == a
    full exact scan), so both sides run the identical fixed-point kernel
    and the SQL twin re-derives both searches and intersects them.
    Output per query: (query_id, hits, k) — recall@k = hits / k."""
    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k_cent + nq)],
    ).sort_by("vec_id")
    mat = ann.quantize_embedding(
        np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    )
    ids = head.column("vec_id").to_numpy()
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    approx = ann.ivf_exact_topk(
        embs, mat[:k_cent], ids[k_cent:], mat[k_cent:], k=k, n_probe=n_probe
    ).to_pandas()
    exact = ann.ivf_exact_topk(
        embs, mat[:k_cent], ids[k_cent:], mat[k_cent:], k=k, n_probe=k_cent
    ).to_pandas()
    hit = approx.merge(exact[["query_id", "neighbor_id"]],
                       on=["query_id", "neighbor_id"])
    cnt = hit.groupby("query_id").size()
    out = pd.DataFrame({
        "query_id": ids[k_cent:].astype(np.int64),
        "hits": [int(cnt.get(q, 0)) for q in ids[k_cent:]],
        "k": np.int64(k),
    })
    return ray.data.from_pandas(out.astype(np.int64))


def q_knn_classify(sf_dir: str, nq: int = 16, k: int = 5):
    """Exact kNN CLASSIFICATION over the vector store (the embedding-
    quality eval loop): the first ``nq`` vectors are queries, everything
    else is the reference set; each query takes the majority ``label`` of
    its k nearest neighbors (fixed-point integer distances, ties ->
    smaller neighbor id; vote ties -> smaller label).  Scale shape:
    broadcast quantized query matrix, per-batch integer |q-c|^2 via the
    dot-product expansion + per-batch partial top-k, tiny final merge.
    Output: (vec_id, true_label, pred_label, votes)."""
    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", nq)],
    ).sort_by("vec_id")
    qmat = ann.quantize_embedding(
        np.stack(head.column("embedding").to_numpy(zero_copy_only=False)))
    qids = head.column("vec_id").to_numpy()
    qnorm = (qmat * qmat).sum(axis=1)

    def partial(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy()
        keep = vid >= nq
        if not keep.any():
            return pa.table({
                "qid": pa.array([], pa.int64()),
                "nid": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
                "d2": pa.array([], pa.int64()),
            })
        vid = vid[keep]
        lab = batch.column("label").to_numpy()[keep].astype(np.int64)
        m = ann.quantize_embedding(np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False))[keep])
        d2 = ((m * m).sum(axis=1)[:, None] + qnorm[None, :]
              - 2 * (m @ qmat.T))                       # (B, nq) exact int64
        kk = min(k, d2.shape[0])
        out = [[], [], [], []]
        for j in range(len(qids)):
            col = d2[:, j]
            idx = np.lexsort((vid, col))[:kk]           # (d2, nid) order
            out[0].append(np.full(kk, qids[j], np.int64))
            out[1].append(vid[idx])
            out[2].append(lab[idx])
            out[3].append(col[idx])
        return pa.table({
            "qid": pa.array(np.concatenate(out[0]), pa.int64()),
            "nid": pa.array(np.concatenate(out[1]), pa.int64()),
            "label": pa.array(np.concatenate(out[2]), pa.int64()),
            "d2": pa.array(np.concatenate(out[3]), pa.int64()),
        })

    parts = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # nq * k * n_blocks rows — tiny by construction
    )
    true_lab = head.column("label").to_numpy().astype(np.int64)
    rows = []
    for j, q in enumerate(qids):
        g = parts[parts["qid"] == q].sort_values(["d2", "nid"]).head(k)
        vc = g.groupby("label").size().reset_index(name="v")
        vc = vc.sort_values(["v", "label"], ascending=[False, True])
        rows.append((int(q), int(true_lab[j]), int(vc["label"].iloc[0]),
                     int(vc["v"].iloc[0])))
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["vec_id", "true_label", "pred_label", "votes"]
    ).astype(np.int64))


def q_unigram_surprisal(sf_dir: str):
    """Integer unigram-LM quality scoring (CCNet/KenLM-filter shape):
    broadcast top-256 vocab + corpus total, per-doc surprisal in exact
    bits (bitlen arithmetic) — bitwise SQL twin."""
    return text.unigram_surprisal(docs_ds(sf_dir, ["doc_id", "text"]))


def q_kcore(sf_dir: str, k: int = 5, rounds: int = 3):
    """Bounded-round k-core peeling (k=5, 3 rounds — a real cascade:
    500 -> 306 -> 302 -> 300 alive at sf0.001) over the shared
    :func:`link_graph` — iterative subgraph filtering with a fully
    unrolled SQL twin.  Dispatches to the bucketed path past the
    broadcast V budget."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    if n > graph.BROADCAST_MAX_NODES:
        return graph.kcore_bucketed(e, n_nodes=n, k=k, rounds=rounds)
    return ray.data.from_pandas(graph.kcore_peel(e, n_nodes=n, k=k, rounds=rounds))


def q_kcore_bucketed(sf_dir: str, k: int = 5, rounds: int = 3):
    """:func:`q_kcore` FORCED through the bucketed path — alive set as a
    sparse Dataset, 2 semi-join exchanges + 1 degree exchange per round
    (``graph.kcore_bucketed``).  Same oracle as ``kcore``."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    return graph.kcore_bucketed(e, n_nodes=n, k=k, rounds=rounds)


def q_cms_counts(sf_dir: str):
    """Count-Min Sketch heavy-hitter frequency estimation over event
    user_ids (d=4, w=1024) with exact probe verification — the registers
    AND estimates are HUGEINT-mirrorable, so the sketch itself is
    oracle-gated (the hll_users companion for frequencies)."""
    from ..stages import sketch

    return sketch.cms_counts(events_ds(sf_dir, ["user_id"]))


def q_pareto_front(sf_dir: str):
    """2-D Pareto front / skyline over events (maximize value cents and
    recency): associative partial-staircase reduction, window-function SQL
    twin."""
    from ..stages import events

    return events.pareto_front(events_ds(sf_dir, ["ts", "value"]))


def q_bloom_probe(sf_dir: str):
    """Bloom-filter membership gate: bitmap built over the corpus doc_ids,
    probed with {doc_id, doc_id + N} (so exactly half the probes are true
    members); bitmap rebuilt bitwise in HUGEINT SQL, so in_bloom —
    INCLUDING any false positives — is oracle-exact."""
    from ..stages import sketch

    import pyarrow.parquet as pq2

    n = pq2.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def probes(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        keys = np.concatenate([d, d + n])
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "present": pa.array((keys < n).astype(np.int64), pa.int64()),
            }
        )

    build = docs_ds(sf_dir, ["doc_id"])
    probe = docs_ds(sf_dir, ["doc_id"]).map_batches(probes, batch_format="pyarrow")
    return sketch.bloom_probe(build, probe).select_columns(
        ["key", "present", "in_bloom"]
    )


def q_expr_classify(sf_dir: str):
    """MultiExpression first-match classification (the reference's tag-
    matching DSL, ``expression/MultiExpression.java`` semantics) over
    documents: ordered rules with IN / LIKE-pattern / numeric-cmp / boolean
    combinators, vectorized per batch; the ordered-CASE SQL twin proves the
    first-match dispatch exactly."""
    from ray.data.aggregate import Count, Min, Sum

    from ..functions.expression import MatchCmp, MultiExpression, match_any

    rules = MultiExpression(
        [
            ("zh_long", match_any("lang", "zh") & MatchCmp("n_chars", ">=", 300)),
            ("query_page", match_any("text", "%query%", "%scan%")),
            ("west_src", match_any("source", "src1", "src2", "src1%")),
            ("short", MatchCmp("n_chars", "<", 120)),
        ]
    )
    payloads = [str(p) for p, _ in rules.entries] + ["other"]

    def classify(batch: pa.Table) -> pa.Table:
        idx = rules.first_match(batch)
        cls = np.array(payloads, dtype=object)[
            np.where(idx >= 0, idx, len(payloads) - 1)
        ]
        t = pa.table(
            {
                "cls": pa.array(cls, pa.string()),
                "n_chars": batch.column("n_chars"),
                "doc_id": batch.column("doc_id"),
            }
        )
        g = t.group_by("cls").aggregate(
            [("doc_id", "count"), ("n_chars", "sum"), ("doc_id", "min")]
        )
        return pa.table(
            {
                "cls": g.column("cls"),
                "n_part": g.column("doc_id_count"),
                "chars_part": g.column("n_chars_sum"),
                "min_part": g.column("doc_id_min"),
            }
        )

    return (
        docs_ds(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
        .map_batches(classify, batch_format="pyarrow")
        .groupby("cls")
        .aggregate(
            Sum("n_part", alias_name="n_docs"),
            Sum("chars_part", alias_name="sum_chars"),
            Min("min_part", alias_name="min_doc"),
        )
    )


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 (forecasting revenue change) in exact integer cents:
    predicate-pruned scan + per-batch partial sums -> one tiny aggregate —
    the canonical filter-and-sum shape.  revenue_cbp = sum of
    round(price*100) * round(discount*100) (cents x basis points, integer
    exact on both engines)."""
    from ray.data.aggregate import Sum

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        qty = batch.column("l_quantity").to_numpy()
        price = batch.column("l_extendedprice").to_numpy()
        dbp = np.round(disc * 100).astype(np.int64)  # basis points / 100
        m = (ship >= lo) & (ship < hi) & (dbp >= 5) & (dbp <= 7) & (qty < 24)
        rev = np.round(price[m] * 100).astype(np.int64) * dbp[m]
        return pa.table(
            {
                "grp": pa.array([0], pa.int64()),
                "rev_part": pa.array([int(rev.sum())], pa.int64()),
                "n_part": pa.array([int(m.sum())], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(
            Sum("rev_part", alias_name="revenue_cbp"),
            Sum("n_part", alias_name="n_rows"),
        )
    )


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12-shaped (shipping-mode priority audit) on the available
    columns: orders |><| lineitem big-big join, then the two-branch
    conditional count per l_returnflag.  Scale plan: BOTH sides are
    pre-projected to exactly two columns before the one hash exchange
    (orders -> (key, is_high bool8), lineitem date-filtered -> (key,
    returnflag dictionary)), the conditional aggregation happens as
    per-batch partials on the join output, and the final groupby moves
    <= 3 keys x partials.  Reference parity: the same
    filter-project-join-aggregate discipline as q_tpch_q3, but with the
    categorical conditional-count shape instead of top-k."""
    from ray.data.aggregate import Sum

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def orders_side(batch: pa.Table) -> pa.Table:
        pri = batch.column("o_orderpriority").to_pandas().to_numpy(object)
        is_high = (pri == "1-URGENT") | (pri == "2-HIGH")
        return pa.table(
            {
                "l_orderkey": batch.column("o_orderkey"),
                "is_high": pa.array(is_high, pa.bool_()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy()
        keep = pa.array((ship >= lo) & (ship < hi))
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").filter(keep),
                "flag": batch.column("l_returnflag").filter(keep),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    ).map_batches(line_side, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        flag = np.asarray(batch.column("flag").to_pandas(), object)
        hi_mask = batch.column("is_high").to_numpy(zero_copy_only=False)
        u, inv = np.unique(flag, return_inverse=True)
        return pa.table(
            {
                "shipmode": pa.array(u, pa.string()),
                "hi_part": pa.array(
                    np.bincount(inv, hi_mask).astype(np.int64), pa.int64()
                ),
                "lo_part": pa.array(
                    np.bincount(inv, ~hi_mask).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        lines.join(orders, join_type="inner", on=("l_orderkey",),
                   **join_args(size_hint_rows=pq.read_metadata(
                       f"{sf_dir}/lineitem.parquet").num_rows))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shipmode")
        .aggregate(
            Sum("hi_part", alias_name="high_line_count"),
            Sum("lo_part", alias_name="low_line_count"),
        )
    )


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14-shaped (promotion-revenue share): lineitem scan with the
    part dimension BROADCAST as a promo-key membership set (np.isin per
    batch — the small-side-lookup discipline; no shuffle at all), exact
    integer cents x basis-points revenue in both branches, one-row
    output.  The float promo share is left to the consumer; the oracle
    compares the two integer sums bitwise."""
    from ray.data.aggregate import Sum

    lo = np.datetime64("1996-03-01")
    hi = np.datetime64("1996-04-01")
    promo_keys = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        filters=[("p_type", "==", "PROMO")],
    ).column("p_partkey").to_numpy()

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy()
        m = (ship >= lo) & (ship < hi)
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy()[m] * 100
        ).astype(np.int64)
        disc_bp = np.round(
            batch.column("l_discount").to_numpy()[m] * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc_bp)
        promo = np.isin(batch.column("l_partkey").to_numpy()[m], promo_keys)
        return pa.table(
            {
                "grp": pa.array([0], pa.int64()),
                "promo_part": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_part": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(
            Sum("promo_part", alias_name="promo_rev_cbp"),
            Sum("total_part", alias_name="total_rev_cbp"),
        )
    )


def q_edit_distance(sf_dir: str):
    """Exact Levenshtein over id-adjacent candidate pairs — the verify
    kernel of fuzzy dedup, with DuckDB's levenshtein() as the twin."""
    return text.edit_distance_pairs(docs_ds(sf_dir, ["doc_id", "text"]))


def q_topk_per_group(sf_dir: str, k: int = 3):
    """Per-group top-k (top-3 longest docs per lang, ties doc_id-asc) —
    the grouped-ranking shape done WITHOUT a sort shuffle: per-batch
    partial top-k per group, tiny single-block merge, rank emitted in the
    final pass.  row_number() window twin."""

    def partial(batch: pa.Table, emit_rank: bool = False) -> pa.Table:
        lang = np.asarray(batch.column("lang").to_pandas(), dtype=object)
        chars = batch.column("n_chars").to_numpy()
        doc = batch.column("doc_id").to_numpy()
        order = np.lexsort((doc, -chars, lang))
        lang, chars, doc = lang[order], chars[order], doc[order]
        bound = np.concatenate([[True], lang[1:] != lang[:-1]])
        grp = np.cumsum(bound) - 1
        pos = np.arange(len(lang)) - np.concatenate([[0], np.flatnonzero(bound)[1:]])[grp]
        keep = pos < k
        cols = {
            "lang": pa.array(lang[keep].tolist(), pa.string()),
            "doc_id": pa.array(doc[keep], pa.int64()),
            "n_chars": pa.array(chars[keep], pa.int64()),
        }
        if emit_rank:
            cols["rk"] = pa.array((pos[keep] + 1).astype(np.int64), pa.int64())
        return pa.table(cols)

    return (
        docs_ds(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # partial top-ks: <= groups x k rows per block
        .map_batches(lambda b: partial(b, emit_rank=True), batch_format="pyarrow")
    )


def q_corpus_checksum(sf_dir: str):
    """Order-independent corpus integrity fingerprint: the wrapping-uint64
    sum of each doc's md5(lower(text)) high half, plus the row count — the
    cheap consistency check run after every snapshot copy/migration
    (commutative, so block order and partitioning cannot change it).
    Per-batch C-speed md5 + one wrapping partial sum; tiny single-block
    finish.  Exact HUGEINT-mod twin."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import numpy as np

    from ..functions.vmd5 import digest128_u64_arrow

    def partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column("text"))
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        import hashlib
        hi, _ = digest128_u64_arrow(low, algo=hashlib.md5)
        s = np.uint64(0)
        for v in (hi.astype(np.uint64),):
            with np.errstate(over="ignore"):
                s = np.uint64(v.sum(dtype=np.uint64))
        return pa.table({
            "part": pa.array([np.int64(int(s) - (1 << 64) * (int(s) >> 63))],
                             pa.int64()),
            "n_part": pa.array([batch.num_rows], pa.int64()),
        })

    def finish(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            total = np.uint64(parts.sum(dtype=np.uint64))
        n = int(batch.column("n_part").to_numpy().sum())
        t = int(total)
        return pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "checksum": pa.array([t - (1 << 64) * (t >> 63)], pa.int64()),
        })

    return (
        docs_ds(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def q_vocab_coverage(sf_dir: str):
    """Tokenizer coverage curve: corpus-token coverage of the top-k vocab at
    k = 1..1024 (powers of two) — integers only; window-sum SQL twin."""
    return text.vocab_coverage(docs_ds(sf_dir, ["doc_id", "text"]))


def q_next_token(sf_dir: str):
    """Greedy bigram-LM next-token table (per-w1 argmax, ties lexicographic)
    — per-key argmax WITHOUT a sort shuffle; row_number() twin."""
    return text.next_token(docs_ds(sf_dir, ["doc_id", "text"]))


def q_bigram_surprisal(sf_dir: str):
    """Conditional bigram-LM quality scoring: per adjacent pair,
    max(0, bitlen(c(w1)) - bitlen(c(w1,w2))) bits with broadcast top-512
    bigram / top-256 unigram vocabularies — the order-2 companion of
    unigram_surprisal, bitwise SQL twin."""
    return text.bigram_surprisal(docs_ds(sf_dir, ["doc_id", "text"]))


def q_bfs_reach(sf_dir: str, hops: int = 3):
    """Bounded-hop BFS reachability (3 hops from doc_id%101==0 seeds) over
    the shared :func:`link_graph` — frontier-broadcast iteration, fully
    unrolled SQL twin.  Dispatches to the bucketed path past the
    broadcast V budget."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    if n > graph.BROADCAST_MAX_NODES:
        return graph.bfs_bucketed(e, n_nodes=n, hops=hops)
    return ray.data.from_pandas(graph.bfs_hops(e, n_nodes=n, hops=hops))


def q_bfs_reach_bucketed(sf_dir: str, hops: int = 3):
    """:func:`q_bfs_reach` FORCED through the bucketed path — frontier and
    reached sets as Datasets, 2 exchanges per hop (``graph.bfs_bucketed``).
    Same oracle as ``bfs_reach``."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    return graph.bfs_bucketed(e, n_nodes=n, hops=hops)


def q_sssp_bounded(sf_dir: str, rounds: int = 3):
    """Bounded-round WEIGHTED shortest paths (3 Bellman-Ford relaxations
    from doc_id%101==0 seeds) over the shared :func:`link_graph` with
    deterministic integer edge weights — the weighted companion of
    :func:`q_bfs_reach`; fully-unrolled min-plus SQL twin.  Dispatches to
    the bucketed path past the broadcast V budget."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    if n > graph.BROADCAST_MAX_NODES:
        return graph.sssp_bucketed(e, n_nodes=n, rounds=rounds)
    return ray.data.from_pandas(graph.sssp_rounds(e, n_nodes=n, rounds=rounds))


def q_sssp_bucketed(sf_dir: str, rounds: int = 3):
    """:func:`q_sssp_bounded` FORCED through the bucketed path — sparse
    distance Dataset, relax + bucketed-min exchanges per round
    (``graph.sssp_bucketed``).  Same oracle as ``sssp_bounded``."""
    from ..stages import graph

    e, n = link_graph(sf_dir)
    return graph.sssp_bucketed(e, n_nodes=n, rounds=rounds)


def q_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov distribution-drift statistic between
    every source pair over doc length (``n_chars``) — integer-exact:
    ``d_num = max_v |ecdf_a(v) * n_b - ecdf_b(v) * n_a|`` (the KS D scaled
    by ``n_a * n_b``, so no float division anywhere).  Scale shape mirrors
    :func:`q_length_hist_sim`: per-batch (source, value) count partials ->
    ONE bounded groupby (sources x distinct lengths — the VALUE domain, not
    the row count) -> a single-block pivot/cumsum/pair pass.  At 10^12 rows
    the cross-products exceed int64 — the scale path divides the cumsums
    through by a common 2^k first (same argmax); the test-scale integers
    stay exact.  Window-cumsum SQL twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame({
                "source": np.asarray(batch.column("source").to_pandas(),
                                     dtype=object),
                "v": batch.column("n_chars").to_numpy(),
            })
            .groupby(["source", "v"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        docs_ds(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        piv = (
            df.pivot_table(index="v", columns="source", values="n",
                           fill_value=0, aggfunc="sum")
            .sort_index()
        )
        srcs = sorted(piv.columns)
        cum = piv[srcs].to_numpy(np.int64).cumsum(axis=0)
        tot = cum[-1] if len(cum) else np.zeros(len(srcs), np.int64)
        rows = []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                d = int(np.abs(cum[:, i] * tot[j] - cum[:, j] * tot[i]).max()) \
                    if len(cum) else 0
                rows.append((srcs[i], srcs[j], int(tot[i]), int(tot[j]), d))
        return pa.table({
            "src_a": pa.array([r[0] for r in rows], pa.string()),
            "src_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "d_num": pa.array([r[4] for r in rows], pa.int64()),
        })

    return hist.repartition(1).map_batches(pairs, batch_format="pyarrow")


def q_chi2_cells(sf_dir: str):
    """Chi-square independence audit cells for the (lang x source)
    contingency table — per cell the observed count, both margins, the
    grand total and the integer deviation ``dev = n * total - row * col``
    (the chi-square numerator before squaring/normalizing, exact in int64).
    Per-batch count partials -> ONE tiny groupby (langs x sources cells) ->
    margins in a single-block pass.  Margin-join SQL twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame({
                "lang": np.asarray(batch.column("lang").to_pandas(),
                                   dtype=object),
                "source": np.asarray(batch.column("source").to_pandas(),
                                     dtype=object),
            })
            .groupby(["lang", "source"], as_index=False).size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cells = (
        docs_ds(sf_dir, ["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n"].astype(np.int64)
        row = df.groupby("lang")["n"].transform("sum").astype(np.int64)
        col = df.groupby("source")["n"].transform("sum").astype(np.int64)
        tot = int(n.sum())
        return pa.table({
            "lang": pa.array(df["lang"], pa.string()),
            "source": pa.array(df["source"], pa.string()),
            "n": pa.array(n, pa.int64()),
            "row_n": pa.array(row, pa.int64()),
            "col_n": pa.array(col, pa.int64()),
            "total_n": pa.array(np.full(len(df), tot, np.int64), pa.int64()),
            "dev": pa.array(n * tot - row * col, pa.int64()),
        })

    return cells.repartition(1).map_batches(finish, batch_format="pyarrow")


def q_tpch_q18(sf_dir: str, qty_threshold: int = 300, k: int = 100):
    """TPC-H Q18 (large-volume customers): orders whose total lineitem
    quantity exceeds ``qty_threshold``, joined back to order metadata and
    the customer name, top-``k`` by (o_totalprice desc, orderkey asc).

    Scale plan, stage by stage (ONE exchange total — profiled at sf0.1
    the groupby barrier + the native hash join serialized into two
    all-to-all waits, so the HAVING aggregate and the join-back are FUSED
    onto one orderkey-hash bucket shuffle; shuffle VOLUME is unchanged,
    the join shipped every order row anyway):

    * lineitem side: per-batch partial qty sums (bounded by distinct
      orderkeys per batch), side-tagged;
    * orders side: narrow projected rows, side-tagged, SAME bucket key —
      the survivor set never exists as a separate dataset, it is derived
      inside each bucket (at 10^12 rows it is still billions; never a
      driver list);
    * each bucket merges qty partials (lexsort + reduceat — the built-in
      Sum Aggregate at ~150k keys measured ~2x slower), applies the
      HAVING filter, attaches matching order rows via sorted searchsorted,
      and emits its partial top-k (<= k rows per bucket);
    * top-k WITHOUT a global sort: one tiny final sort over n_buckets x k
      candidates (the :func:`q_topk_events` / brute-top-k pattern);
    * customer names attach AFTER the top-k — a filtered parquet read of
      exactly k keys (predicate pushdown), never a broadcast of the full
      customer table.
    """
    from ..pipelines.flagship import shuffle_partitions

    n_buckets = shuffle_partitions()

    def qty_partial(batch: pa.Table) -> pa.Table:
        key = batch.column("l_orderkey").to_numpy()
        qty = np.round(batch.column("l_quantity").to_numpy()).astype(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        m = len(u)
        # overloaded narrow exchange: p = qty_part on this side
        z = pa.array(np.zeros(m, np.int64), pa.int64())
        return pa.table({
            "o_orderkey": pa.array(u, pa.int64()),
            "p": pa.array(np.bincount(inv, qty).astype(np.int64), pa.int64()),
            "q": z, "r": z,
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "obucket": pa.array(u % n_buckets, pa.int64()),
        })

    def orders_side(batch: pa.Table) -> pa.Table:
        okey = batch.column("o_orderkey").to_numpy()
        m = len(okey)
        # overloaded: p = o_custkey, q = odate_us, r = totalprice_c
        return pa.table({
            "o_orderkey": pa.array(okey, pa.int64()),
            "p": batch.column("o_custkey").cast(pa.int64()),
            "q": batch.column("o_orderdate").cast(pa.int64()),
            "r": pa.array(
                np.round(batch.column("o_totalprice").to_numpy() * 100
                         ).astype(np.int64), pa.int64()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "obucket": pa.array(okey % n_buckets, pa.int64()),
        })

    OUT_SCHEMA = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("odate_us", pa.int64()), ("totalprice_c", pa.int64()),
        ("sum_qty", pa.int64()),
    ])

    def bucket_body(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        side = g.column("side").to_numpy()
        lmask = side == 0
        key = g.column("o_orderkey").to_numpy()[lmask]
        if key.size == 0:
            return OUT_SCHEMA.empty_table()
        qp = g.column("p").to_numpy()[lmask]
        order = np.argsort(key, kind="stable")
        key_s, qp_s = key[order], qp[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(key_s)) + 1])
        sums = np.add.reduceat(qp_s, starts)
        keep = sums > qty_threshold
        hot_keys = key_s[starts][keep]          # sorted ascending
        hot_sums = sums[keep]
        if hot_keys.size == 0:
            return OUT_SCHEMA.empty_table()
        omask = ~lmask
        okey = g.column("o_orderkey").to_numpy()[omask]
        pos = np.searchsorted(hot_keys, okey)
        pos_c = np.minimum(pos, hot_keys.size - 1)
        hit = (pos < hot_keys.size) & (hot_keys[pos_c] == okey)
        price = g.column("r").to_numpy()[omask][hit]
        okey_h = okey[hit]
        cust = g.column("p").to_numpy()[omask][hit]
        odate = g.column("q").to_numpy()[omask][hit]
        sq = hot_sums[pos_c[hit]]
        # partial top-k inside the bucket
        if len(price) > k:
            thresh = np.partition(price, len(price) - k)[len(price) - k]
            cand_i = np.flatnonzero(price >= thresh)
            sel = cand_i[np.lexsort((okey_h[cand_i], -price[cand_i]))][:k]
        else:
            sel = np.lexsort((okey_h, -price))[:k]
        return pa.table({
            "o_orderkey": pa.array(okey_h[sel], pa.int64()),
            "o_custkey": pa.array(cust[sel], pa.int64()),
            "odate_us": pa.array(odate[sel], pa.int64()),
            "totalprice_c": pa.array(price[sel], pa.int64()),
            "sum_qty": pa.array(sq[sel], pa.int64()),
        })

    cand = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"],
        ).map_batches(orders_side, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["obucket"])),
                    batch_format="pyarrow")
    )
    top = (
        cand.sort(["totalprice_c", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    # name lookup for exactly k customers: row-group-pruned parquet read
    keys = sorted(set(int(x) for x in top["o_custkey"]))
    names = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas().set_index("c_custkey")["c_name"]
    top["c_name"] = top["o_custkey"].map(names)
    return top[["c_name", "o_custkey", "o_orderkey", "odate_us",
                "totalprice_c", "sum_qty"]]


def q_lone_returner(sf_dir: str, n_buckets: int = 256):
    """TPC-H Q21-shaped exists/NOT-exists audit on the available columns:
    per supplier, the number of multi-supplier orders where THIS supplier
    had a returned line (l_returnflag = 'R') and no other supplier did —
    the classic "who alone caused the problem" attribution query.

    Scale plan: per-batch partial collapse to distinct (orderkey,
    suppkey, had_return) — bounded by lines-per-batch — then ONE shuffle
    on hash(orderkey) buckets (thousands of orders per group call, never
    groupby(orderkey) per-tiny-group); in-group logic is a lexsort +
    run-boundary vectorization; final per-supplier count is a second
    small aggregate."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        okey = batch.column("l_orderkey").to_numpy()
        skey = batch.column("l_suppkey").to_numpy()
        flag = batch.column("l_returnflag").to_pandas().to_numpy(object)
        ret = (flag == "R").astype(np.int64)
        pairs = np.stack([okey, skey], axis=1)
        u, inv = np.unique(pairs, axis=0, return_inverse=True)
        had = np.bincount(inv, ret).astype(np.int64) > 0
        return pa.table({
            "okey": pa.array(u[:, 0], pa.int64()),
            "skey": pa.array(u[:, 1], pa.int64()),
            "had_ret": pa.array(had.astype(np.int64), pa.int64()),
            "bucket": pa.array((u[:, 0] * 2654435761 % 4294967296)
                               % n_buckets, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # guard: new[0]=True raises on empty
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        okey = g.column("okey").to_numpy()
        skey = g.column("skey").to_numpy()
        had = g.column("had_ret").to_numpy()
        order = np.lexsort((skey, okey))
        okey, skey, had = okey[order], skey[order], had[order]
        # collapse duplicate (okey, skey) across batches: OR of had_ret
        new = np.empty(len(okey), bool)
        new[0] = True
        new[1:] = (okey[1:] != okey[:-1]) | (skey[1:] != skey[:-1])
        grp = np.cumsum(new) - 1
        o = okey[new]
        s = skey[new]
        h = np.bincount(grp, had).astype(np.int64) > 0
        # per order: n suppliers, n suppliers with returns
        ob = np.empty(len(o), bool)
        ob[0] = True
        ob[1:] = o[1:] != o[:-1]
        og = np.cumsum(ob) - 1
        n_supp = np.bincount(og)
        n_ret = np.bincount(og, h)
        lone = h & (n_supp[og] >= 2) & (n_ret[og] == 1)
        if not lone.any():
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        su, sinv = np.unique(s[lone], return_inverse=True)
        return pa.table({
            "l_suppkey": pa.array(su, pa.int64()),
            "n_part": pa.array(np.bincount(sinv).astype(np.int64),
                               pa.int64()),
        })

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["bucket"])),
                    batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("n_part", alias_name="numwait"))
    )


def q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) in ONE shuffle: the finest (lang,
    source) counts are aggregated once; the (lang) and grand-total levels
    are derived from that SMALL result (|langs| x |sources| rows), never
    by re-scanning the input — the classic rollup optimization.  Level
    markers use the '<all>' sentinel on both sides (hash-stable vs
    NULL)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "source": batch.column("source").to_pandas(),
        })
        g = df.groupby(["lang", "source"], sort=False).size().reset_index()
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "source": pa.array(g["source"], pa.string()),
            "n_part": pa.array(g[0].to_numpy(np.int64), pa.int64()),
        })

    fine = (
        docs_ds(sf_dir, ["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def levels(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        by_lang = df.groupby("lang", as_index=False)["n"].sum()
        by_lang["source"] = "<all>"
        total = pd.DataFrame(
            {"lang": ["<all>"], "source": ["<all>"], "n": [df["n"].sum()]}
        )
        out = pd.concat([df, by_lang[["lang", "source", "n"]], total])
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        })

    # the finest level is tiny (distinct langs x sources); one task derives
    # the coarser levels from it
    return fine.repartition(1).map_batches(levels, batch_format="pyarrow")


def q_melt_stats(sf_dir: str):
    """UNPIVOT/melt: wide per-doc stats -> long (doc_id, metric, value)
    triples, entirely inside map_batches (a k-fold concat per batch — no
    shuffle at all; the op is embarrassingly parallel)."""
    def melt(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        chars = batch.column("n_chars").to_numpy().astype(np.int64)
        words = np.asarray(
            pc.count_substring(batch.column("text"), " ").to_numpy(
                zero_copy_only=False), np.int64) + 1
        metrics = [("n_chars", chars), ("n_words", words)]
        n = len(d)
        return pa.table({
            "doc_id": pa.array(np.tile(d, len(metrics)), pa.int64()),
            "metric": pa.array(
                np.repeat([m for m, _ in metrics], n), pa.string()),
            "value": pa.array(
                np.concatenate([v for _, v in metrics]), pa.int64()),
        })

    import pyarrow.compute as pc  # noqa: F811 (batch-local kernels)

    return docs_ds(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        melt, batch_format="pyarrow")


def q_lang_head_concat(sf_dir: str, k: int = 8):
    """Grouped ORDERED string aggregation, bounded: per lang, the comma-
    joined k SMALLEST doc_ids.  Unbounded string_agg is a scale hazard
    (one group's concat can be the whole corpus); the bounded-k variant
    keeps per-batch bottom-k partials so the shuffle moves <= k ids per
    (batch, lang) and the final concat is O(k) per group."""
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "doc_id": batch.column("doc_id").to_numpy(),
        })
        g = df.sort_values("doc_id", kind="stable").groupby(
            "lang", sort=False).head(k)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pa.Table) -> pa.Table:
        lang = g.column("lang")[0].as_py()
        ids = np.sort(g.column("doc_id").to_numpy())[:k]
        return pa.table({
            "lang": pa.array([lang], pa.string()),
            "head_ids": pa.array(
                [",".join(str(int(i)) for i in ids)], pa.string()),
        })

    return (
        docs_ds(sf_dir, ["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pyarrow")
    )


def q_qty_disc_corr(sf_dir: str):
    """Pearson-correlation NUMERATORS per l_returnflag in exact integers:
    (n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) over x = quantity,
    y = discount pct — the one-pass parallel moment collection behind
    corr/covar/regression; r itself is a consumer-side division.  Both
    domains are tiny ints so every sum stays far inside int64 at any
    corpus size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_pandas().to_numpy(object)
        x = np.round(batch.column("l_quantity").to_numpy()).astype(np.int64)
        y = np.round(batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        u, inv = np.unique(flag, return_inverse=True)
        def s(v):
            return np.bincount(inv, v).astype(np.int64)
        return pa.table({
            "l_returnflag": pa.array(u.astype(str), pa.string()),
            "n_p": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "sx_p": pa.array(s(x), pa.int64()),
            "sy_p": pa.array(s(y), pa.int64()),
            "sxy_p": pa.array(s(x * y), pa.int64()),
            "sx2_p": pa.array(s(x * x), pa.int64()),
            "sy2_p": pa.array(s(y * y), pa.int64()),
        })

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("sx_p", alias_name="sum_x"),
            Sum("sy_p", alias_name="sum_y"),
            Sum("sxy_p", alias_name="sum_xy"),
            Sum("sx2_p", alias_name="sum_x2"),
            Sum("sy2_p", alias_name="sum_y2"),
        )
    )


def q_modal_source(sf_dir: str):
    """Statistical MODE per group with a deterministic tie-break: the most
    frequent source per lang (ties -> lexicographically smallest source).
    One shuffle on the (lang, source) pair; the argmax runs over the tiny
    aggregated table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "source": batch.column("source").to_pandas(),
        })
        g = df.groupby(["lang", "source"], sort=False).size().reset_index()
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "source": pa.array(g["source"], pa.string()),
            "n_part": pa.array(g[0].to_numpy(np.int64), pa.int64()),
        })

    fine = (
        docs_ds(sf_dir, ["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def argmax(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["lang", "n", "source"], ascending=[True, False, True],
            kind="stable")
        top = df.groupby("lang", sort=False).head(1)
        return pa.table({
            "lang": pa.array(top["lang"], pa.string()),
            "modal_source": pa.array(top["source"], pa.string()),
            "n": pa.array(top["n"].to_numpy(np.int64), pa.int64()),
        })

    return fine.repartition(1).map_batches(argmax, batch_format="pyarrow")


def q_tpch_q10(sf_dir: str, lo_us: int = 820_454_400_000_000,  # 1996-01-01
               hi_us: int = 828_316_800_000_000,                # 1996-04-01
               k: int = 20):
    """TPC-H Q10 (returned-item revenue): customers ranked by revenue
    lost to returns in a quarter.  Four-table shape on the available
    columns: lineitem('R') |><| orders(window) is the ONE big-big hash
    exchange; customer and nation attach as broadcast int->attr maps
    (both are the small side by construction); revenue in exact integer
    cents x (100 - disc_pct); top-k via per-batch partial top-k, never a
    global sort."""
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat.column("n_nationkey").to_pylist(),
                    nat.column("n_name").to_pylist()))

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (odate >= lo_us) & (odate < hi_us)
        return pa.table({
            "l_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
            "o_custkey": batch.column("o_custkey").filter(pa.array(keep)),
        })

    def line_side(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_pandas().to_numpy(object)
        keep = pa.array(flag == "R")
        price_c = np.round(batch.column("l_extendedprice")
                           .filter(keep).to_numpy() * 100).astype(np.int64)
        disc = np.round(batch.column("l_discount")
                        .filter(keep).to_numpy() * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").filter(keep),
            "rev": pa.array(price_c * (100 - disc), pa.int64()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow")
    per_cust = (
        lines.join(orders, join_type="inner",
                   **join_args(size_hint_rows=pq.read_metadata(
                       f"{sf_dir}/lineitem.parquet").num_rows),
                   on=("l_orderkey",))
        .groupby("o_custkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue").to_numpy()
        key = batch.column("o_custkey").to_numpy()
        if len(rev) > k:
            thresh = np.partition(rev, len(rev) - k)[len(rev) - k]
            cand = np.flatnonzero(rev >= thresh)
            sel = cand[np.lexsort((key[cand], -rev[cand]))][:k]
        else:
            sel = np.lexsort((key, -rev))[:k]
        return batch.take(pa.array(sel))

    top = (
        per_cust.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["revenue", "o_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    # customer attrs attach AFTER the cut: a row-group-pruned read of
    # exactly k keys (q_tpch_q18 pattern) — never a driver-side load of
    # the full customer table (at 10^12-lineitem scale customer itself
    # is billions of rows)
    keys = sorted(set(int(x) for x in top["o_custkey"]))
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas().set_index("c_custkey")
    top["c_name"] = top["o_custkey"].map(cust["c_name"])
    top["acctbal_c"] = (
        top["o_custkey"].map(cust["c_acctbal"]) * 100).round().astype(np.int64)
    top["n_name"] = top["o_custkey"].map(cust["c_nationkey"]).map(
        lambda n: nmap[int(n)])
    return top[["o_custkey", "c_name", "revenue", "acctbal_c", "n_name"]]


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19-shaped disjunctive-predicate join on the available
    columns: revenue from lineitems whose part matches ANY of three
    (brand, size-range, qty-range) arms — the classic OR-of-ANDs
    predicate that defeats naive pushdown.  Scale plan: part collapses
    to a BROADCAST bitmask (3 bits per partkey, one byte each — ~1 GB
    per 10^9 parts, object-store shared, read zero-copy per task), so
    the probe is one gather + compare per batch and NO join exchange
    happens at all."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    brand = np.asarray(part.column("p_brand").to_pylist(), object)
    size = part.column("p_size").to_numpy()
    arms = ((brand == "Brand#12") & (size >= 1) & (size <= 5),
            (brand == "Brand#23") & (size >= 1) & (size <= 10),
            (brand == "Brand#7") & (size >= 1) & (size <= 15))
    mask = np.zeros(int(pk.max()) + 2, np.uint8)
    for i, arm in enumerate(arms):
        mask[pk[arm]] |= 1 << i
    import ray as _ray
    mask_ref = _ray.put(mask)
    qty_arms = ((1, 11), (10, 20), (20, 30))

    def probe(batch: pa.Table) -> pa.Table:
        m = _ray.get(mask_ref) if isinstance(mask_ref, _ray.ObjectRef) else mask_ref
        pkey = batch.column("l_partkey").to_numpy()
        qty = np.round(batch.column("l_quantity").to_numpy()).astype(np.int64)
        bits = m[np.minimum(pkey, len(m) - 1)]
        hit = np.zeros(len(pkey), bool)
        for i, (qlo, qhi) in enumerate(qty_arms):
            hit |= ((bits & (1 << i)) > 0) & (qty >= qlo) & (qty <= qhi)
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc = np.round(
            batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        rev = np.where(hit, price_c * (100 - disc), 0).sum()
        n = int(hit.sum())
        return pa.table({"rev_part": pa.array([rev], pa.int64()),
                         "n_part": pa.array([np.int64(n)], pa.int64())})

    from ray.data.aggregate import Sum

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"])
        .map_batches(probe, batch_format="pyarrow")
        .aggregate(Sum("rev_part", alias_name="revenue"),
                   Sum("n_part", alias_name="n_lines"))
    )
    return pd.DataFrame({"revenue": [out["revenue"]],
                         "n_lines": [out["n_lines"]]})


def q_tpch_q22(sf_dir: str, nation_mod: int = 3,
               since_us: int = 946_684_800_000_000):  # 2000-01-01
    """TPC-H Q22-shaped (global-balance anti-join): customers from a
    nation subset whose balance exceeds the positive-balance average of
    that subset AND who have placed no orders since ``since_us``
    (the lapsed-customer variant — the synthetic corpus gives every
    customer SOME order, so the recency window keeps the NOT EXISTS arm
    non-degenerate), counted per nation.

    Scale plan: the scalar subquery (global avg) is TWO driver floats
    from one aggregate pass; rich customers stream against the orders
    key side through the native LEFT OUTER join + null filter (the
    ``anti_join`` pattern — never a driver-side key set); final count is
    a tiny per-nation groupby.  Balances compare in exact cents
    (avg as exact integer-ratio cross-multiplication: bal * n > sum)."""
    from ray.data.aggregate import Count, Sum

    def bal_partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy()
        bal_c = np.round(
            batch.column("c_acctbal").to_numpy() * 100).astype(np.int64)
        keep = (nk % nation_mod == 0) & (bal_c > 0)
        return pa.table({"s": pa.array([bal_c[keep].sum()], pa.int64()),
                         "n": pa.array([np.int64(keep.sum())], pa.int64())})

    cust_path = f"{sf_dir}/customer.parquet"
    agg = (
        ray.data.read_parquet(cust_path, columns=["c_nationkey", "c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    tot_s, tot_n = int(agg["s"]), int(agg["n"])

    def rich(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy()
        bal_c = np.round(
            batch.column("c_acctbal").to_numpy() * 100).astype(np.int64)
        # bal > avg  <=>  bal * n > sum  (exact integers, no division)
        keep = (nk % nation_mod == 0) & (bal_c * tot_n > tot_s)
        return pa.table({
            "c_custkey": batch.column("c_custkey").filter(pa.array(keep)),
            "c_nationkey": pa.array(nk[keep], pa.int64()),
            "bal_c": pa.array(bal_c[keep], pa.int64()),
        })

    rich_ds = ray.data.read_parquet(
        cust_path, columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(rich, batch_format="pyarrow")

    def okeys(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = pa.array(odate >= since_us)
        u = np.unique(batch.column("o_custkey").filter(keep).to_numpy())
        return pa.table({"c_custkey": pa.array(u, pa.int64()),
                         "has_order": pa.array(np.ones(len(u), np.int8),
                                               pa.int8())})

    orders = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])
        .map_batches(okeys, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .add_column("has_order", lambda df: pd.Series(
            np.ones(len(df), np.int8)))
    )
    joined = rich_ds.join(
        orders, join_type="left_outer",
        **join_args(size_hint_rows=pq.read_metadata(cust_path).num_rows),
        on=("c_custkey",))

    def census(batch: pa.Table) -> pa.Table:
        has = batch.column("has_order").to_numpy(zero_copy_only=False)
        none = pa.array(pd.isna(has) | (has != 1))
        kept = batch.filter(none)
        nk = kept.column("c_nationkey").to_numpy()
        bal = kept.column("bal_c").to_numpy()
        u, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "c_nationkey": pa.array(u, pa.int64()),
            "n_part": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "bal_part": pa.array(np.bincount(inv, bal).astype(np.int64),
                                 pa.int64()),
        })

    from ray.data.aggregate import Sum as _Sum

    return (
        joined.map_batches(census, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(_Sum("n_part", alias_name="numcust"),
                   _Sum("bal_part", alias_name="totacctbal_c"))
    )


def q_props_stats(sf_dir: str):
    """JSON field extraction over the events ``props`` column (vectorized
    RE2 ``extract_regex`` — the JSON-scalar fast path every log pipeline
    needs; no per-row json.loads) + per-type aggregate of the extracted
    integer: n with the field, sum / min / max.  The generic nested
    accessor lives in ``functions/structs.py``; this is the columnar
    hot-path variant for flat scalar fields."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        et = batch.column("event_type").to_pandas().to_numpy(object)
        valid = ~np.asarray(pc.is_null(k).to_numpy(zero_copy_only=False))
        kv = k.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        u, inv = np.unique(et[valid], return_inverse=True)
        if len(u) == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
                "s_p": pa.array([], pa.int64()),
                "mn_p": pa.array([], pa.int64()),
                "mx_p": pa.array([], pa.int64()),
            })
        mn = np.full(len(u), np.iinfo(np.int64).max)
        np.minimum.at(mn, inv, kv)
        mx = np.full(len(u), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, kv)
        return pa.table({
            "event_type": pa.array(u.astype(str), pa.string()),
            "n_p": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "s_p": pa.array(np.bincount(inv, kv).astype(np.int64), pa.int64()),
            "mn_p": pa.array(mn, pa.int64()),
            "mx_p": pa.array(mx, pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_p", alias_name="n"),
                   Sum("s_p", alias_name="sum_k"),
                   Min("mn_p", alias_name="min_k"),
                   Max("mx_p", alias_name="max_k"))
    )


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7-shaped (volume shipping): the full customer-nation x
    supplier-nation x ship-year revenue matrix.  Same broadcast-dims +
    one-big-big-exchange discipline as :func:`q_tpch_q5` (side-tagged
    union bucketed on orderkey; the group body fuses the probe join and
    the cell partial, so the final groupby moves only <= n_buckets x 625
    x years partial rows), with the pair-matrix output instead of the
    region filter.

    Broadcast budget: custkey->nationkey ships as a sorted-key searchsorted
    pair today; as a DENSE int8 array it holds to ~10^10 customers (~10 GB
    object-store resident, read zero-copy per task).  Beyond that the
    dimension attach becomes a second hash join — same plan shape, one
    more exchange."""
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    order_c = np.argsort(ck, kind="stable")
    c_keys, c_nat = ck[order_c], cust.column("c_nationkey").to_numpy()[order_c]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    order_s = np.argsort(sk, kind="stable")
    s_keys, s_nat = sk[order_s], supp.column("s_nationkey").to_numpy()[order_s]

    N_BUCKETS = 64

    def orders_side(batch: pa.Table) -> pa.Table:
        okey = batch.column("o_custkey").to_numpy()
        pos = np.searchsorted(c_keys, okey)
        lkey = batch.column("o_orderkey").to_numpy()
        m = len(lkey)
        # overloaded narrow exchange: p = c_nation on this side
        z = pa.array(np.zeros(m, np.int64), pa.int64())
        return pa.table({
            "l_orderkey": pa.array(lkey, pa.int64()),
            "p": pa.array(
                c_nat[np.minimum(pos, len(c_keys) - 1)], pa.int64()),
            "q": z, "r": z,
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "obucket": pa.array(lkey % N_BUCKETS, pa.int64()),
        })

    def line_side(batch: pa.Table) -> pa.Table:
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc = np.round(
            batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        ship = batch.column("l_shipdate").to_numpy()  # datetime64[us]
        year = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        skey = batch.column("l_suppkey").to_numpy()
        pos = np.searchsorted(s_keys, skey)
        lkey = batch.column("l_orderkey").to_numpy()
        m = len(lkey)
        # overloaded: p = s_nation, q = ship_year, r = rev
        return pa.table({
            "l_orderkey": pa.array(lkey, pa.int64()),
            "p": pa.array(
                s_nat[np.minimum(pos, len(s_keys) - 1)], pa.int64()),
            "q": pa.array(year, pa.int64()),
            "r": pa.array(price_c * (100 - disc), pa.int64()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "obucket": pa.array(lkey % N_BUCKETS, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        # fused probe join + cell partial (see q_tpch_q5.bucket_body)
        empty = pa.table({
            "c_nation": pa.array([], pa.int64()),
            "s_nation": pa.array([], pa.int64()),
            "ship_year": pa.array([], pa.int64()),
            "rev_p": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        om = side == 0
        okeys = g.column("l_orderkey").to_numpy()[om]
        if okeys.size == 0:
            return empty
        order = np.argsort(okeys, kind="stable")
        okeys_s = okeys[order]
        cnat_s = g.column("p").to_numpy()[om][order]
        lm = ~om
        lkey = g.column("l_orderkey").to_numpy()[lm]
        pos = np.searchsorted(okeys_s, lkey)
        posc = np.minimum(pos, okeys_s.size - 1)
        hit = (pos < okeys_s.size) & (okeys_s[posc] == lkey)
        if not hit.any():
            return empty
        cn = cnat_s[posc[hit]]
        sn = g.column("p").to_numpy()[lm][hit]
        yr = g.column("q").to_numpy()[lm][hit]
        rev = g.column("r").to_numpy()[lm][hit]
        key = (cn * 25 + sn) * 10000 + yr
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "c_nation": pa.array(u // 250000, pa.int64()),
            "s_nation": pa.array(u // 10000 % 25, pa.int64()),
            "ship_year": pa.array(u % 10000, pa.int64()),
            "rev_p": pa.array(np.bincount(inv, rev).astype(np.int64),
                              pa.int64()),
        })

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(orders_side, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["obucket"])),
                    batch_format="pyarrow")
        .groupby(["c_nation", "s_nation", "ship_year"])
        .aggregate(Sum("rev_p", alias_name="revenue"))
    )


def q_tpch_q4(sf_dir: str,
              lo_us: int = 836_179_200_000_000,   # 1996-07-01 epoch us
              hi_us: int = 844_128_000_000_000):  # 1996-10-01
    """TPC-H Q4-shaped (order priority checking) on the available columns:
    orders placed in a quarter that EXISTS-match a returned lineitem
    (l_returnflag = 'R' stands in for commitdate < receiptdate), counted
    per o_orderpriority.

    Scale plan: ONE side-tagged orderkey-hash bucket exchange — the line
    side collapses per batch to DISTINCT returned orderkeys (bounded by
    batch size), the orders side ships (orderkey, priority) for the
    window only; each bucket probes membership with one sorted
    searchsorted and emits per-priority count partials; the final
    groupby-sum moves <= n_buckets x 5 rows."""
    from ray.data.aggregate import Sum

    N_BUCKETS = 64

    def line_side(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        okey = batch.column("l_orderkey").to_numpy()[flag == "R"]
        u = np.unique(okey)
        m = len(u)
        return pa.table({
            "o_orderkey": pa.array(u, pa.int64()),
            "o_orderpriority": pa.nulls(m, pa.string()),
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "obucket": pa.array(u % N_BUCKETS, pa.int64()),
        })

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (odate >= lo_us) & (odate < hi_us)
        kept = batch.filter(pa.array(keep))
        okey = kept.column("o_orderkey").to_numpy()
        m = len(okey)
        return pa.table({
            "o_orderkey": pa.array(okey, pa.int64()),
            "o_orderpriority": kept.column("o_orderpriority"),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "obucket": pa.array(okey % N_BUCKETS, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        lm = side == 0
        ret_keys = np.unique(g.column("o_orderkey").to_numpy()[lm])
        if ret_keys.size == 0:
            return empty
        om = ~lm
        okey = g.column("o_orderkey").to_numpy()[om]
        pos = np.searchsorted(ret_keys, okey)
        posc = np.minimum(pos, ret_keys.size - 1)
        hit = (pos < ret_keys.size) & (ret_keys[posc] == okey)
        if not hit.any():
            return empty
        pri = g.column("o_orderpriority").filter(
            pa.array(om)).filter(pa.array(hit))
        enc = pri.combine_chunks().dictionary_encode()
        counts = np.bincount(enc.indices.to_numpy(),
                             minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({
            "o_orderpriority": enc.dictionary,
            "n_part": pa.array(counts, pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_returnflag"])
        .map_batches(line_side, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(orders_side, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["obucket"])),
                    batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_part", alias_name="order_count"))
    )


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 (customer order-count distribution): histogram of
    orders-per-customer INCLUDING zero-order customers, with urgent
    orders excluded (stands in for the reference's comment-pattern
    exclusion).

    Scale plan: ONE side-tagged custkey-hash bucket exchange — the orders
    side collapses per batch to (custkey, count) partials, the customer
    side ships bare keys; each bucket merges partials per key with one
    lexsort + reduceat, assigns 0 to customers without orders, and emits
    its own (c_count -> n) histogram partial (bounded by max orders per
    customer); the final groupby-sum moves tiny histogram rows only."""
    from ray.data.aggregate import Sum

    N_BUCKETS = 64

    def orders_side(batch: pa.Table) -> pa.Table:
        pri = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").to_numpy()[pri != "1-URGENT"]
        u, cnt = np.unique(ck, return_counts=True)
        m = len(u)
        return pa.table({
            "c_custkey": pa.array(u, pa.int64()),
            "n_ord": pa.array(cnt.astype(np.int64), pa.int64()),
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "cbucket": pa.array(u % N_BUCKETS, pa.int64()),
        })

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy()
        m = len(ck)
        return pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "n_ord": pa.array(np.zeros(m, np.int64), pa.int64()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "cbucket": pa.array(ck % N_BUCKETS, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        empty = pa.table({"c_count": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        cm = side == 1
        custs = g.column("c_custkey").to_numpy()[cm]  # distinct by source
        if custs.size == 0:
            return empty
        custs_s = np.sort(custs)
        ok = g.column("c_custkey").to_numpy()[~cm]
        on = g.column("n_ord").to_numpy()[~cm]
        per_cust = np.zeros(custs_s.size, np.int64)
        if ok.size:
            pos = np.searchsorted(custs_s, ok)
            posc = np.minimum(pos, custs_s.size - 1)
            hit = (pos < custs_s.size) & (custs_s[posc] == ok)
            np.add.at(per_cust, posc[hit], on[hit])
        cc, n = np.unique(per_cust, return_counts=True)
        return pa.table({
            "c_count": pa.array(cc, pa.int64()),
            "n_part": pa.array(n.astype(np.int64), pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderpriority"])
        .map_batches(orders_side, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        ).map_batches(cust_side, batch_format="pyarrow"))
        .groupby("cbucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["cbucket"])),
                    batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n_part", alias_name="custdist"))
    )


def q_tpch_q15(sf_dir: str,
               lo_us: int = 820_454_400_000_000,   # 1996-01-01 epoch us
               hi_us: int = 828_316_800_000_000):  # 1996-04-01
    """TPC-H Q15 (top supplier): supplier(s) whose quarter revenue equals
    the global maximum — the argmax-over-aggregate shape (the reference's
    "top tiles" report is the same query over tile traffic).

    Scale plan: per-batch (suppkey, rev) partials -> bucketed reduceat
    merge (supplier cardinality is bounded); the global max is a scalar
    aggregate over that SMALL table; names attach via a filtered parquet
    read of exactly the winning keys.  Revenue in exact integer
    cents x basis-points."""
    from ..stages.bucketagg import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ship >= lo_us) & (ship < hi_us)
        sk = batch.column("l_suppkey").to_numpy()[keep]
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        disc = np.round(
            batch.column("l_discount").to_numpy()[keep] * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc)
        u, inv = np.unique(sk, return_inverse=True)
        return pa.table({
            "s_suppkey": pa.array(u, pa.int64()),
            "rev_p": pa.array(np.bincount(inv, rev).astype(np.int64),
                              pa.int64()),
        })

    totals = bucketed_sum(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
        ).map_batches(partial, batch_format="pyarrow"),
        ["s_suppkey"], [("rev_p", "total_rev_cbp")],
    )
    mx = totals.max("total_rev_cbp")
    top = totals.filter(expr=f"total_rev_cbp == {int(mx)}").to_pandas()
    keys = sorted(int(k) for k in top["s_suppkey"])
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys)],
    ).to_pandas().set_index("s_suppkey")["s_name"]
    top = top.sort_values("s_suppkey", ignore_index=True)
    top["s_name"] = top["s_suppkey"].map(names)
    return top[["s_suppkey", "s_name", "total_rev_cbp"]]


def q_tpch_q17(sf_dir: str, brand: str = "Brand#23"):
    """TPC-H Q17 (small-quantity-order revenue): revenue of lineitems of
    one brand's parts whose quantity is below 20% of that part's average
    quantity — the per-group-average join-back shape, exact in integers
    via cross-multiplication (qty < 0.2 * sum/n  <=>  5 * qty * n < sum).

    Scale plan: the brand's partkeys broadcast as a sorted membership
    array (parts are a bounded dimension); survivors take ONE side-tagged
    partkey-hash bucket exchange shipping (partkey, qty partials) AND the
    raw (partkey, qty, price) rows; each bucket computes per-part sum/n
    with one lexsort + reduceat and filters its raw rows by the exact
    integer test; output is a single global (sum_price_cents, n_lines)
    row."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    bm = np.array(part.column("p_brand").to_pylist()) == brand
    bkeys = np.sort(part.column("p_partkey").to_numpy()[bm])

    N_BUCKETS = 64

    def line_sides(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy()
        pos = np.searchsorted(bkeys, pk)
        posc = np.minimum(pos, max(bkeys.size - 1, 0))
        hit = (bkeys.size > 0) & (pos < bkeys.size)
        hit = hit & (bkeys[posc] == pk) if bkeys.size else \
            np.zeros(len(pk), bool)
        pk = pk[hit]
        qty = np.round(batch.column("l_quantity").to_numpy()[hit]
                       ).astype(np.int64)
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy()[hit] * 100
        ).astype(np.int64)
        # side 0: per-batch (part, sum qty, n) partials
        u, inv = np.unique(pk, return_inverse=True)
        m = len(u)
        # overloaded narrow exchange: a/b = (qty_sum, n) on the partial
        # side and (qty, price_c) on the raw side
        partials = pa.table({
            "p_partkey": pa.array(u, pa.int64()),
            "a": pa.array(np.bincount(inv, qty).astype(np.int64),
                          pa.int64()),
            "b": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "pbucket": pa.array(u % N_BUCKETS, pa.int64()),
        })
        # side 1: raw qualifying rows
        raw = pa.table({
            "p_partkey": pa.array(pk, pa.int64()),
            "a": pa.array(qty, pa.int64()),
            "b": pa.array(price_c, pa.int64()),
            "side": pa.array(np.ones(len(pk), np.int8), pa.int8()),
            "pbucket": pa.array(pk % N_BUCKETS, pa.int64()),
        })
        return pa.concat_tables([partials, raw])

    def bucket_body(g: pa.Table) -> pa.Table:
        empty = pa.table({"grp": pa.array([], pa.int64()),
                          "sum_price_c": pa.array([], pa.int64()),
                          "n_lines": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        pm = side == 0
        pk = g.column("p_partkey").to_numpy()[pm]
        if pk.size == 0:
            return empty
        order = np.argsort(pk, kind="stable")
        pk_s = pk[order]
        qs = g.column("a").to_numpy()[pm][order]
        ns = g.column("b").to_numpy()[pm][order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(pk_s)) + 1])
        keys = pk_s[starts]
        sums = np.add.reduceat(qs, starts)
        cnts = np.add.reduceat(ns, starts)
        rm = ~pm
        rk = g.column("p_partkey").to_numpy()[rm]
        pos = np.searchsorted(keys, rk)  # every raw key has partials
        qty = g.column("a").to_numpy()[rm]
        keep = 5 * qty * cnts[pos] < sums[pos]
        price = g.column("b").to_numpy()[rm][keep]
        return pa.table({
            "grp": pa.array([0], pa.int64()),
            "sum_price_c": pa.array([int(price.sum())], pa.int64()),
            "n_lines": pa.array([int(keep.sum())], pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        ).map_batches(line_sides, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["pbucket"])),
                    batch_format="pyarrow")
        .groupby("grp")
        .aggregate(Sum("sum_price_c", alias_name="sum_price_cents"),
                   Sum("n_lines", alias_name="n_small_lines"))
    )


def q_tile_diff(sf_dir: str, zooms=(2, 6)):
    """Archive diff census (``util/CompareArchives.java`` shape over the
    incremental-snapshot story): per (z, tile), mention counts from the
    OLD corpus vs the deterministically-derived v2 snapshot, plus a
    per-tile status (added / removed / changed / same) — the tile-level
    companion of :func:`q_tile_invalidate` (which reports only the dirty
    set).

    Scale shape: BOTH snapshots run the full honest pages -> extract ->
    geoparse chain (the v2 side re-synthesizes pages from the v2 docs
    table — no shortcut through the oracle's collapsed predicate); each
    side collapses per batch to per-tile count partials, and ONE bucketed
    reduceat merge combines them.  Status is a vectorized post-map on the
    merged (tile, n_old, n_new) rows."""
    import pyarrow.compute as pc

    from ..sources.pages import synthesize_pages, extract_stage
    from ..stages.bucketagg import bucketed_sum
    from ..stages.geoparse import geoparse_stage
    from ..stages.tiling import assign_tiles
    from .webgeo import mentions_ds

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def v2_docs_lang(batch: pa.Table) -> pa.Table:
        # _v2_docs with lang carried through for the pages chain (changed
        # docs keep their lang; fresh docs inherit the source doc's)
        d = batch.column("doc_id").to_numpy()
        keep = d % 10 != 0
        kept = batch.filter(pa.array(keep))
        kd = kept.column("doc_id").to_numpy()
        changed = kd % 7 == 0
        suffix = pa.array(np.where(changed, " v2", "").tolist(), pa.string())
        text2 = pc.binary_join_element_wise(kept.column("text"), suffix, "")
        if isinstance(text2, pa.ChunkedArray):
            text2 = text2.combine_chunks()
        fresh = batch.filter(pa.array(d % 13 == 0))
        newd = fresh.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": pa.array(np.concatenate([kd, n + newd]), pa.int64()),
            "text": pa.concat_arrays(
                [text2, pa.array(["fresh doc " + str(x) for x in newd],
                                 pa.string())]),
            "lang": pa.concat_arrays(
                [kept.column("lang").combine_chunks(),
                 fresh.column("lang").combine_chunks()]),
        })

    new_mentions = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
        .repartition(64)
        .map_batches(v2_docs_lang, batch_format="pyarrow")
        .map_batches(synthesize_pages, batch_format="pyarrow")
        .map_batches(extract_stage, batch_format="pyarrow")
        .map_batches(geoparse_stage, batch_format="pyarrow")
    )

    def tile_partial(side: int):
        def f(batch: pa.Table) -> pa.Table:
            t = assign_tiles(batch.select(["lat", "lon"]), zooms=list(zooms))
            z = t.column("z").to_numpy().astype(np.int64)
            x = t.column("tile_x").to_numpy().astype(np.int64)
            y = t.column("tile_y").to_numpy().astype(np.int64)
            key = (z << 56) | (x << 28) | y
            u, cnt = np.unique(key, return_counts=True)
            cnt = cnt.astype(np.int64)
            zero = np.zeros(len(u), np.int64)
            return pa.table({
                "z": pa.array(u >> 56, pa.int64()),
                "tile_x": pa.array((u >> 28) & ((1 << 28) - 1), pa.int64()),
                "tile_y": pa.array(u & ((1 << 28) - 1), pa.int64()),
                "old_p": pa.array(cnt if side == 0 else zero, pa.int64()),
                "new_p": pa.array(cnt if side == 1 else zero, pa.int64()),
            })
        return f

    merged = bucketed_sum(
        mentions_ds(sf_dir).map_batches(tile_partial(0),
                                        batch_format="pyarrow")
        .union(new_mentions.map_batches(tile_partial(1),
                                        batch_format="pyarrow")),
        ["z", "tile_x", "tile_y"],
        [("old_p", "n_old"), ("new_p", "n_new")],
    )

    STATUS = np.array(["added", "removed", "changed", "same"], dtype=object)

    def status_map(batch: pa.Table) -> pa.Table:
        no = batch.column("n_old").to_numpy()
        nn = batch.column("n_new").to_numpy()
        code = np.where(no == 0, 0,
                        np.where(nn == 0, 1, np.where(no != nn, 2, 3)))
        return batch.append_column(
            "status", pa.array(STATUS[code].tolist(), pa.string()))

    return merged.map_batches(status_map, batch_format="pyarrow")


def q_late_data(sf_dir: str, delay_us: int = 600_000_000,
                n_buckets: int = 64):
    """Watermark / late-data census (the Flink-style streaming semantics
    the reference's batch engine doesn't have, §2.9): replaying events in
    ARRIVAL order (event_id), an event is LATE if its timestamp is more
    than ``delay_us`` behind the watermark = max event time seen so far.
    Output: per event_type, total events and late events.

    Scale shape — a global running max over a distributed stream, done
    with the reference's own two-pass discipline (OsmReader pass1/pass2):
    * pass 1: per-batch (arrival-range bucket, max ts) partials -> a
      driver-side exclusive prefix max over the n_buckets maxima (a
      TINY materialization: n_buckets rows, never event rows);
    * pass 2: ONE exchange on the contiguous arrival-range bucket; each
      bucket seeds numpy's running max with its carry-in watermark and
      emits per-type (late, total) partials;
    * final tiny groupby-sum.
    Exact SQL twin: max(ts) OVER (ORDER BY event_id ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING) in integer microseconds."""
    from ray.data.aggregate import Sum

    n_ev = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    FLOOR = -(2 ** 62)

    def max_part(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        tu = batch.column("ts").cast(pa.int64()).to_numpy()
        rb = eid * n_buckets // n_ev
        u, inv = np.unique(rb, return_inverse=True)
        mx = np.full(len(u), FLOOR, np.int64)
        np.maximum.at(mx, inv, tu)
        return pa.table({"rbucket": pa.array(u, pa.int64()),
                         "mx": pa.array(mx, pa.int64())})

    pre = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    ).map_batches(max_part, batch_format="pyarrow").to_pandas()
    bmax = np.full(n_buckets, FLOOR, np.int64)
    np.maximum.at(bmax, pre["rbucket"].to_numpy(), pre["mx"].to_numpy())
    carry = np.full(n_buckets, FLOOR, np.int64)
    carry[1:] = np.maximum.accumulate(bmax)[:-1]

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "tu": batch.column("ts").cast(pa.int64()),
            "event_type": batch.column("event_type"),
            "rbucket": pa.array(eid * n_buckets // n_ev, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "late_p": pa.array([], pa.int64()),
                          "tot_p": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        b = int(g.column("rbucket")[0].as_py())
        eid = g.column("event_id").to_numpy()
        tu = g.column("tu").to_numpy()
        order = np.argsort(eid, kind="stable")
        tu_s = tu[order]
        wm = np.maximum.accumulate(
            np.concatenate([[carry[b]], tu_s]))[:-1]
        late = (tu_s < wm - delay_us).astype(np.int64)
        typ = g.column("event_type").take(
            pa.array(order)).combine_chunks().dictionary_encode()
        idx = typ.indices.to_numpy()
        k = len(typ.dictionary)
        return pa.table({
            "event_type": typ.dictionary,
            "late_p": pa.array(np.bincount(idx, late, minlength=k)
                               .astype(np.int64), pa.int64()),
            "tot_p": pa.array(np.bincount(idx, minlength=k)
                              .astype(np.int64), pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("rbucket")
        .map_groups(bucket_body, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("tot_p", alias_name="n_events"),
                   Sum("late_p", alias_name="n_late"))
    )


def q_dsir_weights(sf_dir: str):
    """DSIR importance-resampling weights (target = lang 'en') — see
    ``stages.text.dsir_weights``."""
    from ..stages.text import dsir_weights

    return dsir_weights(docs_ds(sf_dir, ["doc_id", "text", "lang"]))


def q_gopher_rules(sf_dir: str):
    """Gopher/FineWeb-style multi-rule quality-filter census (Rae et al.
    2021 repetition/format heuristics reduced to their integer-exact
    core): per rule, how many documents FAIL it, plus the count passing
    all four — the report every curation run prints before dropping data.

    Rules (all exact integer comparisons, cross-multiplied where the
    original uses a ratio):
    * words:          8 <= n_ws_tokens <= 1024
    * mean_word_len:  2 <= alnum_chars / n_words <= 12
                      (as 2*n_words <= n_alnum AND n_alnum <= 12*n_words)
    * punct_ratio:    n_punct * 5 <= n_words  (punct-to-word <= 0.2)
    * stopwords:      n_stopwords >= 2

    Scale shape: embarrassingly parallel per-batch counting (the
    ``text_stats`` RE2 kernels + one extra alnum count) -> 5-row census
    partials -> ONE tiny groupby-sum."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.text import text_stats

    RULES = ["all_pass", "mean_word_len", "punct_ratio", "stopwords",
             "words"]

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("text")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        st = text_stats(batch)
        n_w = st.column("n_ws_tokens").to_numpy()
        n_p = st.column("n_punct").to_numpy()
        n_s = st.column("n_stopwords").to_numpy()
        n_a = pc.cast(pc.count_substring_regex(s, r"[a-zA-Z0-9]"),
                      pa.int64()).to_numpy()
        ok_w = (n_w >= 8) & (n_w <= 1024)
        ok_m = (2 * n_w <= n_a) & (n_a <= 12 * n_w)
        ok_p = n_p * 5 <= n_w
        ok_s = n_s >= 2
        n = np.array([
            int((ok_w & ok_m & ok_p & ok_s).sum()),   # all_pass
            int((~ok_m).sum()),                        # mean_word_len fails
            int((~ok_p).sum()),                        # punct_ratio fails
            int((~ok_s).sum()),                        # stopwords fails
            int((~ok_w).sum()),                        # words fails
        ], np.int64)
        return pa.table({"rule": pa.array(RULES, pa.string()),
                         "n_part": pa.array(n, pa.int64())})

    return (
        docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )


def q_tpch_q8(sf_dir: str, region: str = "ASIA", nation_name: str = "NATION_7"):
    """TPC-H Q8-shaped (national market share): per order year, the
    revenue supplied by one nation vs ALL revenue to customers in a
    region — output as exact integer numerator/denominator cents x bp
    per year (the share itself is a consumer division).

    Completes the partsupp-free TPC-H family: q1/q3-q8/q10/q12-q15/
    q17-q19/q21/q22 are all under the oracle gate (q2/q9/q11/q16/q20
    need the partsupp table, which the sf dirs don't carry).

    Scale plan: same fused one-exchange shape as :func:`q_tpch_q5` —
    customer/supplier/nation/region collapse to broadcast lookups, the
    side-tagged union buckets on orderkey, and each bucket emits per-year
    (num, den) partials."""
    from ray.data.aggregate import Sum

    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pydict()
    rkey = {n: k for k, n in zip(reg["r_regionkey"], reg["r_name"])}[region]
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    in_region = {int(k) for k, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if int(r) == rkey}
    nkey = {str(n): int(k) for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}[nation_name]
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy()
    keep_c = np.isin(cn, np.array(sorted(in_region), np.int64))
    cmap_keys = np.sort(ck[keep_c])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = np.sort(supp.column("s_suppkey").to_numpy())
    sv = supp.column("s_nationkey").to_numpy()[
        np.argsort(supp.column("s_suppkey").to_numpy(), kind="stable")]

    N_BUCKETS = 64

    def orders_side(batch: pa.Table) -> pa.Table:
        okey = batch.column("o_custkey").to_numpy()
        pos = np.searchsorted(cmap_keys, okey)
        posc = np.minimum(pos, max(len(cmap_keys) - 1, 0))
        hit = (len(cmap_keys) > 0) & (pos < len(cmap_keys))
        hit = hit & (cmap_keys[posc] == okey) if len(cmap_keys) else \
            np.zeros(len(okey), bool)
        odate = batch.column("o_orderdate").to_numpy()
        year = odate.astype("datetime64[Y]").astype(np.int64) + 1970
        kept = batch.column("o_orderkey").to_numpy()[hit]
        m = len(kept)
        # overloaded narrow exchange: a = o_year on this side
        return pa.table({
            "l_orderkey": pa.array(kept, pa.int64()),
            "a": pa.array(year[hit], pa.int64()),
            "b": pa.array(np.zeros(m, np.int64), pa.int64()),
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "obucket": pa.array(kept % N_BUCKETS, pa.int64()),
        })

    def line_side(batch: pa.Table) -> pa.Table:
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc = np.round(
            batch.column("l_discount").to_numpy() * 100).astype(np.int64)
        skey = batch.column("l_suppkey").to_numpy()
        pos = np.searchsorted(sk, skey)
        lkey = batch.column("l_orderkey").to_numpy()
        m = len(lkey)
        return pa.table({
            "l_orderkey": pa.array(lkey, pa.int64()),
            "a": pa.array(sv[np.minimum(pos, len(sk) - 1)], pa.int64()),
            "b": pa.array(price_c * (100 - disc), pa.int64()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "obucket": pa.array(lkey % N_BUCKETS, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        empty = pa.table({"o_year": pa.array([], pa.int64()),
                          "num_p": pa.array([], pa.int64()),
                          "den_p": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        om = side == 0
        okeys = g.column("l_orderkey").to_numpy()[om]
        if okeys.size == 0:
            return empty
        order = np.argsort(okeys, kind="stable")
        okeys_s = okeys[order]
        year_s = g.column("a").to_numpy()[om][order]
        lm = ~om
        lkey = g.column("l_orderkey").to_numpy()[lm]
        pos = np.searchsorted(okeys_s, lkey)
        posc = np.minimum(pos, okeys_s.size - 1)
        hit = (pos < okeys_s.size) & (okeys_s[posc] == lkey)
        if not hit.any():
            return empty
        yr = year_s[posc[hit]]
        rev = g.column("b").to_numpy()[lm][hit]
        is_n = (g.column("a").to_numpy()[lm][hit] == nkey)
        u, inv = np.unique(yr, return_inverse=True)
        return pa.table({
            "o_year": pa.array(u, pa.int64()),
            "num_p": pa.array(
                np.bincount(inv, rev * is_n).astype(np.int64), pa.int64()),
            "den_p": pa.array(np.bincount(inv, rev).astype(np.int64),
                              pa.int64()),
        })

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(orders_side, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["obucket"])),
                    batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("num_p", alias_name="nation_rev_cbp"),
                   Sum("den_p", alias_name="total_rev_cbp"))
    )


def q_ccnet_buckets(sf_dir: str):
    """CCNet perplexity buckets (Wenzek et al. 2020): per language, split
    documents into head / middle / tail by unigram-LM surprisal terciles
    — the signature curation step of the CCNet / RedPajama pipelines,
    reduced to its integer-exact core (surprisal in exact bits, tercile
    thresholds by the quantile_disc ceil convention).

    Scale shape: the surprisal pass is :func:`stages.text.
    unigram_surprisal` (one token-count shuffle + broadcast vocab); the
    per-lang tercile thresholds come from the histogram-partial exact
    quantile (state O(distinct bits values) per lang) and broadcast back;
    the census is per-batch partials -> one tiny groupby-sum.  Output:
    (lang, bucket, n_docs)."""
    from ray.data.aggregate import Sum

    from ..stages import events as E
    from ..stages.text import unigram_surprisal

    scored = unigram_surprisal(
        docs_ds(sf_dir, ["doc_id", "text", "lang"]), extra_cols=("lang",))
    th = E.grouped_quantiles(scored, "lang", "bits",
                             qs=(1.0 / 3, 2.0 / 3)).to_pandas()
    lookup = {str(r["lang"]): (int(r["p33"]), int(r["p67"]))
              for _, r in th.iterrows()}
    handle = ray.put(lookup)
    BUCKETS = np.array(["head", "middle", "tail"], dtype=object)

    def census(batch: pa.Table) -> pa.Table:
        lk = ray.get(handle)
        lang = batch.column("lang").to_pandas()
        bits = batch.column("bits").to_numpy()
        p33 = lang.map(lambda s: lk[s][0]).to_numpy().astype(np.int64)
        p67 = lang.map(lambda s: lk[s][1]).to_numpy().astype(np.int64)
        code = np.where(bits <= p33, 0, np.where(bits <= p67, 1, 2))
        key = pd.DataFrame({"lang": lang, "bucket": BUCKETS[code]})
        out = key.groupby(["lang", "bucket"], as_index=False).size()
        return pa.table({
            "lang": pa.array(out["lang"]),
            "bucket": pa.array(out["bucket"]),
            "n_part": pa.array(out["size"].to_numpy().astype(np.int64),
                               pa.int64()),
        })

    return (
        scored.map_batches(census, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )


def q_bearing_octants(sf_dir: str, n_buckets: int = 64):
    """Road-orientation census (the street-grid-orientation analytic —
    e.g. Boeing 2019 "Urban spatial order"): per admin zone, the 8-way
    compass-octant histogram of way segments, classified by PURE INTEGER
    comparisons on millidegree deltas (no trig — exactly SQL-mirrorable):

    * |dlat| > 2|dlon|  -> N or S;   |dlon| > 2|dlat| -> E or W
    * otherwise diagonal NE / SE / SW / NW by signs
    * zero-length segments skipped.

    Scale shape: the ONE bucketed way⋈node join shuffle (shared
    ``join_way_nodes``), per-bucket lexsort + shifted-compare segment
    deltas, (admin, octant) count partials, tiny final groupby-sum."""
    from ray.data.aggregate import Sum

    from .osm import joined_way_rows

    OCT = np.array(["E", "N", "NE", "NW", "S", "SE", "SW", "W"],
                   dtype=object)
    # classification codes into the (alphabetically sorted) OCT above
    E_, N_, NE_, NW_, S_, SE_, SW_, W_ = range(8)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"admin_id": pa.array([], pa.int64()),
                          "octant": pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        wid = g.column("way_id").to_numpy()
        seq = g.column("seq").to_numpy()
        nid = g.column("node_id").to_numpy()
        lat = g.column("lat_mdeg").to_numpy()
        lon = g.column("lon_mdeg").to_numpy()
        order = np.lexsort((nid, seq, wid))
        w, la, lo = wid[order], lat[order], lon[order]
        same = w[1:] == w[:-1]
        dlat = (la[1:] - la[:-1])[same]
        dlon = (lo[1:] - lo[:-1])[same]
        nz = (dlat != 0) | (dlon != 0)
        dlat, dlon = dlat[nz], dlon[nz]
        la1 = la[:-1][same][nz]
        lo1 = lo[:-1][same][nz]
        adx, ady = np.abs(dlon), np.abs(dlat)
        code = np.where(
            ady > 2 * adx, np.where(dlat > 0, N_, S_),
            np.where(adx > 2 * ady, np.where(dlon > 0, E_, W_),
                     np.where(dlat > 0, np.where(dlon > 0, NE_, NW_),
                              np.where(dlon > 0, SE_, SW_))))
        col = np.floor((lo1 / 1000.0 + 180.0005) / 72.0).astype(np.int64)
        row = np.floor((la1 / 1000.0 + 85.0005) / 34.0).astype(np.int64)
        admin = row * 5 + col
        key = admin * 8 + code
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "admin_id": pa.array(u // 8, pa.int64()),
            "octant": pa.array(OCT[u % 8].tolist(), pa.string()),
            "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return (
        joined_way_rows(sf_dir, n_buckets)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
        .groupby(["admin_id", "octant"])
        .aggregate(Sum("n_part", alias_name="n_segments"))
    )


def q_tile_compact(sf_dir: str, z: int = 4, n_buckets: int = 64):
    """Hierarchical tile-cover compaction (the H3 ``compact`` operation on
    the quadtree, and the shape behind archive redundant-tile elimination
    / PMTiles run collapsing): given the occupied zoom-``z`` tiles of the
    mention raster, replace every complete 4-sibling group by its parent,
    recursively — output the minimal multi-zoom cell cover (z, x, y).

    Scale shape: the ONLY data-scale stage is the distinct-occupied-tile
    aggregate (per-batch distinct partials -> one bucketed count merge);
    the compaction itself runs on the post-aggregate set, which is
    bounded by the GRID (4^z cells), not the corpus — the
    same bounded-driver-closure argument as ``super_relations``.  For
    z14-deep covers the per-level rollup distributes as log2(n) tiny
    groupbys (each level 4x smaller); the driver path is the measured
    sweet spot at query zooms."""
    from ..stages.bucketagg import bucketed_sum
    from ..stages.tiling import assign_tiles
    from .webgeo import mentions_ds

    def partial(batch: pa.Table) -> pa.Table:
        t = assign_tiles(batch.select(["lat", "lon"]), zooms=[z])
        x = t.column("tile_x").to_numpy().astype(np.int64)
        y = t.column("tile_y").to_numpy().astype(np.int64)
        key = x << 28 | y
        u = np.unique(key)
        return pa.table({
            "tile_x": pa.array(u >> 28, pa.int64()),
            "tile_y": pa.array(u & ((1 << 28) - 1), pa.int64()),
            "one": pa.array(np.ones(len(u), np.int64), pa.int64()),
        })

    occ = bucketed_sum(
        mentions_ds(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["tile_x", "tile_y"], [("one", "n")], n_buckets=n_buckets,
    ).to_pandas()  # post-aggregation: bounded by 4^z cells

    # bottom-up compaction over the bounded cover
    full = {z: set(zip(occ["tile_x"].astype(int), occ["tile_y"].astype(int)))}
    for lvl in range(z, 0, -1):
        parents: dict[tuple[int, int], int] = {}
        for (x, y) in full[lvl]:
            p = (x // 2, y // 2)
            parents[p] = parents.get(p, 0) + 1
        full[lvl - 1] = {p for p, c in parents.items() if c == 4}
    rows = []
    for lvl in range(0, z + 1):
        for (x, y) in full[lvl]:
            if lvl == 0 or (x // 2, y // 2) not in full[lvl - 1]:
                rows.append((lvl, x, y))
    rows.sort()
    return pd.DataFrame(rows, columns=["z", "tile_x", "tile_y"]).astype(
        np.int64)


def _plant_sem_siblings(batch: pa.Table) -> pa.Table:
    """Quantize (SEM_SCALE fixed point) and plant one sibling per vector at
    vec_id + 1_000_000 whose quantized vector is perturbed by an integer
    pattern of amplitude 8 * (vec_id % 8) with alternating sign per dim
    ((dim + vec_id) % 2) — so sibling cosine sweeps from exactly 1.0
    (vec_id % 8 == 0) down through the tau boundary, forcing the oracle to
    genuinely evaluate the integer cosine test rather than shortcut to the
    planted pair list.  Pure integer arithmetic after the one floor-
    quantize -> the DuckDB twin reproduces every value bitwise."""
    ids = batch.column("vec_id").to_numpy().astype(np.int64)
    q = ann.sem_quantize(np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)))
    d = q.shape[1]
    amp = (8 * (ids % 8))[:, None]
    sign = np.where((np.arange(d, dtype=np.int64)[None, :] + ids[:, None]) % 2 == 0, 1, -1)
    sib = q + amp * sign
    return pa.table(
        {
            "vec_id": pa.array(np.concatenate([ids, ids + 1_000_000]), pa.int64()),
            "qv": pa.array(list(np.concatenate([q, sib])), pa.list_(pa.int64())),
        }
    )


def q_semdedup(sf_dir: str, k: int = 16):
    """SemDeDup (cluster-then-prune semantic dedup) with an exact integer
    oracle: embeddings + planted graded-perturbation siblings
    (:func:`_plant_sem_siblings`), k-means-free centroid init (the k
    lowest-vec_id quantized vectors, the same convention as
    :func:`q_cluster_assign`), then :func:`stages.ann.semdedup_census` —
    per-vector (cluster, count of earlier same-cluster vectors with
    cos >= 0.92).  The SemDeDup keep set is ``n_dups == 0``; emitting the
    census makes the hash pin the full pairwise logic.

    Reference parity: the reference's tile-content dedup keeps one
    representative per identical tile (``TileArchiveWriter``); SemDeDup is
    the embedding-space generalization used by LLM curation pipelines.
    """
    cent_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    cq = ann.sem_quantize(
        np.stack(cent_tbl.column("embedding").to_numpy(zero_copy_only=False)))
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_plant_sem_siblings, batch_format="pyarrow")
    return ann.semdedup_census(embs, cq)


def q_translit_names(sf_dir: str):
    """Deterministic Latin transliteration over a multilingual name column
    (the reference's ICU Any-Latin pipeline,
    ``util/ThreadLocalTransliterator.java:18``, rebuilt as a public
    romanization table + NFKD strip).  Names are drawn deterministically
    from the hand-romanized fixture set (``language.TRANSLIT_FIXTURES``)
    by c_custkey; the SQL twin joins the EXPECTED latin column — so the
    gate pins the whole transliteration pipeline, not a replay of it.
    Vectorized: the 20 templates transliterate once, rows index into them.
    """
    from ..functions import language

    srcs = np.array([s for s, _ in language.TRANSLIT_FIXTURES], dtype=object)
    lats = np.array([language.transliterate_str(s)
                     for s, _ in language.TRANSLIT_FIXTURES], dtype=object)
    m = len(srcs)

    def tag(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        idx = ck % m
        return pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "name_src": pa.array(srcs[idx].tolist(), pa.string()),
            "name_latin": pa.array(lats[idx].tolist(), pa.string()),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(tag, batch_format="pyarrow")
