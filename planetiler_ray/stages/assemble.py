"""Per-tile assembly: the ``map_groups`` stage after the tile-keyed shuffle.

Mirrors ``FeatureGroup.TileFeatures`` + ``TileArchiveWriter`` encode semantics
(``collection/FeatureGroup.java:410-646``, ``archive/TileArchiveWriter.java:273-394``):
all rows of one tile are ordered by (layer, sort_key, feature_id), label-grid
limits drop low-priority points per grid cell (``FeatureGroup.java:616-637``),
features are encoded into one MVT protobuf, gzipped, and content-hashed
(FNV-1a, ``TileArchiveWriter.java:506-508``) for archive-level dedup of
identical tiles (ocean fills).

Determinism: ties in sort_key keep ``feature_id`` order — a total order, so
distributed runs are byte-reproducible (SURVEY.md §7.4 hard part #1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import mvt, wkb
from ..pipelines.profile import TilingProfile, resolve_zoom

import hashlib as _hashlib

_md5 = _hashlib.md5


def content_hash64(data: bytes) -> int:
    """64-bit content hash for tile dedup — md5 prefix (C speed; the
    per-byte Python FNV loop was ~17% of bucket assembly time).  Only
    EQUALITY across tiles matters for dedup, not the specific function."""
    return int.from_bytes(_md5(data).digest()[:8], "big")


def merge_layer_features(feats: list[dict], spec) -> list[dict]:
    """FeatureMerge analogues applied inside the assembler: group features by
    identical attrs, then merge geometries per group
    (``FeatureMerge.java:101-231`` mergeLineStrings via LoopLineMerger-lite,
    ``:116-162`` mergeMultiPoint / mergeMultiPolygon concatenation).  Merged
    feature id = the group's min id; group order is deterministic (min id)."""
    from ..geo.linemerge import merge_lines

    from ..geo.hilbert import xy_to_hilbert

    def _hilbert_of(f):
        # order merged parts along the Hilbert curve of their first vertex
        # (FeatureMerge.sortByHilbertIndex, FeatureMerge.java:396-402)
        p = f["parts"][0][0]
        x = int(min(max(p[0], 0.0), 255.0))
        y = int(min(max(p[1], 0.0), 255.0))
        return int(xy_to_hilbert(8, np.array([x]), np.array([y]))[0])

    groups: dict[tuple, list[dict]] = {}
    for f in feats:
        key = (f["kind"],) + tuple(sorted(f["attrs"].items()))
        groups.setdefault(key, []).append(f)
    out: list[dict] = []
    for key in sorted(groups, key=lambda k: min(f["id"] for f in groups[k])):
        fs = groups[key]
        kind = fs[0]["kind"]
        if kind == "point" and spec.merge_points:
            fs = sorted(fs, key=lambda f: (_hilbert_of(f), f["id"]))
            parts = [np.vstack([p for f in fs for p in f["parts"]])]
            out.append({"id": min(f["id"] for f in fs), "kind": "multipoint",
                        "parts": parts, "attrs": fs[0]["attrs"]})
        elif kind == "linestring" and spec.merge_lines:
            segs = [p for f in fs for p in f["parts"]]
            merged = merge_lines(segs, spec.merge_min_length,
                                 strokes=spec.merge_strokes)
            if merged:
                out.append({"id": min(f["id"] for f in fs), "kind": "multilinestring",
                            "parts": merged, "attrs": fs[0]["attrs"]})
        elif kind == "polygon" and spec.merge_polygons_union:
            from ..geo.rasterunion import union_buffer_unbuffer

            polys = [f["parts"] for f in sorted(fs, key=lambda f: f["id"])]
            merged = union_buffer_unbuffer(
                polys, spec.merge_buffer_px, min_area_px=spec.merge_min_area_px
            )
            if merged:
                out.append({"id": min(f["id"] for f in fs), "kind": "multipolygon",
                            "parts": merged, "attrs": fs[0]["attrs"]})
        elif kind == "polygon" and spec.merge_polygons:
            parts = [p for f in sorted(fs, key=lambda f: (_hilbert_of(f), f["id"]))
                     for p in f["parts"]]
            out.append({"id": min(f["id"] for f in fs), "kind": "multipolygon",
                        "parts": parts, "attrs": fs[0]["attrs"]})
        else:
            out.extend(sorted(fs, key=lambda f: f["id"]))
    return out


TILE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("z", pa.int64()),
        ("tile_x", pa.int64()),
        ("tile_y", pa.int64()),
        ("n_features", pa.int64()),
        ("n_bytes", pa.int64()),
        ("tile_gz", pa.binary()),
        ("content_hash", pa.int64()),
    ]
)


def hash_bucket(tile_id, n_buckets: int = 1024):
    """Deterministic load-balancing bucket for the tile shuffle.

    All rows of one tile share a bucket; consecutive tile ids scatter across
    buckets (splitmix-style mix) so low-zoom tiles don't pile into one group
    — this is the shuffle-key design knob of SURVEY.md §7.3.
    """
    x = np.asarray(tile_id, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return (x % np.uint64(n_buckets)).astype(np.int64)


def make_bucket_assembler(profile: TilingProfile):
    """map_groups body over ``bucket``: assembles ALL tiles of one bucket in
    one call (amortizes per-group overhead; the reference batches tiles the
    same way, ``TileArchiveWriter.java:244-271``).

    Hot-path discipline: the bucket's columns are pulled into numpy/python
    ONCE, rows are ordered by a single lexsort on (tile_id, layer_rank,
    sort_key, feature_id), and the per-tile loop touches only array slices —
    zero per-tile Arrow calls.

    Layers with no merging and no post-process hook take a FUSED path that
    writes each feature's protobuf bytes directly while scanning the segment
    (no intermediate feature dicts, no second pass in ``encode_tile``) —
    byte-identical to the generic path (differential-tested).
    """

    layer_order = list(profile.layers)
    layer_rank = {name: i for i, name in enumerate(layer_order)}
    specs = [profile.layers[n] for n in layer_order]
    fast_layer = [
        not (s.merge_points or s.merge_lines or s.merge_polygons
             or s.merge_polygons_union or s.post_process is not None)
        for s in specs
    ]
    # per-layer constant wire fragments (field order mirrors encode_tile)
    _v = mvt._varint
    name_frag = []
    for s in specs:
        nb = s.name.encode("utf-8")
        name_frag.append(b"\x78\x02" + b"\x0a" + _v(len(nb)) + nb)
    extent_frag = b"\x28" + _v(mvt.EXTENT)
    type_frag = {k: b"\x18" + _v(t) for k, t in mvt._KIND_TO_TYPE.items()}
    key_frag = {}  # attr col -> framed key-table entry (field 3)

    def _key_frag(c: str) -> bytes:
        b = key_frag.get(c)
        if b is None:
            kb = c.encode("utf-8")
            b = key_frag[c] = b"\x1a" + _v(len(kb)) + kb
        return b

    # pools for the vectorized segment encoder: key-table entries for every
    # attr column any layer declares, and per-layer name fragments, each as
    # (flat uint8 buffer, offsets, lengths) so copy_segments can assemble
    # key tables / layer headers without per-entry Python
    col_kid: dict[str, int] = {}
    _kfrags: list[bytes] = []
    for s in specs:
        for c in s.attr_cols:
            if c not in col_kid:
                col_kid[c] = len(_kfrags)
                _kfrags.append(_key_frag(c))
    key_pool_buf = np.frombuffer(b"".join(_kfrags), np.uint8)
    key_pool_len = np.array([len(b) for b in _kfrags] or [0], np.int64)
    key_pool_off = np.concatenate([[0], np.cumsum(key_pool_len)])[:len(_kfrags) or 1]
    name_pool_buf = np.frombuffer(b"".join(name_frag), np.uint8)
    name_pool_len = np.array([len(b) for b in name_frag] or [0], np.int64)
    name_pool_off = np.concatenate([[0], np.cumsum(name_pool_len)])[:len(name_frag) or 1]
    extent_np = np.frombuffer(extent_frag, np.uint8)

    def assemble_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return TILE_SCHEMA.empty_table()
        cols = set(group.column_names)
        tid = group.column("tile_id").to_numpy()
        z_arr = group.column("z").to_numpy()
        tx_arr = group.column("tile_x").to_numpy()
        ty_arr = group.column("tile_y").to_numpy()
        layer_vals = group.column("layer").to_pylist()
        lrank = np.array([layer_rank.get(v, 255) for v in layer_vals], dtype=np.int64)
        fid = group.column("feature_id").to_numpy()
        if "sort_key" in cols:
            sk = np.nan_to_num(group.column("sort_key").to_numpy(), nan=0).astype(np.int64)
        else:
            sk = np.zeros(n, dtype=np.int64)
        order = np.lexsort((fid, sk, lrank, tid))
        tid_s = tid[order]
        lrank_s = lrank[order]
        fid_s = fid[order]
        kinds = group.column("kind").to_pylist()
        geom_px = group.column("geom_px").to_pylist() if "geom_px" in cols else [None] * n
        px = group.column("px").to_numpy() if "px" in cols else np.full(n, np.nan)
        py = group.column("py").to_numpy() if "py" in cols else np.full(n, np.nan)
        attr_data = {}
        for spec in specs:
            for c in spec.attr_cols:
                if c in cols and c not in attr_data:
                    attr_data[c] = group.column(c).to_pylist()

        out_tid, out_z, out_x, out_y = [], [], [], []
        out_nf, out_nb, out_gz, out_hash = [], [], [], []
        # per-bucket memo: identical geometry blobs (e.g. canonical fill
        # squares) encode to identical command arrays — huge for ocean fills
        cmd_cache: dict[bytes, tuple[str, np.ndarray]] = {}

        # vectorized pre-encode of the per-feature protobuf bytes that do
        # NOT depend on the tile (id field, point geometry field): one
        # pack_varints2 pass each for the whole bucket instead of per-
        # feature varint/packing calls inside encode_tile (round-3 rework:
        # the per-feature framing was ~40% of assembly CPU)
        from ..geo import varint as V

        valid_pt = ~np.isnan(px)
        m = int(valid_pt.sum())
        if m:
            xs = np.round(px[valid_pt] * np.float32(mvt.SCALE)).astype(np.int64)
            ys = np.round(py[valid_pt] * np.float32(mvt.SCALE)).astype(np.int64)
            flat = np.empty(3 * m, np.uint64)
            flat[0::3] = 9  # MoveTo, count=1
            flat[1::3] = V.zigzag_encode(xs)
            flat[2::3] = V.zigzag_encode(ys)
            packed, nbv = V.pack_varints2(flat)
            blen = V.segment_sum(nbv, np.full(m, 3, np.int64))
            pref, pref_nb = V.pack_varints2(blen.astype(np.uint64))
            row_len = np.zeros(n, np.int64)
            row_len[valid_pt] = 1 + pref_nb + blen
            goff = np.concatenate([[0], np.cumsum(row_len)])
            gbuf = np.zeros(int(goff[-1]), np.uint8)
            dst = goff[:-1][valid_pt]
            gbuf[dst] = 0x22  # field 4 (geometry), wire 2
            V.scatter_segments(gbuf, dst + 1, pref, pref_nb)
            V.scatter_segments(gbuf, dst + 1 + pref_nb, packed, blen)
            geom_flat = gbuf.tobytes()
        else:
            goff = np.zeros(n + 1, np.int64)
            gbuf = np.empty(0, np.uint8)
            geom_flat = b""
        idp, id_nb = V.pack_varints2(fid.astype(np.uint64))
        ioff = np.concatenate([[0], np.cumsum(1 + id_nb)])
        ibuf = np.zeros(int(ioff[-1]), np.uint8)
        ibuf[ioff[:-1]] = 0x08  # field 1 (id), varint
        V.scatter_segments(ibuf, ioff[:-1] + 1, idp, id_nb)
        id_flat = ibuf.tobytes()

        isnan_px = np.isnan(px)
        generic_tile = profile.post_process_tile is not None
        packed = mvt._packed_varints
        enc_val = mvt._encode_value
        vcache = mvt._VARINT_CACHE
        gated_cache: dict = {}

        def gated(lr: int, z: int):
            """Zoom-eligible (attr col, value list) pairs, attr_cols order."""
            hit = gated_cache.get((lr, z))
            if hit is None:
                sp = specs[lr]
                hit = gated_cache[(lr, z)] = [
                    (c, attr_data[c]) for c in sp.attr_cols
                    if z >= sp.attr_min_zoom.get(c, 0) and c in attr_data
                ]
            return hit

        bounds = np.flatnonzero(np.diff(tid_s)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(tid_s)]])
        ntile = len(starts)

        # ------- vectorized fast-layer point segments (whole bucket) -------
        # A segment = one (tile, layer) run in the sorted layout.  Segments
        # whose layer takes the fused path AND whose rows are all valid
        # points are encoded in ONE numpy pass over the bucket: label-grid
        # prune (rank-of-arrival per cell), first-use key/value table
        # assignment (np.unique on (segment, id) pairs), tag varint packing
        # and feature/layer framing are all array ops.  Byte-identical to
        # the scalar fused path (differential-tested); the per-feature
        # Python scan below remains only for merging/hooked/mixed segments.
        # Returns (frames by segment start, pure-tile mask, frame blob,
        # per-tile blob byte ranges, per-tile feature counts): a "pure"
        # tile has every segment vectorized (or rank-unknown => dropped),
        # so its final bytes are ONE contiguous slice of the blob and the
        # per-tile scan loop is skipped entirely.
        def build_vector_frames():
            chg = (np.diff(tid_s) != 0) | (np.diff(lrank_s) != 0)
            sstart = np.concatenate([[0], np.flatnonzero(chg) + 1])
            slen = np.diff(np.append(sstart, n))
            nseg = len(sstart)
            seg_lr = lrank_s[sstart]
            seg_z = z_arr[order[sstart]].astype(np.int64)
            is_pt_valid = np.array(
                [k == "point" for k in kinds], bool) & ~isnan_px
            seg_allpt = np.minimum.reduceat(
                is_pt_valid[order].astype(np.uint8), sstart).astype(bool)
            lr_fast = np.array(
                [l < len(specs) and fast_layer[l] for l in seg_lr], bool)
            vec = seg_allpt & lr_fast
            out: dict[int, tuple[bytes, int]] = {}
            no_pure = (np.zeros(ntile, bool), b"",
                       np.zeros(ntile, np.int64), np.zeros(ntile, np.int64),
                       np.zeros(ntile, np.int64))
            if not vec.any():
                return out, no_pure
            # zoom gate + label-grid params per segment ((lr, z)-memoized)
            grid_a = np.full(nseg, np.nan)
            lim_a = np.zeros(nseg, np.int64)
            zoom_ok = np.zeros(nseg, bool)
            memo: dict = {}
            for si in np.flatnonzero(vec):
                key = (int(seg_lr[si]), int(seg_z[si]))
                hit = memo.get(key)
                if hit is None:
                    sp = specs[key[0]]
                    zok = sp.min_zoom <= key[1] <= sp.max_zoom
                    gp = resolve_zoom(sp.label_grid_px, key[1]) if zok else None
                    lm = resolve_zoom(sp.label_grid_limit, key[1]) if zok else None
                    use = bool(gp and lm)
                    hit = memo[key] = (
                        zok, float(gp) if use else np.nan, int(lm or 0))
                    if not use:
                        hit = memo[key] = (zok, np.nan, 0)
                zoom_ok[si], grid_a[si], lim_a[si] = hit
            for si in np.flatnonzero(vec & ~zoom_ok):
                out[int(sstart[si])] = (b"", 0)  # layer zoom-gated out
            vseg = np.flatnonzero(vec & zoom_ok)
            if not len(vseg):
                return out, no_pure
            take = np.zeros(nseg, bool)
            take[vseg] = True
            seg_of = np.repeat(np.arange(nseg), slen)
            vr = np.flatnonzero(take[seg_of])  # sorted-space rows, scan order
            ko = order[vr]                     # original-space rows
            sid = seg_of[vr]
            # label-grid prune: rank of arrival within (segment, cell)
            g_row = grid_a[sid]
            keep = np.ones(len(vr), bool)
            use = ~np.isnan(g_row)
            if use.any():
                ui = np.flatnonzero(use)
                gg = g_row[ui]
                cell = (np.floor_divide(px[ko[ui]].astype(np.float64), gg)
                        .astype(np.int64) * 100003
                        + np.floor_divide(py[ko[ui]].astype(np.float64), gg)
                        .astype(np.int64))
                so = np.lexsort((np.arange(len(ui)), cell, sid[ui]))
                cs, ss = cell[so], sid[ui][so]
                newg = np.concatenate(
                    [[True], (np.diff(cs) != 0) | (np.diff(ss) != 0)])
                gstart = np.flatnonzero(newg)
                glen = np.diff(np.append(gstart, len(so)))
                rank = np.arange(len(so)) - np.repeat(gstart, glen)
                keep[ui[so]] = rank < lim_a[sid[ui][so]]
            ko = ko[keep]
            ksid = sid[keep]
            nK = len(ko)
            kz = z_arr[ko].astype(np.int64)
            klr = lrank_s[vr[keep]]
            seg_cnt = np.bincount(ksid, minlength=nseg).astype(np.int64)
            # --- attr streams: row-major (row, spec-col) cells ---
            # global value ids: dictionary-encode each attr column once per
            # bucket, map dictionary entries -> encoded VALUE BYTES ->
            # global id (byte-keyed so equal encodings across columns share
            # one value-table slot, mirroring the scalar val_idx)
            attr_codes: dict[str, np.ndarray] = {}
            col_gid: dict[str, np.ndarray] = {}
            val_frames: list[bytes] = []
            gb_pool: dict[bytes, int] = {}
            used_cols = set()
            for lidx in set(int(x) for x in np.unique(klr)):
                used_cols.update(
                    c for c in specs[lidx].attr_cols if c in attr_data)
            for c in used_cols:
                ca = group.column(c)
                arr = ca.combine_chunks() if isinstance(ca, pa.ChunkedArray) else ca
                if not pa.types.is_dictionary(arr.type):
                    arr = arr.dictionary_encode()
                attr_codes[c] = (arr.indices.fill_null(-1)
                                 .to_numpy(zero_copy_only=False).astype(np.int64))
                gids = []
                for v in arr.dictionary.to_pylist():
                    vb = enc_val(v)
                    gid = gb_pool.get(vb)
                    if gid is None:
                        gid = gb_pool[vb] = len(val_frames)
                        val_frames.append(b"\x22" + _v(len(vb)) + vb)
                    gids.append(gid)
                col_gid[c] = np.array(gids or [0], np.int64)
            val_pool_buf = np.frombuffer(b"".join(val_frames), np.uint8)
            val_pool_len = np.array(
                [len(b) for b in val_frames] or [0], np.int64)
            val_pool_off = np.concatenate(
                [[0], np.cumsum(val_pool_len)])[:max(len(val_frames), 1)]
            nc_lr = np.zeros(len(specs), np.int64)
            cols_lr: list[list[str]] = []
            for lidx, sp in enumerate(specs):
                cl = [c for c in sp.attr_cols if c in attr_codes]
                cols_lr.append(cl)
                nc_lr[lidx] = len(cl)
            row_nc = nc_lr[klr]
            coff = np.concatenate([[0], np.cumsum(row_nc)])
            tot = int(coff[-1])
            st_gid = np.zeros(tot, np.int64)
            st_kid = np.zeros(tot, np.int64)
            st_inc = np.zeros(tot, bool)
            for lidx in set(int(x) for x in np.unique(klr)):
                rows_l = np.flatnonzero(klr == lidx)
                sp = specs[lidx]
                for j, c in enumerate(cols_lr[lidx]):
                    pos = coff[rows_l] + j
                    codes = attr_codes[c][ko[rows_l]]
                    inc = codes >= 0
                    mz = sp.attr_min_zoom.get(c, 0)
                    if mz:
                        inc &= kz[rows_l] >= mz
                    st_inc[pos] = inc
                    st_gid[pos] = col_gid[c][np.maximum(codes, 0)]
                    st_kid[pos] = col_kid[c]
            sm = np.flatnonzero(st_inc)
            seg_keys_len = np.zeros(nseg, np.int64)
            seg_vals_len = np.zeros(nseg, np.int64)
            tp_buf = np.empty(0, np.uint8)
            tp_len = np.zeros(nK, np.int64)
            keys_buf = vals_buf = np.empty(0, np.uint8)
            if len(sm):
                S_row = np.repeat(np.arange(nK), row_nc)[sm]
                S_seg = ksid[S_row]
                S_gid = st_gid[sm]
                S_kid = st_kid[sm]

                def first_use_local(idv, domain):
                    """Per-element local index = first-use order of idv
                    within its segment (the scalar key_idx/val_idx dicts,
                    vectorized); also the unique ids in (segment-major,
                    first-use) order + their segment ids."""
                    comb = S_seg * np.int64(domain) + idv
                    uq, fidx, inv = np.unique(
                        comb, return_index=True, return_inverse=True)
                    useg = S_seg[fidx]
                    ou = np.lexsort((fidx, useg))
                    su = useg[ou]
                    gs = np.flatnonzero(
                        np.concatenate([[True], np.diff(su) != 0]))
                    gl = np.diff(np.append(gs, len(ou)))
                    ranks = np.arange(len(ou)) - np.repeat(gs, gl)
                    local = np.empty(len(uq), np.int64)
                    local[ou] = ranks
                    return local[inv], idv[fidx][ou], su

                kloc, ukid, ukseg = first_use_local(S_kid, len(col_kid) + 1)
                vloc, ugid, uvseg = first_use_local(
                    S_gid, len(val_frames) + 1)
                klen_u = key_pool_len[ukid]
                keys_buf = np.zeros(int(klen_u.sum()), np.uint8)
                V.copy_segments(
                    keys_buf, np.concatenate([[0], np.cumsum(klen_u)])[:-1],
                    key_pool_buf, key_pool_off[ukid], klen_u)
                vlen_u = val_pool_len[ugid]
                vals_buf = np.zeros(int(vlen_u.sum()), np.uint8)
                V.copy_segments(
                    vals_buf, np.concatenate([[0], np.cumsum(vlen_u)])[:-1],
                    val_pool_buf, val_pool_off[ugid], vlen_u)
                seg_keys_len = np.bincount(
                    ukseg, weights=klen_u, minlength=nseg).astype(np.int64)
                seg_vals_len = np.bincount(
                    uvseg, weights=vlen_u, minlength=nseg).astype(np.int64)
                tagv = np.empty(2 * len(sm), np.uint64)
                tagv[0::2] = kloc
                tagv[1::2] = vloc
                tp_buf, tp_nb = V.pack_varints2(tagv)
                tp_len = np.bincount(np.repeat(S_row, 2), weights=tp_nb,
                                     minlength=nK).astype(np.int64)
            # --- per-feature frames (id, tags, type, geometry) ---
            id_len = ioff[ko + 1] - ioff[ko]
            gm_len = goff[ko + 1] - goff[ko]
            hastag = tp_len > 0
            tpl_b, tpl_nb = V.pack_varints2(tp_len[hastag].astype(np.uint64))
            tf_len = np.zeros(nK, np.int64)
            tf_len[hastag] = 1 + tpl_nb
            body_len = id_len + tf_len + tp_len + 2 + gm_len
            bh_b, bh_nb = V.pack_varints2(body_len.astype(np.uint64))
            fr_len = 1 + bh_nb + body_len
            fr_off = np.concatenate([[0], np.cumsum(fr_len)])
            F = np.zeros(int(fr_off[-1]), np.uint8)
            F[fr_off[:-1]] = 0x12
            V.scatter_segments(F, fr_off[:-1] + 1, bh_b, bh_nb)
            off_id = fr_off[:-1] + 1 + bh_nb
            V.copy_segments(F, off_id, ibuf, ioff[ko], id_len)
            off_tf = off_id + id_len
            F[off_tf[hastag]] = 0x12
            V.scatter_segments(F, off_tf[hastag] + 1, tpl_b, tpl_nb)
            off_tp = off_tf + tf_len
            V.scatter_segments(F, off_tp, tp_buf, tp_len)
            off_ty = off_tp + tp_len
            F[off_ty] = 0x18
            F[off_ty + 1] = 0x01
            V.copy_segments(F, off_ty + 2, gbuf, goff[ko], gm_len)
            # --- per-segment layer frames ---
            seg_feat_len = np.bincount(
                ksid, weights=fr_len, minlength=nseg).astype(np.int64)
            act = np.zeros(nseg, bool)
            act[vseg] = True
            for si in vseg[seg_cnt[vseg] == 0]:
                out[int(sstart[si])] = (b"", 0)  # fully pruned segment
            act &= seg_cnt > 0
            ai = np.flatnonzero(act)
            if not len(ai):
                return out, no_pure
            row_s = np.searchsorted(ksid, ai, "left")
            feat_off = fr_off[row_s]
            feat_len = seg_feat_len[ai]
            name_l = name_pool_len[seg_lr[ai]]
            keys_l = seg_keys_len[ai]
            vals_l = seg_vals_len[ai]
            lay_len = name_l + feat_len + keys_l + vals_l + len(extent_frag)
            lh_b, lh_nb = V.pack_varints2(lay_len.astype(np.uint64))
            tot_len = 1 + lh_nb + lay_len
            toff = np.concatenate([[0], np.cumsum(tot_len)])
            B = np.zeros(int(toff[-1]), np.uint8)
            B[toff[:-1]] = 0x1A
            V.scatter_segments(B, toff[:-1] + 1, lh_b, lh_nb)
            p = toff[:-1] + 1 + lh_nb
            V.copy_segments(B, p, name_pool_buf, name_pool_off[seg_lr[ai]],
                            name_l)
            p = p + name_l
            V.copy_segments(B, p, F, feat_off, feat_len)
            p = p + feat_len
            kb_off = np.concatenate([[0], np.cumsum(seg_keys_len)])
            V.copy_segments(B, p, keys_buf, kb_off[ai], keys_l)
            p = p + keys_l
            vb_off = np.concatenate([[0], np.cumsum(seg_vals_len)])
            V.copy_segments(B, p, vals_buf, vb_off[ai], vals_l)
            p = p + vals_l
            B[(p[:, None] + np.arange(len(extent_np))[None, :]).ravel()] = \
                np.tile(extent_np, len(p))
            Bb = B.tobytes()
            for j, si in enumerate(ai):
                out[int(sstart[si])] = (
                    Bb[toff[j]:toff[j + 1]], int(seg_cnt[si]))
            # pure-tile machinery: a tile whose segments are ALL either
            # vectorized or rank-unknown (dropped by the scalar loop too)
            # needs no per-tile scan — its bytes are Bb[lo:hi]
            seg_tile = np.searchsorted(starts, sstart, "right") - 1
            covered = vec | (seg_lr >= len(specs))
            tile_first_seg = np.searchsorted(seg_tile, np.arange(ntile))
            pure = np.minimum.reduceat(
                covered.astype(np.uint8), tile_first_seg).astype(bool)
            tile_nf = np.bincount(
                seg_tile, weights=seg_cnt, minlength=ntile).astype(np.int64)
            seg_tile_ai = seg_tile[ai]
            lo = toff[np.searchsorted(seg_tile_ai, np.arange(ntile), "left")]
            hi = toff[np.searchsorted(seg_tile_ai, np.arange(ntile), "right")]
            return out, (pure, Bb, lo, hi, tile_nf)

        if generic_tile:
            vec_frames: dict[int, tuple[bytes, int]] = {}
            pure_t, blob, blob_lo, blob_hi, tile_nf = (
                np.zeros(ntile, bool), b"", None, None, None)
        else:
            vec_frames, (pure_t, blob, blob_lo, blob_hi, tile_nf) = \
                build_vector_frames()

        for t, (s, e) in enumerate(zip(starts, ends)):
            if pure_t[t]:
                data = blob[blob_lo[t]:blob_hi[t]]
                gz = mvt.gzip_tile(data)
                i0 = order[s]
                out_tid.append(int(tid_s[s]))
                out_z.append(int(z_arr[i0]))
                out_x.append(int(tx_arr[i0]))
                out_y.append(int(ty_arr[i0]))
                out_nf.append(int(tile_nf[t]))
                out_nb.append(len(gz))
                out_gz.append(gz)
                out_hash.append(np.int64(np.uint64(content_hash64(data))))
                continue
            rows = order[s:e]
            i0 = rows[0]
            z = int(z_arr[i0])
            layers_out: dict[str, list[dict]] = {}
            tile_b = bytearray()
            n_features = 0
            # rows are already laid out layer-major inside the tile run
            li = s
            while li < e:
                li0 = li
                lr = lrank_s[li]
                lj = li
                while lj < e and lrank_s[lj] == lr:
                    lj += 1
                li = lj
                hitf = vec_frames.get(li0)
                if hitf is not None:  # segment pre-encoded vectorized
                    tile_b += hitf[0]
                    n_features += hitf[1]
                    continue
                seg = order[li0:lj]
                if lr >= len(specs):
                    continue
                spec = specs[lr]
                if not (spec.min_zoom <= z <= spec.max_zoom):
                    continue
                grid_px = resolve_zoom(spec.label_grid_px, z)
                limit = resolve_zoom(spec.label_grid_limit, z)
                seen: dict[int, int] = {}
                use_grid = bool(grid_px and limit)
                if fast_layer[lr] and not generic_tile:
                    # fused path: write feature wire bytes in the scan
                    ga = gated(lr, z)
                    key_idx: dict[str, int] = {}
                    val_idx: dict[bytes, int] = {}
                    keys_b = bytearray()
                    vals_b = bytearray()
                    feats_b = bytearray()
                    for i in seg:
                        pxi = px[i]
                        if use_grid and not isnan_px[i]:
                            c = int(pxi // grid_px) * 100003 + int(py[i] // grid_px)
                            cnt = seen.get(c, 0)
                            if cnt >= limit:
                                continue
                            seen[c] = cnt + 1
                        tags: list[int] = []
                        for c, vlist in ga:
                            v = vlist[i]
                            if v is None:
                                continue
                            ki = key_idx.get(c)
                            if ki is None:
                                ki = key_idx[c] = len(key_idx)
                                keys_b += _key_frag(c)
                            vb = enc_val(v)
                            vi = val_idx.get(vb)
                            if vi is None:
                                vi = val_idx[vb] = len(val_idx)
                                vals_b += b"\x22" + _v(len(vb)) + vb
                            tags.append(ki)
                            tags.append(vi)
                        if kinds[i] == "point" and not isnan_px[i]:
                            geom_b = geom_flat[goff[i] : goff[i + 1]]
                            tb = b"\x18\x01"
                        else:
                            blob = geom_px[i]
                            hit = cmd_cache.get(blob)
                            if hit is None:
                                gk, gd = wkb.decode_wkb(blob)
                                parts = gd if gk in ("linestring", "polygon", "multilinestring") else [gd]
                                if gk == "multilinestring":
                                    gk = "linestring"
                                pb = packed(mvt.encode_commands(gk, parts))
                                hit = (gk, b"\x22" + _v(len(pb)) + pb)
                                cmd_cache[blob] = hit
                            kind_out, geom_b = hit
                            tb = type_frag[kind_out]
                        idb = id_flat[ioff[i] : ioff[i + 1]]
                        if tags:
                            # tile-local tag indexes are tiny — cache-hit packs
                            tp = b"".join([vcache[t] for t in tags]) \
                                if len(val_idx) < 16384 else packed(tags)
                            tf = b"\x12" + _v(len(tp))
                            body_len = len(idb) + len(tf) + len(tp) + 2 + len(geom_b)
                            feats_b += b"\x12" + _v(body_len)
                            feats_b += idb
                            feats_b += tf
                            feats_b += tp
                        else:
                            body_len = len(idb) + 2 + len(geom_b)
                            feats_b += b"\x12" + _v(body_len)
                            feats_b += idb
                        feats_b += tb
                        feats_b += geom_b
                        n_features += 1
                    if feats_b:
                        lay_len = (len(name_frag[lr]) + len(feats_b)
                                   + len(keys_b) + len(vals_b) + len(extent_frag))
                        tile_b += b"\x1a" + _v(lay_len)
                        tile_b += name_frag[lr]
                        tile_b += feats_b
                        tile_b += keys_b
                        tile_b += vals_b
                        tile_b += extent_frag
                    continue
                needs_parts = (spec.merge_points or spec.merge_lines
                               or spec.merge_polygons or spec.merge_polygons_union)
                feats: list[dict] = []
                for i in seg:
                    pxi = px[i]
                    if use_grid and not isnan_px[i]:
                        c = int(pxi // grid_px) * 100003 + int(py[i] // grid_px)
                        cnt = seen.get(c, 0)
                        if cnt >= limit:
                            continue
                        seen[c] = cnt + 1
                    kind = kinds[i]
                    geom_field = parts_out = None
                    if kind == "point" and not isnan_px[i]:
                        kind_out = "point"
                        if needs_parts:
                            parts_out = [np.array([[pxi, py[i]]])]
                        else:
                            geom_field = geom_flat[goff[i] : goff[i + 1]]
                    else:
                        blob = geom_px[i]
                        if needs_parts:
                            gk, gd = wkb.decode_wkb(blob)
                            parts_out = gd if gk in ("linestring", "polygon", "multilinestring") else [gd]
                            kind_out = "linestring" if gk == "multilinestring" else gk
                        else:
                            hit = cmd_cache.get(blob)
                            if hit is None:
                                gk, gd = wkb.decode_wkb(blob)
                                parts = gd if gk in ("linestring", "polygon", "multilinestring") else [gd]
                                if gk == "multilinestring":
                                    gk = "linestring"
                                pb = packed(mvt.encode_commands(gk, parts))
                                hit = (gk, b"\x22" + _v(len(pb)) + pb)
                                cmd_cache[blob] = hit
                            kind_out, geom_field = hit
                    attrs = {}
                    for c, vlist in gated(lr, z):
                        if vlist[i] is not None:
                            attrs[c] = vlist[i]
                    f = {"id": int(fid[i]), "kind": kind_out, "attrs": attrs,
                         "id_field": id_flat[ioff[i] : ioff[i + 1]]}
                    if geom_field is not None:
                        f["geom_field"] = geom_field
                    else:
                        f["parts"] = parts_out
                    feats.append(f)
                if feats and needs_parts:
                    feats = merge_layer_features(feats, spec)
                if feats and spec.post_process is not None:
                    feats = spec.post_process(feats, z)
                if feats:
                    if generic_tile:
                        layers_out[spec.name] = feats
                    else:
                        tile_b += mvt.encode_tile({spec.name: feats})
                    n_features += len(feats)
            if generic_tile:
                layers_out = profile.post_process_tile(
                    layers_out, z, int(tx_arr[i0]), int(ty_arr[i0])
                )
                n_features = sum(len(v) for v in layers_out.values())
                data = mvt.encode_tile(layers_out)
            else:
                data = bytes(tile_b)
            gz = mvt.gzip_tile(data)
            out_tid.append(int(tid_s[s]))
            out_z.append(z)
            out_x.append(int(tx_arr[i0]))
            out_y.append(int(ty_arr[i0]))
            out_nf.append(n_features)
            out_nb.append(len(gz))
            out_gz.append(gz)
            out_hash.append(np.int64(np.uint64(content_hash64(data))))
        return pa.table(
            {
                "tile_id": pa.array(out_tid, pa.int64()),
                "z": pa.array(out_z, pa.int64()),
                "tile_x": pa.array(out_x, pa.int64()),
                "tile_y": pa.array(out_y, pa.int64()),
                "n_features": pa.array(out_nf, pa.int64()),
                "n_bytes": pa.array(out_nb, pa.int64()),
                "tile_gz": pa.array(out_gz, pa.binary()),
                "content_hash": pa.array(out_hash, pa.int64()),
            }
        )

    return assemble_bucket


def make_tile_assembler(profile: TilingProfile):
    """Single-tile assembly body — delegates to the bucket assembler (one
    tile is a trivial bucket), so there is exactly ONE assembly code path."""
    return make_bucket_assembler(profile)
