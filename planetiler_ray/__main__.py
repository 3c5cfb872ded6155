"""CLI runner — the fluent-runner analogue (``Planetiler.java:88-610``):

    python -m planetiler_ray build  --sf /root/testdata/sf0.001 \
        --out /tmp/tiles --format files|shard|mbtiles|pmtiles \
        [--zooms 0,2,4,6] [--repl 1] [--cpus 8] [--yaml schema.yml]
    python -m planetiler_ray verify --archive /tmp/tiles
    python -m planetiler_ray compare --a X --b Y

Owns its Ray session (guarded init + shutdown) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(cpus: int):
    """Local by default; on a cluster (``ray job submit`` sets RAY_ADDRESS,
    or pass RAY_ADDRESS=auto) we CONNECT instead — num_cpus is a local-mode
    sizing knob only, never a cluster cap."""
    import ray

    addr = os.environ.get("RAY_ADDRESS", "local")
    if addr in ("local",):
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    else:
        ray.init(address=addr, ignore_reinit_error=True,
                 logging_level="ERROR")


def _corpus_cmd(args):
    import ray

    if not ray.is_initialized():
        _init_ray(args.cpus)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines import training

        if args.op == "clean":
            res = training.q_corpus_clean(
                args.sf, min_quality_bp=args.min_quality_bp
            )
            if args.out:
                res.write_parquet(args.out)
                print(json.dumps({"out": args.out, "rows": res.count()}))
            else:
                print(json.dumps({"rows": res.count()}))
        elif args.op == "dedup":
            res = training.q_exact_dedup(args.sf)
            if args.out:
                res.write_parquet(args.out)
            print(json.dumps({"rows": res.count()}))
        elif args.op == "diff":
            if not args.against:
                print(json.dumps({"error": "diff requires --against"}))
                return 2
            from .stages.incremental import corpus_diff

            old_ds = ray.data.read_parquet(
                f"{args.sf}/documents.parquet", columns=["doc_id", "text"])
            new_ds = ray.data.read_parquet(
                f"{args.against}/documents.parquet", columns=["doc_id", "text"])
            res = corpus_diff(old_ds, new_ds)
            counts = (
                res.groupby("status").count().to_pandas()
                .set_index("status")["count()"].to_dict()
            )
            if args.out:
                res.write_parquet(args.out)
            print(json.dumps({"counts": counts}))
        elif args.op == "stats":
            from .stages import text as T

            ds = ray.data.read_parquet(
                f"{args.sf}/documents.parquet", columns=["doc_id", "text"])
            st = ds.map_batches(T.text_stats, batch_format="pyarrow")
            import pandas as pd

            agg = st.to_pandas()[["n_chars_txt", "n_ws_tokens", "n_punct"]]
            print(json.dumps({
                "n_docs": len(agg),
                "total_chars": int(agg.n_chars_txt.sum()),
                "total_tokens": int(agg.n_ws_tokens.sum()),
                "mean_chars": round(float(agg.n_chars_txt.mean()), 1),
            }))
        else:  # wds
            if not args.out:
                print(json.dumps({"error": "wds requires --out"}))
                return 2
            from .sinks.webdataset import write_webdataset

            ds = ray.data.read_parquet(
                f"{args.sf}/documents.parquet",
                columns=["doc_id", "text", "lang", "source"])
            m = write_webdataset(ds, args.out, n_shards=args.shards,
                                 meta_cols=("lang", "source")).to_pandas()
            print(json.dumps({
                "out": args.out,
                "shards": len(m),
                "samples": int(m.n_samples.sum()),
                "bytes": int(m.n_bytes.sum()),
                "skipped": int(m.skipped.sum()),
            }))
        return 0
    finally:
        ray.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="planetiler_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the flagship (or YAML) build")
    b.add_argument("--sf", required=True, help="sf dir with the parquet tables")
    b.add_argument("--out", required=True, help="output path (dir or archive file)")
    b.add_argument("--format", default="files",
                   choices=["files", "shard", "mbtiles", "pmtiles", "proto"])
    b.add_argument("--zooms", default="0,2,4,6,8,10,12,14")
    b.add_argument("--repl", type=int, default=1)
    b.add_argument("--cpus", type=int, default=8)
    b.add_argument("--yaml", default=None, help="no-code YAML schema path")

    v = sub.add_parser(
        "verify",
        help="validity-check an archive, or run schema-conformance tests "
             "(--tests, the BaseSchemaValidator analogue)",
    )
    v.add_argument("--archive", default=None)
    v.add_argument("--tests", default=None,
                   help="YAML spec of input->expected-output examples")
    v.add_argument("--schema", default=None,
                   help="no-code YAML schema to validate (default: built-in "
                        "sample schema)")

    c = sub.add_parser("compare", help="tile-by-tile diff of two archives")
    c.add_argument("--a", required=True)
    c.add_argument("--b", required=True)

    co = sub.add_parser(
        "corpus",
        help="training-data curation ops over a documents parquet "
             "(clean | dedup | diff | stats | wds-export)",
    )
    co.add_argument("op", choices=["clean", "dedup", "diff", "stats", "wds"])
    co.add_argument("--sf", required=True, help="sf dir with documents.parquet")
    co.add_argument("--out", default=None, help="output dir (parquet / tars)")
    co.add_argument("--against", default=None,
                    help="second sf dir (diff: old=--sf, new=--against)")
    co.add_argument("--min-quality-bp", type=int, default=2000)
    co.add_argument("--shards", type=int, default=64)
    co.add_argument("--cpus", type=int, default=8)

    cv = sub.add_parser("convert", help="shapefile/geopackage -> WKB parquet")
    cv.add_argument("--src", required=True, help=".shp or .gpkg path")
    cv.add_argument("--out", required=True, help="output parquet dir")
    cv.add_argument("--table", default=None, help="gpkg feature table")
    cv.add_argument("--cpus", type=int, default=8)

    pl = sub.add_parser(
        "plan",
        help="resource preflight: predict rows/shuffle bytes/object-store "
             "peak from footers + a bounded sample (Planetiler's pre-run "
             "disk/RAM estimate)")
    pl.add_argument("--sf", required=True, help="sf dir with parquet tables")
    pl.add_argument("--zooms", default="0,2,4,6,8,10,12,14")
    pl.add_argument("--repl", type=int, default=1)
    pl.add_argument("--n-buckets", type=int, default=1024)
    pl.add_argument("--sample-rows", type=int, default=500)
    pl.add_argument("--json", action="store_true", dest="as_json")
    pl.add_argument("--cpus", type=int, default=8)

    args = ap.parse_args(argv)

    if args.cmd in ("verify", "compare"):
        from .tools import compare_archives, verify_archive

        if args.cmd == "verify":
            if args.tests:
                from .pipelines import validator
                from .pipelines.yamlprofile import SAMPLE_SCHEMA

                if args.schema:
                    with open(args.schema) as f:
                        schema_src = f.read()
                else:
                    schema_src = SAMPLE_SCHEMA
                with open(args.tests) as f:
                    spec_src = f.read()
                results = validator.validate(schema_src, spec_src)
                print(validator.format_results(results))
                return 0 if all(r.ok for r in results) else 1
            if not args.archive:
                ap.error("verify requires --archive or --tests")
            print(json.dumps(verify_archive(args.archive)))
            return 0
        res = compare_archives(args.a, args.b)
        print(json.dumps({
            "identical": res.identical, "n_a": res.n_a, "n_b": res.n_b,
            "n_match": res.n_match, "only_a": res.only_a[:5],
            "only_b": res.only_b[:5], "diff": res.diff[:5],
        }))
        return 0 if res.identical else 1

    if args.cmd == "corpus":
        return _corpus_cmd(args)

    import ray

    if not ray.is_initialized():
        _init_ray(args.cpus)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    if args.cmd == "plan":
        try:
            from .pipelines.preflight import estimate_build, format_plan

            est = estimate_build(
                args.sf, zooms=[int(z) for z in args.zooms.split(",")],
                repl=args.repl, n_buckets=args.n_buckets,
                sample_rows=args.sample_rows)
            print(json.dumps(est) if args.as_json else format_plan(est))
            return 1 if est["warnings"] else 0
        finally:
            ray.shutdown()

    if args.cmd == "convert":
        try:
            if args.src.endswith((".osm.pbf", ".pbf")):
                # planet ingestion: parallel blob decode -> one parquet
                # dataset per entity kind (nodes / way_refs / relations)
                from .sources import osmpbf

                counts = {}
                for name, reader in (
                    ("nodes", osmpbf.read_pbf_nodes),
                    ("way_refs", osmpbf.read_pbf_way_refs),
                    ("relation_members", osmpbf.read_pbf_relation_members),
                ):
                    ds = reader(args.src)
                    ds.write_parquet(f"{args.out}/{name}")
                    counts[name] = "written"
                print(json.dumps({"out": args.out, "tables": counts}))
                return 0
            if args.src.endswith(".gpkg"):
                from .sources.geopackage import read_geopackage

                ds = read_geopackage(args.src, table=args.table)
            else:
                from .sources.shapefile import read_shapefile

                ds = read_shapefile(args.src)
            ds = ds.materialize()  # one parse pass for both write and count
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out}))
            return 0
        finally:
            ray.shutdown()

    zooms = [int(z) for z in args.zooms.split(",")]
    try:
        from .pipelines import flagship

        if args.yaml:
            from .pipelines.yamlprofile import build_yaml_tiles, load_schema, profile_from_schema
            from .sinks.mbtiles import write_mbtiles

            with open(args.yaml) as f:
                schema = load_schema(f.read())
            if args.format not in ("mbtiles", "pmtiles"):
                print(json.dumps({"error": "--yaml builds support --format "
                                           "mbtiles|pmtiles only"}))
                return 2
            tiles = build_yaml_tiles(args.sf, schema, zooms=zooms).materialize()
            if args.format == "mbtiles":
                stats = write_mbtiles(tiles, args.out)
            else:
                from .sinks.pmtiles import write_pmtiles

                stats = write_pmtiles(tiles, args.out)
            print(json.dumps(stats))
            return 0
        if args.format in ("files", "shard"):
            df = flagship.build_archive(args.sf, args.out, zooms=zooms,
                                        repl=args.repl, layout=args.format)
            print(json.dumps({
                "n_tiles": int(df.n_tiles.sum()),
                "n_bytes": int(df.n_bytes.sum()),
                "n_buckets": len(df),
                "skipped": int(df.skipped.sum()),
            }))
        elif args.format == "mbtiles":
            print(json.dumps(flagship.build_mbtiles(args.sf, args.out, zooms=zooms,
                                                    repl=args.repl)))
        elif args.format == "proto":
            print(json.dumps(flagship.build_proto_stream(args.sf, args.out,
                                                         zooms=zooms,
                                                         repl=args.repl)))
        else:
            print(json.dumps(flagship.build_pmtiles(args.sf, args.out, zooms=zooms,
                                                    repl=args.repl)))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
