"""CLI entry point — the reference's Makefile/main() surface as one
``python -m sustainable_building_energy_benchmarking_pipeline_spark <cmd>`` tool (reference
``src/pipeline_batch.py:248``, ``src/models.py:467``,
``src/generate_hvac_data.py:228``, ``Makefile`` targets).

Commands mirror the reference's stages; every one is a thin shell over
the library plans, so the CLI adds no logic of its own:

  generate   write synthetic HVAC sensor data        (make sample-data)
  etl        raw → cleaned+features parquet          (run_etl_pipeline)
  detect     features → anomalies parquet            (run_anomaly_detection)
  medallion  buildings → bronze/silver/gold          (benchmarking notebook)
  curate     documents → deduped/filtered/capped corpus (plans.curation)
  export     silver → nested benchmarking JSON       (export_building_benchmarking)
  serve      HTTP API (/alerts, /benchmark, ...)     (make run-api)
  query      run one registry query by name, print N rows
  delta      Delta table maintenance: history, convert, optimize [--zorder],
             vacuum, delete --where, restore --version, checkpoint,
             add/drop-constraint, set/unset-property, cluster-by,
             reorg (purge deletion vectors)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sustainable_building_energy_benchmarking_pipeline_spark")
    p.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write synthetic HVAC data")
    g.add_argument("--out", required=True)
    g.add_argument("--days", type=int, default=7)
    g.add_argument("--zones", type=int, default=10)
    g.add_argument(
        "--no-faults", dest="faults", action="store_false",
        help="omit fault episodes (the reference sample-data stage includes them)",
    )

    e = sub.add_parser("etl", help="raw sensor parquet → feature parquet")
    e.add_argument("--in", dest="inp", required=True)
    e.add_argument("--out", required=True)

    d = sub.add_parser("detect", help="feature parquet → anomalies parquet")
    d.add_argument("--in", dest="inp", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--ml", action="store_true", help="also run the IF detector")
    d.add_argument(
        "--distributed-train",
        action="store_true",
        help="train the IF on ALL normal rows (one sub-forest per "
        "partition, merged) instead of the bounded driver sample — "
        "the no-row-cap path for large feature tables",
    )

    m = sub.add_parser("medallion", help="buildings csv/parquet → medallion dirs")
    m.add_argument("--in", dest="inp", required=True)
    m.add_argument("--out", required=True)
    m.add_argument(
        "--format",
        choices=["delta", "parquet"],
        default="delta",
        help="layer table format: delta (transaction-logged, versioned — "
        "the reference stores every medallion layer in Delta; default) "
        "or plain parquet",
    )

    c = sub.add_parser(
        "curate",
        help="documents parquet → curated corpus parquet (exact dedup, "
        "repetition filter, per-source caps)",
    )
    c.add_argument("--in", dest="inp", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--dup-frac-max", type=float, default=0.55)
    c.add_argument("--source-cap", type=int, default=15)

    x = sub.add_parser("export", help="silver parquet → benchmarking JSON")
    x.add_argument("--in", dest="inp", required=True)
    x.add_argument("--out", required=True)

    s = sub.add_parser("serve", help="HTTP API over an anomalies parquet")
    s.add_argument("--anomalies", required=True)
    s.add_argument("--port", type=int, default=8000)

    t = sub.add_parser(
        "delta",
        help="Delta table maintenance (history/optimize/vacuum/delete/"
        "restore/checkpoint/constraints/properties)",
    )
    t.add_argument(
        "op",
        choices=[
            "history", "detail", "optimize", "vacuum", "delete", "update",
            "restore", "checkpoint", "clone", "convert", "reorg",
            "fsck", "add-constraint",
            "drop-constraint", "set-property", "unset-property",
            "cluster-by",
        ],
    )
    t.add_argument("path", help="Delta table directory")
    t.add_argument("--zorder", default=None, help="comma-separated columns for OPTIMIZE ZORDER BY")
    t.add_argument("--target-files", type=int, default=1)
    t.add_argument("--where", default=None, help="DELETE/UPDATE predicate (Spark SQL)")
    t.add_argument(
        "--set",
        action="append",
        default=None,
        metavar="COL=EXPR",
        help="UPDATE assignment, repeatable (e.g. --set 'v=v*1.1')",
    )
    t.add_argument("--version", type=int, default=None, help="RESTORE target version")
    t.add_argument("--to", default=None, help="CLONE destination directory")
    t.add_argument(
        "--partition-by",
        default=None,
        metavar="COL:TYPE[,COL:TYPE...]",
        help="CONVERT partition schema for hive-layout dirs (e.g. lang:string)",
    )
    t.add_argument(
        "--retain-hours",
        type=float,
        default=None,
        help="VACUUM retention; default = the table's "
        "delta.deletedFileRetentionDuration, else 168 h",
    )
    t.add_argument("--force", action="store_true", help="allow vacuum retention < safety floor")
    t.add_argument(
        "--dry-run",
        action="store_true",
        help="VACUUM/FSCK: list what would be reclaimed/dropped, touch nothing",
    )
    t.add_argument("--name", default=None, help="constraint name")
    t.add_argument("--expr", default=None, help="constraint CHECK expression")
    t.add_argument("--key", default=None, help="table property key")
    t.add_argument("--value", default=None, help="table property value")
    t.add_argument(
        "--columns",
        default=None,
        metavar="COL[,COL...]",
        help="CLUSTER BY columns ('' or 'none' = CLUSTER BY NONE)",
    )

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name")
    q.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    q.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from sustainable_building_energy_benchmarking_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"sbeb-cli-{args.cmd}",
        **(
            {"master": f"local[{args.cpus}]", "shuffle_partitions": args.cpus}
            if args.cpus
            else {}
        ),
    )

    from sustainable_building_energy_benchmarking_pipeline_spark.sources import io as sio

    if args.cmd == "generate":
        from sustainable_building_energy_benchmarking_pipeline_spark.sources.generators import (
            generate_hvac_data,
        )

        df = generate_hvac_data(
            spark, days=args.days, n_zones=args.zones, with_faults=args.faults
        )
        sio.write_table(df, args.out)
        # count the WRITTEN parquet (metadata-cheap) — counting the lazy
        # plan would re-execute the whole generate pipeline
        print(f"wrote {sio.read_table(spark, args.out).count()} rows to {args.out}")
    elif args.cmd == "etl":
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.hvac import run_feature_pipeline

        feats = run_feature_pipeline(sio.read_table(spark, args.inp))
        sio.write_table(feats, args.out)
        n = sio.read_table(spark, args.out).count()
        print(f"wrote {n} feature rows to {args.out}")
    elif args.cmd == "detect":
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.detection import run_rule_detection

        feats = sio.read_table(spark, args.inp)
        anoms = run_rule_detection(feats)
        if args.distributed_train and not args.ml:
            # --distributed-train only configures the IF trainer; without
            # this it was silently ignored and the user got rule-only output
            args.ml = True
        if args.ml:
            from sustainable_building_energy_benchmarking_pipeline_spark.ml.isolation_forest import (
                IsolationForestDetector,
            )

            det = IsolationForestDetector()
            det = (
                det.train_distributed(feats)
                if args.distributed_train
                else det.train(feats)
            )
            ml = det.detect(feats)
            anoms = anoms.unionByName(ml, allowMissingColumns=True)
        sio.write_table(anoms, args.out)
        n = sio.read_table(spark, args.out).count()
        print(f"wrote {n} anomalies to {args.out}")
    elif args.cmd == "curate":
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.curation import curate_documents

        kept = curate_documents(
            sio.read_table(spark, args.inp),
            dup_frac_max=args.dup_frac_max,
            source_cap=args.source_cap,
        )
        sio.write_table(kept, args.out)
        n_in = sio.read_table(spark, args.inp).count()
        n_out = sio.read_table(spark, args.out).count()
        print(f"curated {n_in} -> {n_out} documents at {args.out}")
    elif args.cmd == "medallion":
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.benchmarking import run_medallion

        layers = run_medallion(sio.read_table(spark, args.inp))
        if args.format == "delta":
            # the reference persists every medallion layer as a Delta
            # table, overwritten per run (notebooks/
            # benchmarking_medallion.py:98-104,270-277) — each re-run
            # commits version N+1, keeping the previous run time-travelable
            from sustainable_building_energy_benchmarking_pipeline_spark.sources import deltalog as dl

            for name, df in layers.items():
                v = dl.write_delta(
                    df, f"{args.out.rstrip('/')}/{name}", mode="overwrite"
                )
                print(f"layer {name}: delta version {v}")
        else:
            for name, df in layers.items():
                sio.write_table(df, f"{args.out.rstrip('/')}/{name}.parquet")
        print(f"wrote layers {sorted(layers)} under {args.out}")
    elif args.cmd == "export":
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.export import (
            assemble_export_document,
            to_json,
        )

        # assemble_export_document resolves records itself — passing a
        # pre-resolved frame would run the normalization twice
        doc = assemble_export_document(sio.read_table(spark, args.inp))
        with open(args.out, "w") as f:
            f.write(to_json(doc))
        print(f"wrote {args.out} ({len(doc.get('buildings', []))} buildings)")
    elif args.cmd == "serve":
        from sustainable_building_energy_benchmarking_pipeline_spark.api import create_app

        app = create_app(spark, sio.read_table(spark, args.anomalies))
        app.run(port=args.port)  # blocks
    elif args.cmd == "delta":
        from sustainable_building_energy_benchmarking_pipeline_spark.sources import deltalog as dl

        def _need(attr: str, flag: str):
            v = getattr(args, attr)
            if v is None:
                p.error(f"delta {args.op} requires {flag}")
            return v

        if args.op == "history":
            for h in dl.delta_history(args.path):
                print(json.dumps(h, default=str))
        elif args.op == "detail":
            print(json.dumps(dl.delta_detail(args.path), default=str))
        elif args.op == "optimize":
            zcols = args.zorder.split(",") if args.zorder else None
            v = dl.optimize_delta(
                spark,
                args.path,
                target_files=args.target_files,
                zorder_by=zcols,
                where=args.where,
            )
            print(f"optimized to version {v}" if v is not None else "nothing to optimize")
        elif args.op == "vacuum":
            deleted = dl.vacuum_delta(
                args.path,
                retain_hours=args.retain_hours,
                force=args.force,
                dry_run=args.dry_run,
            )
            verb = "would vacuum" if args.dry_run else "vacuumed"
            print(f"{verb} {len(deleted)} files")
        elif args.op == "delete":
            v = dl.delete_delta(spark, args.path, _need("where", "--where"))
            print(f"delete committed version {v}")
        elif args.op == "update":
            assignments = _need("set", "--set")
            set_exprs = {}
            for item in assignments:
                col, _, expr = item.partition("=")
                if not _ or not col.strip():
                    p.error(f"--set needs COL=EXPR, got {item!r}")
                set_exprs[col.strip()] = expr
            v = dl.update_delta(
                spark, args.path, _need("where", "--where"), set_exprs
            )
            print(f"update committed version {v}")
        elif args.op == "restore":
            v = dl.restore_delta(args.path, _need("version", "--version"))
            print(f"restored; committed version {v}")
        elif args.op == "checkpoint":
            v = dl.write_checkpoint(args.path)
            print(f"checkpointed version {v}")
        elif args.op == "clone":
            dl.clone_delta(args.path, _need("to", "--to"))
            print(f"shallow-cloned {args.path} -> {args.to}")
        elif args.op == "convert":
            pb = None
            if args.partition_by:
                pb = dict(
                    kv.split(":", 1) for kv in args.partition_by.split(",")
                )
            dl.convert_to_delta(args.path, partition_by=pb)
            print(f"converted {args.path} to Delta (version 0)")
        elif args.op == "add-constraint":
            v = dl.add_constraint(
                spark, args.path, _need("name", "--name"), _need("expr", "--expr")
            )
            print(f"constraint added at version {v}")
        elif args.op == "drop-constraint":
            v = dl.drop_constraint(args.path, _need("name", "--name"))
            print(f"constraint dropped at version {v}")
        elif args.op == "set-property":
            v = dl.set_table_properties(
                args.path, {_need("key", "--key"): _need("value", "--value")}
            )
            print(f"property set at version {v}")
        elif args.op == "fsck":
            dropped = dl.fsck_repair_delta(args.path, dry_run=args.dry_run)
            if args.dry_run:
                print(f"{len(dropped)} broken references" + (
                    ": " + ", ".join(dropped) if dropped else ""))
            else:
                print(f"repaired: dropped {len(dropped)} broken references")
        elif args.op == "reorg":
            v = dl.reorg_delta(spark, args.path)
            print(
                f"purged deletion vectors at version {v}"
                if v is not None
                else "no deletion vectors to purge"
            )
        elif args.op == "cluster-by":
            raw = _need("columns", "--columns")
            cols = (
                []
                if raw.strip().lower() in ("", "none")
                else [c.strip() for c in raw.split(",") if c.strip()]
            )
            v = dl.set_clustering_columns(args.path, cols)
            print(
                f"clustering set to {cols or 'NONE'} at version {v}"
            )
        elif args.op == "unset-property":
            v = dl.set_table_properties(
                args.path, {_need("key", "--key"): None},
                operation="UNSET TBLPROPERTIES",
            )
            print(f"property unset at version {v}")
    elif args.cmd == "query":
        from sustainable_building_energy_benchmarking_pipeline_spark.plans.analytics import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name}; one of {sorted(QUERIES)[:5]}...",
                  file=sys.stderr)
            return 2
        df = QUERIES[args.name].fn(spark, args.sf_dir)
        rows = df.limit(args.limit).collect()
        for r in rows:
            # recursive: a shallow asDict leaves nested structs as Row
            # objects, which default=str renders as quoted "Row(...)"
            # reprs — not machine-parseable JSON, defeating the JSON
            # output for exactly the nested-document queries
            print(json.dumps(r.asDict(recursive=True), default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
