"""spark-submit entrypoint for the continuous-aggregate store.

Usage (cluster):

    scripts/package.py                       # builds dist/pyhctsa_spark.zip
    spark-submit --py-files dist/pyhctsa_spark.zip \\
        jobs/cagg_job.py \\
        --events s3://bucket/events/ \\
        --store  s3://bucket/cagg_store/ \\
        --mode   refresh --window-minutes 30 --chunk-windows 48

Modes (all against the snapshot-committed store — atomic manifest,
exactly-once, crash-replayable):
  materialize  full (re)build from --events
  refresh      incremental merge of --events as one delta batch
  stream       follow --events as a parquet directory stream
               (requires --checkpoint; each micro-batch commits a
               generation; availableNow drain with --drain)
  expire       retention: drop chunks older than --keep-windows
               behind the watermark (one manifest edit)

Prints one JSON line of lineage counters on success.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="pyhctsa_spark cagg store job")
    p.add_argument("--events", help="events parquet directory")
    p.add_argument("--store", required=True)
    p.add_argument("--mode", required=True,
                   choices=["materialize", "refresh", "stream", "expire"])
    p.add_argument("--on", default="ts")
    p.add_argument("--by", default="user_id",
                   help="comma-separated key columns")
    p.add_argument("--value-col", default="value")
    p.add_argument("--window-minutes", type=int, default=30)
    p.add_argument("--chunk-windows", type=int, default=48)
    p.add_argument("--batch-id", type=int, default=None,
                   help="idempotency id for refresh mode")
    p.add_argument("--keep-windows", type=int, default=None,
                   help="expire mode: horizon in windows behind the "
                        "store's max widx")
    p.add_argument("--checkpoint", default=None, help="stream mode")
    p.add_argument("--drain", action="store_true",
                   help="stream mode: availableNow (drain and stop)")
    p.add_argument("--schema",
                   default="event_id long, ts timestamp, user_id long, "
                           "value double",
                   help="stream mode: reader schema")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import functions as F

    from pyhctsa_spark.operators.cagg import CaggSnapshotStore
    from pyhctsa_spark.session import get_spark

    spark = get_spark("cagg-job", master="from-submit")
    store = CaggSnapshotStore(
        args.store,
        by=args.by.split(","),
        on=args.on,
        value_col=args.value_col,
        window_micros=args.window_minutes * 60 * 1_000_000,
        chunk_windows=args.chunk_windows,
    )
    if args.mode == "materialize":
        if not args.events:
            print("--events required", file=sys.stderr)
            return 2
        store.materialize(spark.read.parquet(args.events))
        man = store.manifest()
        print(json.dumps({"mode": "materialize",
                          "chunks": len(man["chunks"])}))
        return 0
    if args.mode == "refresh":
        if not args.events:
            print("--events required", file=sys.stderr)
            return 2
        info = store.refresh(
            spark, spark.read.parquet(args.events), batch_id=args.batch_id
        )
        print(json.dumps({"mode": "refresh", **info}))
        return 0
    if args.mode == "stream":
        if not (args.events and args.checkpoint):
            print("--events and --checkpoint required", file=sys.stderr)
            return 2
        from pyhctsa_spark.streaming.cagg_stream import stream_cagg

        q = stream_cagg(
            spark, args.events, args.store, args.checkpoint,
            schema=args.schema, on=args.on, by=args.by.split(","),
            value_col=args.value_col,
            window_micros=args.window_minutes * 60 * 1_000_000,
            chunk_windows=args.chunk_windows,
            available_now=args.drain,
        )
        q.awaitTermination()
        print(json.dumps({"mode": "stream",
                          "last_batch": store.manifest()["last_batch"]}))
        return 0
    # expire
    if args.keep_windows is None:
        print("--keep-windows required", file=sys.stderr)
        return 2
    wm = (
        store.read(spark).agg(F.max("widx").alias("m")).first()["m"]
    )
    doomed = store.expire(int(wm) - args.keep_windows + 1)
    print(json.dumps({"mode": "expire", "watermark_widx": int(wm),
                      "evicted_chunks": len(doomed)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
