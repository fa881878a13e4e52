"""spark-submit job: output dumpers — `mahout clusterdump`,

`mahout matrixdump`, `mahout cmdump`, `mahout vectordump` twins, plus
`clusterpp` (group points by cluster).

Reference anchors (studied, not copied):
  utils/clustering/ClusterDumper.java (cluster centers + sizes +
  per-cluster point samples to text), utils/MatrixDumper.java (matrix
  → CSV), classifier/ConfusionMatrixDumper.java (text grid),
  utils/vectors/VectorDumper.java, clustering/topdown/postprocessor/
  ClusterOutputPostProcessorDriver.java (clusterpp: one directory per
  cluster).

Usage:
  python jobs/dump.py clusterdump --model /tmp/clusters/model.json \
      [--assignments /tmp/clusters/assignments] [--points N] \
      [--output dump.txt]
  python jobs/dump.py matrixdump --input drm.parquet --output m.csv
  python jobs/dump.py cmdump --predictions preds.parquet \
      [--actual-col label --predicted-col predicted] [--output cm.txt]
  python jobs/dump.py vectordump --input vecs.parquet [--limit 20]
  python jobs/dump.py clusterpp --assignments assignments.parquet \
      --points points.parquet --output /tmp/byCluster
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(text: str, output: str | None) -> None:
    if output:
        with open(output, "w") as f:
            f.write(text)
    print(text)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["clusterdump", "matrixdump", "cmdump",
                                     "vectordump", "clusterpp",
                                     "qualcluster", "seqdumper"])
    ap.add_argument("--model", default=None)
    ap.add_argument("--input", default=None)
    ap.add_argument("--assignments", default=None)
    ap.add_argument("--points", type=int, default=0,
                    help="clusterdump: sample points per cluster")
    ap.add_argument("--predictions", default=None)
    ap.add_argument("--actual-col", default="label")
    ap.add_argument("--predicted-col", default="predicted")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--seqfile", action="store_true",
                    help="input is a dir of Hadoop SequenceFile parts "
                    "(Mahout VectorWritable) instead of parquet")
    ap.add_argument("--output", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.session import get_spark

    spark = get_spark(f"dump_{args.mode}", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "clusterdump":
        if not args.model:
            ap.error("clusterdump requires --model (model.json)")
        with open(args.model) as f:
            meta = json.load(f)
        lines = [f"{len(meta['centers'])} clusters "
                 f"({ {k: v for k, v in meta.items() if k != 'centers'} })"]
        sizes = {}
        if args.assignments:
            asg = spark.read.parquet(args.assignments)
            ccol = "cluster" if "cluster" in asg.columns else asg.columns[1]
            sizes = {r[ccol]: r["n"] for r in
                     asg.groupBy(ccol).agg(F.count("*").alias("n"))
                     .collect()}
        for cid, c in enumerate(meta["centers"]):
            head = ", ".join(f"{x:.4f}" for x in c[:8])
            more = ", ..." if len(c) > 8 else ""
            lines.append(f"CL-{cid}{{n={sizes.get(cid, '?')} "
                         f"c=[{head}{more}]}}")
            if args.points and args.assignments:
                idc = asg.columns[0]
                pts = (asg.filter(F.col(ccol) == cid)
                       .orderBy(idc).limit(args.points).collect())
                for p in pts:
                    lines.append(f"  {p[idc]}"
                                 + (f" dist2={p['dist2']:.4f}"
                                    if "dist2" in asg.columns else ""))
        _emit("\n".join(lines), args.output)

    elif args.mode == "seqdumper":
        # utils/SequenceFileDumper.java: header classes + key/value
        # lines + count; works on any SequenceFile our reader decodes
        # (incl. record-/block-compressed), falling back to raw bytes
        import glob as _glob

        from mahout_spark.sources.seqfile import read_sequence_file

        if not args.input:
            ap.error("seqdumper requires --input (file or part dir)")
        paths = sorted(_glob.glob(os.path.join(args.input, "part-*"))
                       ) if os.path.isdir(args.input) else [args.input]
        lines = []
        total = 0
        for p in paths:
            data = open(p, "rb").read()
            lines.append(f"Input Path: {p}")
            try:
                recs = list(read_sequence_file(data))
            except ValueError:
                recs = list(read_sequence_file(data, raw=True))
            for i, (k, v) in enumerate(recs):
                if i >= args.limit:
                    lines.append(f"... ({len(recs) - args.limit} more)")
                    break
                vs = str(v)
                lines.append(f"Key: {k}: Value: "
                             f"{vs[:120] + '...' if len(vs) > 120 else vs}")
            lines.append(f"Count: {len(recs)}")
            total += len(recs)
        lines.append(f"Total Count: {total}")
        _emit("\n".join(lines), args.output)

    elif args.mode == "matrixdump":
        if not args.input:
            ap.error("matrixdump requires --input (DRM triples)")
        drm = spark.read.parquet(args.input)
        ncol = drm.agg(F.max("col_id")).first()[0] + 1
        rows = (drm.groupBy("row_id")
                .agg(F.map_from_arrays(F.collect_list("col_id"),
                                       F.collect_list("value")).alias("m"))
                .orderBy("row_id").collect())
        lines = []
        for r in rows:
            vals = [r["m"].get(j, 0.0) for j in range(ncol)]
            lines.append(",".join(str(v) for v in vals))
        _emit("\n".join(lines), args.output)

    elif args.mode == "cmdump":
        if not args.predictions:
            ap.error("cmdump requires --predictions")
        preds = spark.read.parquet(args.predictions)
        a, p = args.actual_col, args.predicted_col
        cells = preds.groupBy(a, p).agg(F.count("*").alias("n")).collect()
        labels = sorted({r[a] for r in cells} | {r[p] for r in cells},
                        key=str)
        cm = {(r[a], r[p]): r["n"] for r in cells}
        total = sum(cm.values())
        right = sum(n for (x, y), n in cm.items() if x == y)
        w = max(8, max(len(str(x)) for x in labels) + 2)
        lines = ["".join([" " * w] + [f"{str(x):>{w}}" for x in labels])
                 + "   <-- predicted"]
        for x in labels:
            lines.append("".join(
                [f"{str(x):>{w}}"]
                + [f"{cm.get((x, y), 0):>{w}}" for y in labels]))
        lines.append(f"accuracy = {right}/{total} = {right/total:.4f}"
                     if total else "accuracy = n/a")
        _emit("\n".join(lines), args.output)

    elif args.mode == "vectordump":
        if not args.input:
            ap.error("vectordump requires --input")
        if args.input.endswith(".seq") or args.seqfile:
            # the reference's native on-disk format (VectorWritable)
            from mahout_spark.sources.seqfile import read_seqfile_df

            df = read_seqfile_df(spark, args.input)
        else:
            df = spark.read.parquet(args.input)
        lines = [str(r.asDict()) for r in df.limit(args.limit).collect()]
        _emit("\n".join(lines), args.output)

    elif args.mode == "qualcluster":
        # ClusterQualitySummarizer: per-cluster size / avg / max
        # intra-cluster distance (from the assignment pass) + the
        # minimum inter-center distance, as CSV
        if not (args.model and args.assignments):
            ap.error("qualcluster requires --model and --assignments")
        import math

        with open(args.model) as f:
            meta = json.load(f)
        asg = spark.read.parquet(args.assignments)
        ccol = "cluster" if "cluster" in asg.columns else asg.columns[1]
        stats = (asg.groupBy(ccol)
                 .agg(F.count("*").alias("n"),
                      F.avg(F.sqrt("dist2")).alias("avg_d"),
                      F.max(F.sqrt("dist2")).alias("max_d"))
                 .orderBy(ccol).collect())
        centers = meta["centers"]
        lines = ["cluster,n,avg_distance,max_distance,"
                 "min_center_distance"]
        for r in stats:
            cid = r[ccol]
            c = centers[cid]
            min_cd = min(
                (math.sqrt(sum((a - b) ** 2 for a, b in zip(c, o)))
                 for j, o in enumerate(centers) if j != cid),
                default=float("nan"))
            lines.append(f"{cid},{r['n']},{r['avg_d']:.6f},"
                         f"{r['max_d']:.6f},{min_cd:.6f}")
        _emit("\n".join(lines), args.output)

    else:  # clusterpp
        if not (args.assignments and args.input and args.output):
            ap.error("clusterpp requires --assignments --input --output")
        asg = spark.read.parquet(args.assignments)
        pts = spark.read.parquet(args.input)
        idc = asg.columns[0]
        ccol = "cluster" if "cluster" in asg.columns else asg.columns[1]
        (pts.join(asg.select(idc, ccol), idc)
            .write.mode("overwrite").partitionBy(ccol)
            .parquet(args.output))
        print(json.dumps({"clusters": asg.select(ccol).distinct().count(),
                          "out": args.output}))

    spark.stop()


if __name__ == "__main__":
    main()
