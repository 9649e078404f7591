"""Scale-shape harness (VERDICT r12 #3): measure how each expensive
lane's wall time grows when the data grows ~Nx, because the sf0.1
bench cannot distinguish linear from quadratic/funnel behavior — a
lane can look fine at 5k documents and still hide a single-task sort
or an all-pairs blowup that only fires at corpus scale.

Method: synthesize a composite sf dir by unioning N id-offset copies
of the base tables (default /root/testdata/sf0.1, N=10), then run each
target lane once at the base and once at the composite and report the
wall-time ratio. Copies are PERTURBED so the duplicate/near-duplicate
RATE stays roughly constant as the corpus grows (the realistic shape):

- documents: every 5th word of each copy>0 gets a per-copy suffix, so
  shingle/minhash/simhash signatures differ across copies and pair
  finders see ~Nx the within-copy pairs, not N^2 cross-copy pairs. A
  composite built from VERBATIM copies would flag every pair finder as
  quadratic by construction — the growth would be in the OUTPUT, not
  the algorithm.
- embeddings: each element of each copy>0 gets a deterministic jitter
  of +/-0.1 (hash of (vec_id, position, copy)), killing cross-copy
  near-identity while preserving the overall geometry.
- events/orders/lineitem/customer: id columns offset by copy *
  10^9 (new users / orders / customers per copy; suppliers stay fixed
  so the purchase graph's hub degrees grow with the data — the skew
  shape a real catalog has).
- region/nation/supplier/part: symlinked unscaled (dimensions).

Verdicts per lane, with S = the actual scale factor:
- ratio <= 0.30*S      -> "constant"   (setup/training dominated)
- ratio <= 1.45*S      -> "linear-ok"
- otherwise            -> "SUPERLINEAR" (triage: hidden funnel)
The 1.45 headroom absorbs shuffle-partition granularity and JIT noise
at local[32]; a true quadratic lane at S=10 reads ~100x and is
unmistakable.

Usage:
    python tools/scale_check.py [--base DIR] [--scale N]
                                [--lanes a,b,c] [--rebuild]

Prints one JSON line {base, scale, lanes: {name: {base_s, scaled_s,
ratio, verdict, base_rows, scaled_rows}}} plus a stderr table.
Composite dirs are cached under /tmp/icelake_scale and reused.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Bump when the composite construction changes: stale caches rebuild.
BUILDER_VERSION = 2

ID_STEP = 10 ** 9

# The 6-10 most expensive / most funnel-prone lanes (VERDICT r12 #3).
DEFAULT_LANES = [
    "curation_pipeline",
    "semdedup",
    "winnow_candidates",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "lsh_cosine_pairs",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "dedup_exact",
    "ivf_pq_topk",
    "pagerank_purchases",
]

SCALED = {"documents", "embeddings", "events", "orders", "lineitem",
          "customer"}
LINKED = {"region", "nation", "supplier", "part"}


def _salt_documents(df, copy: int):
    """Replace every 5th word with word_c<copy> (JVM-side transform):
    most 5-gram shingles differ from the original, so near-dup pair
    finders do not match across copies and the pair count scales ~Nx."""
    from pyspark.sql import functions as F

    words = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(i % 5 == 0,
                                F.concat(w, F.lit(f"_c{copy}")))
                          .otherwise(w)),
        " ")
    return df.withColumn("text", salted) \
             .withColumn("n_chars", F.length("text"))


def _jitter_embeddings(df, copy: int):
    """Deterministic +/-0.1 per-element jitter derived from
    (vec_id, position, copy): cross-copy cosine drops below near-dup
    thresholds while the cluster geometry survives."""
    from pyspark.sql import functions as F

    jit = lambda x, j: x + (
        F.pmod(F.hash(F.col("vec_id"), j, F.lit(copy)), F.lit(1000))
         .cast("float") / F.lit(500.0) - F.lit(1.0)) * F.lit(0.1)
    return df.withColumn(
        "embedding", F.transform(F.col("embedding"), jit))


def _offset(df, copy: int, cols: list[str]):
    from pyspark.sql import functions as F

    for c in cols:
        df = df.withColumn(c, F.col(c) + F.lit(copy * ID_STEP))
    return df


def build_composite(spark, base: str, scale: int, out_dir: str) -> None:
    from icelake_spark.queries import load

    os.makedirs(out_dir, exist_ok=True)
    for t in sorted(LINKED):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(base, f"{t}.parquet"), dst)

    plans = {
        "documents": (["doc_id"], _salt_documents),
        "embeddings": (["vec_id"], _jitter_embeddings),
        "events": (["event_id", "user_id"], None),
        "orders": (["o_orderkey", "o_custkey"], None),
        "lineitem": (["l_orderkey"], None),
        "customer": (["c_custkey"], None),
    }
    for t in sorted(SCALED):
        id_cols, perturb = plans[t]
        base_df = load(spark, base, t)
        parts = []
        for i in range(scale):
            df = _offset(base_df, i, id_cols)
            if perturb is not None and i > 0:
                df = perturb(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dst = os.path.join(out_dir, f"{t}.parquet")
        out.write.mode("overwrite").parquet(dst)
        print(f"# built {t} x{scale}", file=sys.stderr)


def _composite_dir(base: str, scale: int) -> str:
    tag = os.path.basename(base.rstrip("/"))
    return os.path.join("/tmp/icelake_scale",
                        f"{tag}_x{scale}_v{BUILDER_VERSION}")


def _run(fn, spark, sf_dir) -> tuple[float, int]:
    t0 = time.time()
    n = len(fn(spark, sf_dir).collect())
    return round(time.time() - t0, 2), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--lanes", default=",".join(DEFAULT_LANES))
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()
    lanes = [s for s in args.lanes.split(",") if s]

    import bench
    import icelake_spark
    from icelake_spark.queries import queries

    spark = icelake_spark.default_session("icelake_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**queries(), **bench._bench_variants()}
    unknown = [n for n in lanes if n not in qs]
    if unknown:
        raise SystemExit(f"unknown lanes: {unknown}")

    comp = _composite_dir(args.base, args.scale)
    marker = os.path.join(comp, "_SCALE_OK")
    if args.rebuild and os.path.isdir(comp):
        shutil.rmtree(comp)
    if not os.path.exists(marker):
        if os.path.isdir(comp):  # partial build: start clean
            shutil.rmtree(comp)
        t0 = time.time()
        build_composite(spark, args.base, args.scale, comp)
        with open(marker, "w") as f:
            f.write(f"{args.base} x{args.scale} v{BUILDER_VERSION}\n")
        print(f"# composite built in {time.time() - t0:.0f}s -> {comp}",
              file=sys.stderr)
    else:
        print(f"# composite cache hit -> {comp}", file=sys.stderr)

    # codegen warmup (bench.py discipline): run every lane once at
    # sf0.001 so the timed pair measures execution, not compilation
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for name in lanes:
            try:
                qs[name](spark, warm).collect()
            except Exception as e:
                print(f"# warmup {name}: {type(e).__name__}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name in lanes:
        try:
            base_s, base_rows = _run(qs[name], spark, args.base)
            scaled_s, scaled_rows = _run(qs[name], spark, comp)
        except Exception as e:
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  file=sys.stderr)
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        ratio = round(scaled_s / base_s, 2) if base_s > 0 else float("inf")
        verdict = ("constant" if ratio <= 0.30 * args.scale else
                   "linear-ok" if ratio <= 1.45 * args.scale else
                   "SUPERLINEAR")
        out[name] = {"base_s": base_s, "scaled_s": scaled_s,
                     "ratio": ratio, "verdict": verdict,
                     "base_rows": base_rows, "scaled_rows": scaled_rows}
        print(f"# {name}: {base_s}s -> {scaled_s}s = {ratio}x "
              f"[{verdict}] rows {base_rows} -> {scaled_rows}",
              file=sys.stderr)

    spark.stop()
    print(json.dumps({"base": args.base, "scale": args.scale,
                      "lanes": out}))
    bad = [n for n, r in out.items()
           if r.get("verdict") == "SUPERLINEAR" or "error" in r]
    if bad:
        print(f"# SUPERLINEAR/failed lanes: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
