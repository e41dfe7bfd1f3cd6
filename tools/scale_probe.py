"""Scale-curve probe: replicate the fact tables N× into a scratch
corpus and measure how each representative query's warm runtime
scales versus sf0.1 — the measured evidence behind SCALING.md's
"would survive 100 TB" claims.

    python tools/scale_probe.py [N] [SCRATCH_DIR] [--streaming]

Defaults: N=10 (≈ sf1: 6 M lineitem rows), scratch under /tmp.  The
derived corpus shifts fact keys per replica (orderkey/event_id) so
key cardinalities scale with the data; dimension tables are copied
as-is (their broadcast-ability at fixed size is exactly the 100 TB
design assumption).  documents replicate with per-replica WORD
SALTING (disjoint cross-replica shingles — the near-dup problem
scales linearly instead of every doc colliding with its N copies) and
embeddings replicate by id-shift, so the dedup/ANN composites probe
honestly too.

Prints one line per query: sf0.1 warm, scaled warm, ratio (ideal ≈ N
for linear operators, < N where fixed overhead still dominates).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"

PROBE_QUERIES = [
    "pricing_summary",            # scan + grouped agg
    "star_revenue_by_nation",     # broadcast star join
    "snapshot_delta_events",      # anti join
    "order_priority_semi",        # co-partitioned semi join
    "large_volume_orders",        # agg + join back
    "nation_trade_volume",        # multi-join (Q7 shape)
    "salted_revenue_by_nation",   # salted skew join
    "events_hourly_tumbling",     # time-window agg
    "events_sessionize",          # per-key window
    "events_click_purchase_window",  # banded interval join
    "weekly_active_users",        # dedup + spread-and-count
    "customer_acctbal_deciles",   # offset-merge global ranks
    "basket_pair_lift",           # basket arrays + map-side pair explode
    "pit_purchase_status",        # SCD2 build + as-of carry
    "funnel_conversion_latency",  # conditional-min frames + rank window
    "pareto_revenue_concentration",  # per-key agg + running-sum window
    "join_size_estimate",         # per-key count frames, no fact join
    # round 8 additions — every new fact-driven shape
    "order_interval_overlaps",    # key-blocked interval self-join
    "events_twap_by_user",        # per-user lead window + agg
    "events_cusum_changepoint",   # (type, day) grain + per-type windows
    "events_value_mad_outliers",  # histogram median / MAD
    "events_watermark_lateness_audit",  # per-user running max
    "nation_revenue_trend_ols",   # sufficient-statistics OLS
    "incremental_join_maintenance",  # two-sided delta-join IVM
    "pareto_frontier_customers",  # skyline sweep (offset-merge cummax)
    # late round-8 additions — fact-driven shapes only (text/ANN
    # tables are fixed-size at every SF; see module docstring)
    "user_behavior_diversity",    # two combinable aggs, log-free ratio
    "session_duration_histogram",  # sessionize + log2-bucket fold
    "supplier_hhi_by_region",     # broadcast dim chain + Σd² fold
    "orders_dow_seasonality",     # date-grain collapse + date-domain MA
    # round-9 additions — the >3 s-warm composites now probe on
    # REPLICATED documents/embeddings (word-salted per replica so the
    # near-dup problem itself scales linearly: cross-replica shingles
    # are disjoint, within-replica dup structure is preserved — plain
    # replication would instead grow every LSH bucket quadratically)
    "corpus_split_leakage_safe",  # MinHash + star CC + cluster-grain split
    "similarity_pq_adc",          # PQ train + ADC scan
    "dedup_minhash_lsh",          # the shared five-stage pipeline itself
    # round-10 additions — the shapes the broadcast-total audit
    # changed (checkpointed aggregate feeding its own total) plus the
    # basket-family materialization; probing pins that the checkpoint
    # cut scales with the AGGREGATE, not the fact
    "text_bigram_lm_quality",     # checkpointed bigram instance table
    "text_bm25_retrieval",        # checkpointed per-doc stats projection
    "dedup_shingle_hotspot_audit",  # checkpointed shingle-DF table
    "text_discriminative_terms",  # doc-grain pre-reduce, tokenize once
    "basket_brand_triangles",     # shared basket + edge checkpoints
    "brand_pagerank",             # same, plus two unrolled iterations
    "events_seasonality_heatmap",  # aggregate-first 168-cell grid
]

#: Round-12: the STREAMING surface gets a measured decade too
#: (`--streaming`).  Each is a bounded availableNow drain over the
#: (replicated) events parquet, so the probe measures exactly what
#: grows at 100 TB: micro-batch fold/shuffle throughput per state
#: shape.  Key cardinality differs by row (ADVICE r12): user_id is
#: not replica-shifted, so the user-keyed folds (tumbling, TWAP,
#: sessionize) run at FIXED key count with O(1) per-key state —
#: volume is the only axis that scales.  streaming_dedup_exact keys
#: on (event_id, ts) and event_id IS replica-shifted by build_scaled,
#: so its state-key count grows xN with the data (10 M keys at 100x —
#: the row SCALING.md reports as the stateful-dedup curve), and
#: streaming_wau_approx holds (user, day)-grain distinct state, fixed
#: keys x fixed days.
STREAMING_PROBE = [
    "streaming_hourly_tumbling",      # watermarked tumbling agg
    "streaming_dedup_exact",          # key-dedup state store
    "streaming_twap_by_user",         # applyInPandasWithState O(1) fold
    "streaming_sessionize_stateful",  # applyInPandasWithState sessions
    "streaming_wau_approx",           # (user,day)-grain distinct state
    "streaming_click_purchase_join",  # stream-stream interval join
]


def build_scaled(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from aiesec_guc_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    rep = F.col("rep")

    def replicate(df, shifts: dict[str, str]):
        reps = spark.range(factor).toDF("rep")
        wide = df.crossJoin(F.broadcast(reps))
        cols = []
        for c in df.columns:
            if c in shifts:
                cols.append((F.col(c) + rep * F.expr(shifts[c])).alias(c))
            else:
                cols.append(F.col(c))
        return wide.select(*cols)

    li = load_table(spark, BASE_SF, "lineitem")
    o = load_table(spark, BASE_SF, "orders")
    e = load_table(spark, BASE_SF, "events")
    # Key shifts keep referential integrity per replica: lineitem and
    # orders shift orderkey by the same stride, so every replica is a
    # self-consistent copy with disjoint keys.
    okey_stride = str(o.agg(F.max("o_orderkey")).collect()[0][0] + 1)
    ekey_stride = str(e.agg(F.max("event_id")).collect()[0][0] + 1)
    replicate(li, {"l_orderkey": okey_stride}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    replicate(o, {"o_orderkey": okey_stride}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )
    replicate(e, {"event_id": ekey_stride}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    # documents scale with SALTED text per replica: every word gets a
    # replica suffix, so cross-replica shingles are disjoint (the
    # near-dup problem grows linearly — plain replication would make
    # every doc collide with its N copies and grow LSH buckets
    # quadratically, a different problem) while within-replica dup
    # structure is preserved exactly.
    d = load_table(spark, BASE_SF, "documents")
    dkey_stride = d.agg(F.max("doc_id")).collect()[0][0] + 1
    salted = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda w: F.concat(w, F.lit("q"), rep.cast("string")),
        ),
        " ",
    )
    d.crossJoin(F.broadcast(spark.range(factor).toDF("rep"))).select(
        (F.col("doc_id") + rep * F.lit(dkey_stride)).alias("doc_id"),
        salted.alias("text"),
        *[c for c in d.columns if c not in ("doc_id", "text")],
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    # embeddings scale by id-shift (vector values reused: ANN/PQ cost
    # is row-count-driven — train, assign, scan all touch every row)
    emb = load_table(spark, BASE_SF, "embeddings")
    vkey_stride = str(emb.agg(F.max("vec_id")).collect()[0][0] + 1)
    replicate(emb, {"vec_id": vkey_stride}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    for dim in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, BASE_SF, dim).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )


def time_query(spark, fn, sf_dir: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    probe_list = PROBE_QUERIES
    if "--streaming" in argv:
        probe_list = STREAMING_PROBE
        argv.remove("--streaming")
    if "--queries" in argv:
        i = argv.index("--queries")
        if i + 1 >= len(argv):
            print(
                "usage: scale_probe.py [N] [DIR] [--streaming] [--queries a,b]",
                file=sys.stderr,
            )
            return 2
        only = set(argv[i + 1].split(","))
        # fail loudly on typos, matching bench.py's --queries contract
        unknown = only - set(probe_list)
        if unknown:
            print(
                f"unknown probe queries: {sorted(unknown)} "
                f"(known: {sorted(probe_list)})",
                file=sys.stderr,
            )
            return 2
        del argv[i : i + 2]
    factor = int(argv[0]) if len(argv) > 0 else 10
    scratch = argv[1] if len(argv) > 1 else f"/tmp/scale_probe_x{factor}"

    from aiesec_guc_spark.queries import spark_queries
    from aiesec_guc_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # v2 marker: round-9 probes replicate documents/embeddings too —
    # a scratch built by the round-8 script (which copied them) would
    # silently measure the unscaled corpus for the dedup/ANN rows.
    # The marker also pins the REPLICATION FACTOR: the default scratch
    # path embeds it, but an explicit SCRATCH_DIR reused with a
    # different N would otherwise measure the old corpus while
    # labeling the column with the new factor.
    marker = os.path.join(scratch, "_PROBE_CORPUS_V2")
    if os.path.exists(marker):
        built = open(marker).read().strip()
        if built and built != str(factor):
            print(
                f"{scratch} holds a {built}x corpus, not {factor}x — "
                "pass a different SCRATCH_DIR or remove it first",
                file=sys.stderr,
            )
            return 2
    else:
        print(f"# building {factor}x corpus at {scratch}", file=sys.stderr)
        build_scaled(spark, scratch, factor)
        with open(marker, "w") as fh:
            fh.write(str(factor))

    qs = spark_queries()
    print(f"{'query':<34} {'sf0.1':>8} {'x' + str(factor):>8} {'ratio':>7}")
    for name in probe_list:
        if only is not None and name not in only:
            continue
        base = time_query(spark, qs[name], BASE_SF)
        scaled = time_query(spark, qs[name], scratch)
        print(f"{name:<34} {base:>7.2f}s {scaled:>7.2f}s {scaled / base:>6.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
