"""10x local scale smoke (VERDICT r11 #6): one measured data point for
the "plans you'd want at 100x" claim, instead of plan inspection alone.

Synthesizes a seeded ~10x sf0.1 corpus under a tmp dir — ~6M-row
lineitem, ~1.5M orders, ~1M events, ~50k documents (with a realistic
duplicate mix: per 10x block, one exact-duplicate copy, three
suffix-perturbed near-dup copies, six fresh-prefix copies), ~20k
embeddings — by unioning 10 deterministically perturbed copies of the
sf0.1 tables (fact keys shifted per copy so PKs stay unique; dims are
copied as-is, which is the realistic shape: facts grow, dims don't).
Then runs the current bench-tail queries once each at sf0.1 and at the
10x dir (bench.py methodology: warm run, then min of two timed runs)
and prints the runtime ratio per query.

A healthy distributed plan grows ~linearly in input size on a fixed
local[32]: ratio ~<= 12x for scan-bound shapes, somewhat more for
n-log-n sorts and superlinear-candidate dedup joins. A quadratic
blowup, single-partition collapse, or OOM reads as ratio >> RATIO_MAX
or a crash — that is what this smoke exists to catch. Measured r12
ratios are recorded in PERF.md ("10x scale smoke").

Usage: python scripts/scale_smoke.py [query ...]   (default: TAIL)
Writes the fixture to $SCALE_SMOKE_DIR or a tempdir; ~2 GB of parquet.
Run on an idle machine; ~10 min end to end.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES  # noqa: E402
from end_to_end_sales_etl_de_project_spark.session import get_spark_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10
# Key shifts keep per-copy keys disjoint (sf0.1 maxima: o_orderkey
# ~600k, event_id ~100k, doc_id 5k, vec_id 2k — shifts sit well above).
SHIFTS = {
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "event_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# The r11/r12 bench tail (BENCH_r11 top-10 slowest), spanning every
# fact table the fixture scales: events (e08), documents/dedup (c01,
# d24, m07, d11), sales facts (q70, q34, q02), embeddings (a21), plus
# d09 (minhash estimate audit).
TAIL = [
    "e08_interarrival_stats",
    "c01_curate_corpus",
    "d24_dedup_tier_attribution",
    "q70_fuzzy_name_match",
    "m07_phash_neardup",
    "d11_chunk_neardup",
    "q34_partitioned_write_readback",
    "q02_sales_team_incentive",
    "a21_ivf_recall_curve",
    "d09_minhash_estimate_audit",
]

RATIO_MAX = 25.0  # generous linear-with-margin bound; quadratic is 100x


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    def tenfold(table: str, select_copy: str) -> None:
        parts = " UNION ALL ".join(
            select_copy.format(i=i, src=f"read_parquet('{SF_DIR}/{table}.parquet')")
            for i in range(COPIES)
        )
        con.execute(f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

    # dims copied verbatim
    for dim in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{dim}.parquet')) "
            f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)"
        )

    sh = SHIFTS
    tenfold(
        "lineitem",
        "SELECT l_orderkey + {i} * " + str(sh["l_orderkey"]) + " AS l_orderkey, "
        "l_partkey, l_suppkey, l_linenumber, l_quantity, "
        # perturb prices per copy so aggregates don't degenerate to 10x
        "round(l_extendedprice * (1.0 + {i} * 0.003), 2) AS l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate + INTERVAL ({i}) HOUR AS l_shipdate FROM {src}",
    )
    tenfold(
        "orders",
        "SELECT o_orderkey + {i} * " + str(sh["o_orderkey"]) + " AS o_orderkey, "
        "o_custkey, o_orderstatus, "
        "round(o_totalprice * (1.0 + {i} * 0.003), 2) AS o_totalprice, "
        "o_orderdate + INTERVAL ({i}) HOUR AS o_orderdate, o_orderpriority "
        "FROM {src}",
    )
    tenfold(
        "events",
        "SELECT event_id + {i} * " + str(sh["event_id"]) + " AS event_id, "
        "ts + INTERVAL ({i} * 7) MINUTE AS ts, user_id, event_type, "
        "value + {i} * 0.125 AS value, props FROM {src}",
    )
    # documents: copy 0 = originals; copy 1 = EXACT duplicates (new ids);
    # copies 2-4 = near-dups (suffix-perturbed); copies 5-9 = "fresh"
    # docs (distinct prefix) — ~10% exact-dup, ~30% near-dup rate.
    tenfold(
        "documents",
        "SELECT doc_id + {i} * " + str(sh["doc_id"]) + " AS doc_id, "
        "CASE WHEN {i} <= 1 THEN text "
        "     WHEN {i} <= 4 THEN text || ' copyvariant {i} tail marker' "
        "     ELSE 'prefix block {i} distinct opener ' || text END AS text, "
        "lang, source, "
        "CAST(length(CASE WHEN {i} <= 1 THEN text "
        "     WHEN {i} <= 4 THEN text || ' copyvariant {i} tail marker' "
        "     ELSE 'prefix block {i} distinct opener ' || text END) AS BIGINT) "
        "  AS n_chars FROM {src}",
    )
    tenfold(
        "embeddings",
        "SELECT vec_id + {i} * " + str(sh["vec_id"]) + " AS vec_id, "
        "CASE WHEN {i} = 0 THEN embedding ELSE "
        "list_transform(embedding, x -> CAST(x + {i} * 0.001 AS FLOAT)) END "
        "  AS embedding, label FROM {src}",
    )


def steady_state(spark, name: str, sf_dir: str) -> float:
    def run():
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    run()  # warm: plan compile + footers + session artifacts
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    names = sys.argv[1:] or TAIL
    base = os.environ.get("SCALE_SMOKE_DIR")
    out = base or tempfile.mkdtemp(prefix="scale10x-")
    if not os.path.exists(os.path.join(out, "lineitem.parquet")):
        print(f"building 10x fixture under {out} ...", flush=True)
        t0 = time.perf_counter()
        build_fixture(out)
        print(f"fixture built in {time.perf_counter() - t0:.1f}s", flush=True)
    spark = get_spark_session(app_name="scale-smoke")
    rows = {}
    bad = []
    for name in names:
        t_small = steady_state(spark, name, SF_DIR)
        t_big = steady_state(spark, name, out)
        ratio = t_big / max(t_small, 1e-9)
        rows[name] = {
            "sf0.1_sec": round(t_small, 3),
            "x10_sec": round(t_big, 3),
            "ratio": round(ratio, 2),
        }
        print(json.dumps({name: rows[name]}), flush=True)
        if ratio > RATIO_MAX:
            bad.append(name)
    print(json.dumps({"fixture": out, "ratio_max": RATIO_MAX, "over": bad}))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
