"""Reproducer harness for the intermittent c-family parity flake.

Signature (round 8, 2 of 6 full-suite runs): c01_curate_corpus — and in
the second occurrence ALSO c02/c03/c04/c06, i.e. every consumer of the
session curation-decision artifact plus the live c01 chain — fail the
oracle hash-compare ONLY inside a full `pytest tests/` run; every
isolated re-run, the full 229-test oracle-parity module alone, the
bench, and the 50-query driver gate are green. d03/d06/t06 (which share
the shingle index, the component resolution, and corpus_split) passed
in the failing runs, so the corruption is narrower than any shared
operator.

This script loops the suspected interaction: build the session
artifacts, run the null-parity sweep queries (they precede the parity
module in suite order and exercise the same entry points over a second
sf_dir), then hash-compare the c-family against DuckDB — dumping FULL
mismatch rows on the first divergence instead of a tail-truncated
assert. Run overnight / in a spare round slot:

    python scripts/flake_hunt_c01.py [n_iterations]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main(iters: int = 50) -> int:
    import __spark_entry__ as E
    from end_to_end_sales_etl_de_project_spark.session import get_spark_session
    from end_to_end_sales_etl_de_project_spark.testing import (
        compare_spark_to_oracle,
        duckdb_connection,
        run_oracle,
    )

    spark = get_spark_session(master="local[32]")
    sf = "/root/testdata/sf0.001"
    con = duckdb_connection(sf)
    fam = [
        "c01_curate_corpus",
        "c02_training_manifest",
        "c03_dataset_mix",
        "c04_policy_diff",
        "c06_dedup_impact",
    ]
    # suite-order mimics: artifact churn over a SECOND sf_dir (the
    # null-parity sweeps precede the parity module) plus storage
    # pressure from corpus-heavy queries between family checks
    churn = [
        "d03_minhash_lsh",
        "d06_neardup_resolve",
        "t09_tfidf_top_terms",
        "c08_decontamination_agreement",
        "t34_char_entropy",
        "d17_substring_dedup",
    ]
    sf2 = "/root/testdata/sf0.01"
    for i in range(iters):
        for name in churn:
            E.queries()[name](spark, sf2).write.format("noop").mode(
                "overwrite"
            ).save()
        for name in fam:
            spark_df = E.queries()[name](spark, sf)
            r = compare_spark_to_oracle(
                name, spark_df, run_oracle(con, E.oracle_sql()[name])
            )
            if not r.match:
                print(f"REPRODUCED iter={i} {name}: {r.mismatches}")
                spark_df.orderBy(spark_df.columns[0]).show(600, truncate=False)
                return 1
        print(f"iter {i}: family green")
    print("no reproduction")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 50))
