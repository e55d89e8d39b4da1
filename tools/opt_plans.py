"""Dump .explain("formatted") for named registry queries to plans/r15/.

    python tools/opt_plans.py before [query ...]   # plans/r15/<q>_before.txt
    python tools/opt_plans.py after  [query ...]   # plans/r15/<q>_after.txt

Default query set: the bench.py HEADLINE list.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADLINE = [
    "pricing_summary", "revenue_by_nation_month", "shipping_priority",
    "order_fulfillment_outer", "daily_event_rollup", "duplicate_order_groups",
    "dedup_events_keep_first", "stratified_sample_events",
    "word_frequency_topk", "cosine_knn_bruteforce",
    "exact_dup_docs_by_fingerprint", "profile_orders",
    "minhash_near_dup_pairs", "simhash_fingerprints",
    "embedding_near_dup_blocked", "asof_join_purchase_view",
    "user_sessionization", "quantity_percentiles",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf = "/root/testdata/sf0.1"

    from iceberg_lakehouse_spark.session import get_spark, load_sf_tables
    from iceberg_lakehouse_spark.suite import load_all

    spark = get_spark("opt_plans")
    registry = load_all()
    load_sf_tables(spark, sf)
    outdir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
