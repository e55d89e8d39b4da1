"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes session startup (paid once), includes full execution to
a count/collect action. Each query runs twice; best-of-2 is reported so
JVM warm-up doesn't dominate at small SF.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation_month",
    "shipping_priority",
    "order_fulfillment_outer",
    "daily_event_rollup",
    "duplicate_order_groups",
    "dedup_events_keep_first",
    "stratified_sample_events",
    "word_frequency_topk",
    "cosine_knn_bruteforce",
    "exact_dup_docs_by_fingerprint",
    "profile_orders",
    "minhash_near_dup_pairs",
    "simhash_fingerprints",
    "embedding_near_dup_blocked",
    "asof_join_purchase_view",
    "user_sessionization",
    "quantity_percentiles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_lakehouse_spark.session import get_spark
    from iceberg_lakehouse_spark.suite import load_all

    spark = get_spark("bench")
    registry = load_all()

    # warm the JVM + parquet footers once, outside timing
    from iceberg_lakehouse_spark.session import load_sf_tables

    for df in load_sf_tables(spark, sf_dir).values():
        df.count()

    # provenance (VERDICT r5 #7): record host load and BOTH raw run
    # timings so noise can be adjudicated from the artifact alone —
    # parallel test shards load this host for ~10 min after finishing,
    # and a high load1 marks the number as suspect without a re-run.
    # Load GUARD (VERDICT r8 #2): r8's recorded number shipped from a
    # load-4.67 host and read as a phantom 40% regression on
    # byte-identical code. If the host is busy, wait (bounded) for it
    # to drain before timing; if it never drains, still run — the
    # driver needs its artifact — but stamp the result noisy so no one
    # compares it across rounds without re-running.
    guard_wait = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "180"))
    deadline = time.monotonic() + guard_wait
    waited = 0.0
    while os.getloadavg()[0] > 1.0 and time.monotonic() < deadline:
        time.sleep(5)
        waited += 5
    load_before = os.getloadavg()
    # load15 stamped EXPLICITLY (r11 VERDICT #3): the host is bimodal
    # and a low load1 right after a heavy run still times slow-mode —
    # load15 > 8 marks "recently heavy" even when load1 has drained.
    load_guard = {
        "status": "quiet" if load_before[0] <= 1.0 else "noisy",
        "waited_sec": round(waited, 1),
        "threshold_load1": 1.0,
        "load15_at_start": round(load_before[2], 2),
        "recently_heavy": load_before[2] > 8.0,
    }

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = registry[name]
        runs[name] = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.count()  # full execution; count avoids driver-side collect cost
            runs[name].append(round(time.perf_counter() - t0, 4))
        timings[name] = min(runs[name])

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "host_load": {
                    "before": [round(x, 2) for x in load_before],
                    "after": [round(x, 2) for x in os.getloadavg()],
                },
                "load_guard": load_guard,
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
