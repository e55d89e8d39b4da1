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

def _loadavg() -> tuple[float, float, float]:
    """Host load triple; ``SPARK_GRAFT_FAKE_LOADAVG`` ("l1,l5,l15")
    overrides for tests — the guard's refusal behavior is pinned by a
    synthetic load15 injection, not by hoping the CI host is busy."""
    fake = os.environ.get("SPARK_GRAFT_FAKE_LOADAVG")
    if fake:
        l1, l5, l15 = (float(x) for x in fake.split(","))
        return (l1, l5, l15)
    return os.getloadavg()


def wait_for_quiet_host(
    threshold_load1: float = 1.0,
    threshold_load15: float = 3.0,
    wait_sec: int | None = None,
    poll_sec: float = 5.0,
) -> dict:
    """Bounded wait for a genuinely quiet host, then a verdict.

    r13 VERDICT #3: the r13 artifact was stamped from a load15≈7.3
    host (the old guard gated only on load1, which drains in ~1 min
    while the slow-mode effect tracks load15) and manufactured a paper
    regression on byte-identical code. Now BOTH load1 and load15 must
    drain before timing starts; if load15 never drains inside the
    bounded wait the run is stamped ``headline_trusted: false`` — the
    artifact refuses to present a recently-heavy reading as a
    cross-round-comparable headline, and main() takes extra per-query
    passes so the recorded readings bracket the noise.
    """
    if wait_sec is None:
        wait_sec = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "600"))
    deadline = time.monotonic() + wait_sec
    waited = 0.0
    load = _loadavg()
    while (
        (load[0] > threshold_load1 or load[2] > threshold_load15)
        and time.monotonic() < deadline
    ):
        time.sleep(poll_sec)
        waited += poll_sec
        load = _loadavg()
    recently_heavy = load[2] > threshold_load15
    quiet = load[0] <= threshold_load1 and not recently_heavy
    return {
        "status": "quiet" if quiet else "noisy",
        "waited_sec": round(waited, 1),
        "threshold_load1": threshold_load1,
        "threshold_load15": threshold_load15,
        "load_at_start": [round(x, 2) for x in load],
        "load15_at_start": round(load[2], 2),
        "recently_heavy": recently_heavy,
        "headline_trusted": quiet,
    }


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

    # provenance (VERDICT r5 #7): record host load and ALL raw run
    # timings so noise can be adjudicated from the artifact alone —
    # parallel test shards load this host for ~10 min after finishing.
    # Load GUARD (VERDICT r8 #2, hardened r14 per r13 VERDICT #3): wait
    # for BOTH load1 and load15 to drain; if the host never quiets, the
    # driver still gets its artifact (rc 0, one JSON line) but it is
    # stamped headline_trusted=false and each query runs an extra pass,
    # so a noisy reading can never silently become the round's number.
    load_guard = wait_for_quiet_host()
    load_before = _loadavg()
    passes = 2 if load_guard["headline_trusted"] else 3

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = registry[name]
        runs[name] = []
        for _ in range(passes):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.count()  # full execution; count avoids driver-side collect cost
            runs[name].append(round(time.perf_counter() - t0, 4))
        timings[name] = min(runs[name])

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "host_load": {
                    "before": [round(x, 2) for x in load_before],
                    "after": [round(x, 2) for x in _loadavg()],
                },
                "load_guard": load_guard,
                # headline_trusted / best_quiet (r13 VERDICT #3): a
                # value timed on a recently-heavy host is recorded
                # (the driver needs its artifact) but REFUSED as a
                # cross-round headline — best_quiet stays null and
                # readers must compare best_quiet, never value, across
                # rounds. runs[] carries every raw reading per query.
                "headline_trusted": load_guard["headline_trusted"],
                "best_quiet": (
                    total if load_guard["headline_trusted"] else None
                ),
                "passes_per_query": passes,
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
