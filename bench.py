"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes session startup (paid once), includes full execution to
a count/collect action. Each query runs twice; best-of-2 is reported so
JVM warm-up doesn't dominate at small SF.

r14: every headline entry is ALSO timed against the noop sink
(``noop:<name>`` keys — guide §1.4: count() lets the optimizer prune
columns, under-timing map-only queries; the noop sink computes every
result column). The historical count-based entries and the headline
total keep their r1-r13 meaning, so cross-round comparisons stay
apples-to-apples; see OPTIMIZATION_r14.md.
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


def _cpu_snap() -> list[int]:
    """(user, nice, sys, idle, iowait, irq, softirq, steal) jiffies."""
    parts = open("/proc/stat").readline().split()
    return [int(x) for x in parts[1:9]]


def _dirty_fraction(c0: list[int], c1: list[int]) -> float:
    """Fraction of host CPU spent in system+steal between two snaps.

    The r14 host suffers intermittent memory-pressure storms (host-level
    overcommit): 40-60% of all CPUs in kernel time plus ~10% steal while
    guest loadavg stays low — the load guard cannot see them. A pass
    whose window shows high sys+steal was measured during a storm and
    says nothing about the code."""
    d = [a - b for a, b in zip(c1, c0)]
    tot = sum(d)
    return (d[2] + d[7]) / tot if tot > 0 else 0.0


def memory_touch_gbps(size_mb: int = 128) -> float:
    """First-touch bandwidth of fresh anonymous memory, in GB/s.

    During the storms above, faulting in new pages crawls (measured
    young-GC evacuations at ~0.2-0.5 GB/s vs ~8+ GB/s healthy), which
    is exactly what a Spark pass does at eden scale. A quick probe
    before timing detects the state loadavg misses.
    ``SPARK_GRAFT_FAKE_TOUCH_GBPS`` overrides for tests."""
    fake = os.environ.get("SPARK_GRAFT_FAKE_TOUCH_GBPS")
    if fake:
        return float(fake)
    import mmap

    m = mmap.mmap(-1, size_mb << 20)
    t0 = time.perf_counter()
    for off in range(0, size_mb << 20, 4096):
        m[off] = 1
    dt = time.perf_counter() - t0
    m.close()
    return (size_mb / 1024.0) / dt


def wait_for_memory_calm(
    threshold_gbps: float = 0.6,
    wait_sec: int | None = None,
    poll_sec: float = 5.0,
) -> dict:
    """Bounded wait for first-touch bandwidth to recover, mirroring
    ``wait_for_quiet_host``. Below-threshold at the deadline marks the
    run memory-pressured (headline untrusted)."""
    if wait_sec is None:
        wait_sec = int(os.environ.get("SPARK_GRAFT_MEM_WAIT_SEC", "300"))
    deadline = time.monotonic() + wait_sec
    waited = 0.0
    gbps = memory_touch_gbps()
    while gbps < threshold_gbps and time.monotonic() < deadline:
        time.sleep(poll_sec)
        waited += poll_sec
        gbps = memory_touch_gbps()
    return {
        "touch_gbps": round(gbps, 2),
        "threshold_gbps": threshold_gbps,
        "waited_sec": round(waited, 1),
        "memory_pressured": gbps < threshold_gbps,
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

    # r14 (guide §5): bound the bench session's heap. The headline
    # workload's live set is ~1 GB; the factory default 16 GB exists for
    # the 166-entry full-registry sweep, not for 18 queries. On this
    # round's memory-overcommitted host the big heap was actively
    # harmful: G1 grew the committed heap 2.3→12 GB mid-run under
    # storm-inflated GC overhead, first-touching GBs of host-cold pages
    # at ~0.2 GB/s (measured: same query 2.9s min with the 16 GB
    # default vs 1.8s min and 8/8 storm-free passes with this config,
    # interleaved A/B). The young-gen cap bounds the eden first-touch
    # stride the same way. Both are env-overridable; a real cluster
    # sizes executor heaps independently of this local-driver knob.
    bench_mem = os.environ.get("SPARK_GRAFT_BENCH_DRIVER_MEM", "6g")
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.driver.memory": bench_mem,
            "spark.driver.extraJavaOptions": (
                "-XX:+UnlockExperimentalVMOptions "
                "-XX:G1MaxNewSizePercent=25"
            ),
        },
    )
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
    # r14: loadavg is blind to host-level memory-pressure storms (sys+
    # steal convoys with load1 < 1); probe first-touch bandwidth too and
    # wait (bounded) for it to recover before timing starts.
    mem_guard = wait_for_memory_calm()
    load_guard["memory"] = mem_guard
    if mem_guard["memory_pressured"]:
        load_guard["status"] = "noisy"
        load_guard["headline_trusted"] = False
    load_before = _loadavg()
    passes = 2 if load_guard["headline_trusted"] else 3
    # a pass measured during a storm says nothing about the code: rerun
    # (bounded) while the readings disagree by >2.5x or the pass window
    # itself was storm-dirty (>15% of host CPU in sys+steal), and let
    # min() pick the cleanest observation. Raw passes + dirty fractions
    # are all recorded for adjudication.
    max_passes = int(os.environ.get("SPARK_GRAFT_MAX_PASSES", "6"))

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    dirty: dict[str, list[float]] = {}

    def _timed(label: str, build, action) -> None:
        """Adaptive best-of-N timing of ``action(build())`` under
        ``label``: rerun (bounded) while readings disagree by >2.5x or
        the pass window was storm-dirty, let min() pick the cleanest."""
        runs[label] = []
        dirty[label] = []
        while True:
            spark.sparkContext.setJobDescription(
                f"bench:{label}:pass{len(runs[label])}")
            c0 = _cpu_snap()
            t0 = time.perf_counter()
            action(build())
            runs[label].append(round(time.perf_counter() - t0, 4))
            dirty[label].append(round(_dirty_fraction(c0, _cpu_snap()), 3))
            spark.sparkContext.setJobDescription(None)
            n = len(runs[label])
            if n >= max_passes:
                break
            if n >= passes:
                unstable = (
                    min(runs[label]) > 0.2
                    and max(runs[label]) / min(runs[label]) > 2.5
                )
                last_dirty = dirty[label][-1] > 0.15
                if not unstable and not last_dirty:
                    break
        timings[label] = min(runs[label])

    for name in HEADLINE:
        q = registry[name]
        # primary metric, unchanged since r1: full execution to a
        # count action (cross-round comparable; "value" sums these).
        _timed(name, lambda: q.fn(spark, sf_dir), lambda df: df.count())
        # r14 measurement-bug companion (guide §1.4, documented in
        # OPTIMIZATION_r14.md): count() lets the optimizer prune
        # columns — for map-only queries (e.g. simhash_fingerprints,
        # whose projection count() drops entirely) it under-times the
        # real computation. The noop sink computes EVERY column of
        # every result row and discards it. Recorded as ADDED
        # "noop:<name>" entries; the historical count-based entries
        # and the headline total keep their r1-r13 meaning.
        _timed(
            f"noop:{name}",
            lambda: q.fn(spark, sf_dir),
            lambda df: df.write.format("noop").mode("overwrite").save(),
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings[n] for n in HEADLINE), 4)
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
                # r14: per-pass fraction of host CPU in sys+steal over
                # the pass window — >0.15 marks a memory-pressure-storm
                # pass whose reading should not be compared across
                # rounds (min() already skips it when any clean pass
                # exists; adjudicate stragglers from this array).
                "runs_dirty_frac": dirty,
            }
        )
    )


if __name__ == "__main__":
    main()
