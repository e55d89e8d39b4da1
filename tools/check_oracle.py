"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value multiset (exact comparison after
normalization). Use while iterating:

    python tools/check_oracle.py [sf_dir] [name ...]

Set ``SPARK_GRAFT_SWEEP_JSON=/path/out.json`` to also emit a
machine-readable per-entry record (VERDICT r9 #5: the sf0.1 sweep
should be an adjudicable ARTIFACT like BENCH/CORRECTNESS, not prose).
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from iceberg_lakehouse_spark.suite.quality_probes import QUALITY_PROBES  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (int,)):
        return int(v)
    # timestamps/dates/decimals → canonical string
    return str(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_norm_cell(r[i])) for i in order) for r in rows
    )


def _peak_rss_mb() -> dict:
    """Peak RSS of this python driver AND its JVM child (VmHWM — the
    kernel's high-water mark, i.e. true peaks, not a sample), for the
    sweep artifact's memory note (r9 #5's unfinished half). The JVM is
    where the executors live in local mode, so its HWM is the number
    that decides whether a sweep fits the box."""
    def hwm(pid):
        try:
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmHWM:"):
                        return round(int(line.split()[1]) / 1024)
        except OSError:
            return None
        return None

    out = {"python_peak_rss_mb": hwm("self")}
    jvm_peaks = []
    try:
        with open("/proc/self/task/%d/children" % os.getpid()) as fh:
            kids = fh.read().split()
    except OSError:
        kids = []
    for pid in kids:
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode(errors="replace")
        except OSError:
            continue
        if "java" in cmd:
            peak = hwm(pid)
            if peak is not None:
                jvm_peaks.append(peak)
    out["jvm_peak_rss_mb"] = max(jvm_peaks) if jvm_peaks else None
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    # BARE session on purpose — replicating the driver, which does NOT
    # use our session factory. Round-1 lesson: every query passed with
    # get_spark()'s confs and all 50 failed on the driver's session;
    # the replica must fail exactly where the driver would.
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    )
    # sf0.1 full-sweep knob (r9): the default-heap bare session holds
    # ~50 queries of accumulated JVM state before a spill-heavy query
    # tips it over at sf0.1. The driver grades at sf0.01 where the
    # bare default is fine — so the bump is OPT-IN and the default
    # stays driver-identical.
    mem = os.environ.get("SPARK_GRAFT_ORACLE_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures, n_checked = [], 0
    records: dict[str, dict] = {}
    # load provenance (r13 VERDICT #6): the sweep wall is bimodal with
    # host state exactly like bench — stamp the same load_guard block
    # bench.py records, read at sweep START (no wait: a sweep's wall is
    # provenance, not a headline, so we label rather than delay).
    from bench import wait_for_quiet_host

    load_guard = wait_for_quiet_host(wait_sec=0)
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # long-session hygiene: a query that leaked a cached relation
        # must not charge its memory to every query after it (this
        # also covers the rows-only and error early-continues below)
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"  {name:38s} SPARK-ERR {e}")
            records[name] = {"status": "spark_error", "err": str(e)[:300],
                             "sec": round(time.time() - t0, 2)}
            continue
        if name not in oracles:
            rec = {"status": "rows_only", "rows": len(srows),
                   "sec": round(time.time() - t0, 2)}
            # r13 (r12 VERDICT #2): rows-only entries carry a MEASURED
            # quality number + floor so ANN recall / sampling drift is
            # visible to the driver loop, not just "ran"
            probe = QUALITY_PROBES.get(name)
            qnote = ""
            if probe:
                try:
                    q = probe(con, sf_dir, scols, srows)
                except Exception as e:  # noqa: BLE001
                    q = {"ok": False, "err": str(e)[:200]}
                rec["quality"] = q
                qnote = (f"  {q.get('metric', 'probe')}="
                         f"{q.get('value', '?')} floor={q.get('floor')}")
                if not q.get("ok"):
                    failures.append((name, f"QUALITY: {q}"))
                    rec["status"] = "quality_fail"
            print(f"  {name:38s} {'rows-only' if rec['status'] == 'rows_only' else 'Q-FAIL   '}"
                  f"  {len(srows):>7} rows  {time.time()-t0:5.1f}s{qnote}")
            records[name] = rec
            continue
        n_checked += 1
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"  {name:38s} ORACLE-ERR {e}")
            records[name] = {"status": "oracle_error", "err": str(e)[:300],
                             "sec": round(time.time() - t0, 2)}
            continue
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not status and _rows_to_multiset(scols, srows) != _rows_to_multiset(
            ocols, orows
        ):
            sm, om = _rows_to_multiset(scols, srows), _rows_to_multiset(ocols, orows)
            diff = next(
                (i for i, (a, b) in enumerate(zip(sm, om)) if a != b), None
            )
            detail = f" first-diff@{diff}: {sm[diff]} vs {om[diff]}" if diff is not None else ""
            status.append("value-hash" + detail)
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name:38s} FAIL {'; '.join(status)[:220]}")
            records[name] = {"status": "fail", "rows": len(srows),
                             "err": "; ".join(status)[:300],
                             "sec": round(time.time() - t0, 2)}
        else:
            print(f"  {name:38s} OK   {len(srows):>7} rows  {time.time()-t0:5.1f}s")
            records[name] = {"status": "ok", "rows": len(srows),
                             "sec": round(time.time() - t0, 2)}

    out_json = os.environ.get("SPARK_GRAFT_SWEEP_JSON")
    if out_json:
        import json as _json
        from datetime import datetime, timezone

        payload = {
            "sf_dir": sf_dir,
            "load_guard": load_guard,
            "started_at": datetime.fromtimestamp(
                t_start, timezone.utc).isoformat(),
            "wall_sec": round(time.time() - t_start, 1),
            "driver_mem": mem,
            "n_entries": len(records),
            "n_oracle_checked": n_checked,
            "n_failures": len(failures),
            **_peak_rss_mb(),
            "entries": records,
        }
        with open(out_json, "w") as fh:
            _json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"sweep record -> {out_json}")

    print(f"\n{n_checked} oracle-checked, {len(failures)} failures")
    for name, why in failures:
        print(f"  FAIL {name}: {why[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
