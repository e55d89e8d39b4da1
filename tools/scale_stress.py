"""Scale-stress harness (round 10): drive the HEAVY dedup/similarity
operators at ~10× the bench scale by deterministic self-replication of
the sf0.1 tables (each document repeated with distinct ids and a
per-replica token tweak — mass near-duplication on purpose, which is
the adversarial shape for every banded/blocked operator: hot LSH
buckets, saturated gram stats, dense Hamming neighborhoods).

    python tools/scale_stress.py [sf_dir] [factor]
    SPARK_GRAFT_STRESS_JSON=/path/out.json  → machine-readable record

Each operator is timed and sanity-checked (row counts where the
planted structure predicts them); the point is not speed but SURVIVAL
with the right plan — the size-gated paths must keep candidate
generation linear when 10 replicas of every document share every
band key. Complements bench.py (fixed 18-query suite, cross-round
comparable) and the sf0.1 oracle sweep (value exactness): this one
answers "what happens at the NEXT order of magnitude".
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_stress")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_STRESS_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from iceberg_lakehouse_spark.functions import dedup_text as dt
    from iceberg_lakehouse_spark.functions import similarity as sim
    from iceberg_lakehouse_spark.session import load_sf_tables

    tables = load_sf_tables(spark, sf_dir)
    docs0 = tables["documents"].select("doc_id", "text")
    emb0 = tables["embeddings"].select("vec_id", "embedding", "label")
    n0 = docs0.count()

    # replicate: replica r gets ids shifted by r*1e6 and one token
    # appended (near-dup, not byte-dup — exact-dedup would erase the
    # stress before the banded operators see it)
    reps = spark.range(factor).select(F.col("id").alias("_r"))
    docs = (
        docs0.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_r") * 1_000_000).alias("doc_id"),
            F.when(F.col("_r") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text",
                                   F.concat(F.lit("rep"),
                                            F.col("_r"))))
            .alias("text"),
        )
        .repartition(64)
        .persist()
    )
    emb = (
        emb0.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("_r") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x * (1.0 + F.col("_r").cast("double") * 1e-4),
            ).alias("embedding"),
            "label",
        )
        .repartition(64)
        .persist()
    )
    n_docs, n_emb = docs.count(), emb.count()
    print(f"stress corpus: {n_docs} docs, {n_emb} vectors "
          f"({factor}x {sf_dir})")
    # load provenance (r13 VERDICT #6): same load_guard block bench.py
    # stamps, read at start, no wait — a stress wall is provenance.
    from bench import wait_for_quiet_host

    record = {"sf_dir": sf_dir, "factor": factor,
              "n_docs": n_docs, "n_emb": n_emb,
              "load_guard": wait_for_quiet_host(wait_sec=0), "ops": {}}

    def run(name, fn, check=None):
        t0 = time.time()
        try:
            out = fn()
            sec = round(time.time() - t0, 1)
            ok, note = (True, "") if check is None else check(out)
            record["ops"][name] = {
                "status": "ok" if ok else "check_failed",
                "sec": sec, "result": out, "note": note,
            }
            print(f"  {name:34s} {'OK  ' if ok else 'FAIL'} "
                  f"{sec:7.1f}s  {out} {note}")
        except Exception as e:  # noqa: BLE001 — record, keep stressing
            record["ops"][name] = {
                "status": "error", "sec": round(time.time() - t0, 1),
                "err": str(e)[:300],
            }
            print(f"  {name:34s} ERR  {str(e)[:160]}")

    # every replica family shares every band key → hot buckets; the
    # size gates must hold candidate growth to the planted pairs
    run(
        "minhash_lsh_pairs",
        lambda: dt.lsh_candidate_pairs(
            dt.minhash_signatures(docs, "doc_id", "text"),
            "doc_id").count(),
        lambda n: (n >= n0 * (factor * (factor - 1)) // 2,
                   f"expect >= {n0 * (factor * (factor - 1)) // 2} planted"),
    )
    run(
        "minhash_verified_pairs",
        lambda: dt.minhash_dedup(docs, "doc_id", "text",
                                 threshold=0.8).count(),
        lambda n: (n >= n0 * (factor * (factor - 1)) // 2,
                   f"expect >= {n0 * (factor * (factor - 1)) // 2} "
                   "verified planted pairs"),
    )
    run(
        "simhash_hamming_pairs",
        lambda: dt.simhash_hamming_pairs(
            dt.simhash64(docs, "doc_id", "text")
            .select("doc_id", "simhash"),
            "doc_id", max_distance=3, fp_len=64).count(),
    )
    run(
        "span_dedup_tokens_removed",
        lambda: int(dt.span_dedup(docs, "doc_id", "text")
                    .agg(F.sum("removed_tokens")).first()[0]),
        lambda n: (n > 0, "replica spans must be cut"),
    )
    # r11: the exact-verify budget under mass near-duplication — the
    # evidence aggregate absorbs the quadratic candidate blowup and
    # the verify stays EXACTLY max_pairs wide (broadcast map-side)
    run(
        "ngram_topk_budget_verify",
        lambda: dt.jaccard_pairs(
            docs,
            dt.shingle_candidate_pairs(
                docs, "doc_id", "text", n=3, max_df=64,
                max_pairs=50_000),
            "doc_id", "text", n=3, broadcast_pairs=True).count(),
        lambda n: (n == 50_000,
                   "verify width must equal the 50k budget"),
    )
    # r12: the perceptual pair budget under mass image duplication —
    # replica ids land in the same 50 dHash groups, so within-group
    # pairs grow quadratically (and past the bucket gate at 20× the
    # star-edge path engages); the evidence-ranked budget must hold
    # the output at exactly max_pairs with the loud flag set
    def _media_budget():
        from iceberg_lakehouse_spark.functions import (
            multimodal as mmod,
        )
        from iceberg_lakehouse_spark.suite.training import (
            _synthesize_media,
        )

        out = mmod.media_near_dup_pairs(
            _synthesize_media(docs.select("doc_id")),
            max_distance=4, max_pairs=50_000)
        flags = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pair_truncated").alias("f")).first()
        return {"rows": int(flags["n"]),
                "truncated": bool(flags["f"])}

    run(
        "media_pair_budget",
        _media_budget,
        lambda d: (
            d["rows"] <= 50_000
            and (not d["truncated"] or d["rows"] == 50_000),
            "never more than the 50k budget; a set flag means the "
            "full width (exactly-50k untruncated is the legal "
            "boundary case)",
        ),
    )
    run(
        "connected_components_clusters",
        lambda: dt.dedup_corpus(docs, "doc_id", "text",
                                threshold=0.8).count(),
        lambda n: (n0 * 0.9 <= n <= n0 * 1.5,
                   f"expect ~{n0} cluster keepers"),
    )
    # r13 (r12 VERDICT #1): the former stress-wall dominator. The
    # ungated blocked verify was quadratic in block size (4k-vector
    # label blocks at 20× → 160M pair evaluations, 449s); the gated
    # operator size-gates blocks and refines overflow through seeded
    # sign-sketch sub-buckets, so the SAME planted structure (every
    # replica family shares a direction → a sub-bucket) is recovered
    # pair-for-pair with bounded work and a join-free plan.
    ne0 = emb0.count()
    run(
        "embedding_blocked_near_dups",
        lambda: sim.gated_cosine_near_dup_pairs(
            emb, "vec_id", "embedding", block_col="label",
            threshold=0.999, max_block=1024).count(),
        lambda n: (n >= ne0 * (factor * (factor - 1)) // 2,
                   f"expect >= {ne0 * (factor * (factor - 1)) // 2} "
                   "planted replica pairs (scaled copies keep "
                   "cosine 1.0 and identical sign sketches)"),
    )
    docs.unpersist()
    emb.unpersist()

    out_json = os.environ.get("SPARK_GRAFT_STRESS_JSON")
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
        print(f"stress record -> {out_json}")
    bad = [k for k, v in record["ops"].items() if v["status"] != "ok"]
    print(f"{len(record['ops'])} ops, {len(bad)} not ok {bad or ''}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
