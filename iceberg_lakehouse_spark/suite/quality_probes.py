"""Quality probes for the rows-only registry entries (r12 VERDICT #2).

Six entries are legitimately non-hashable (k-means floats, engine
RNG), so the driver's value gate records only "rows_only, ran" for
them — which made ANN recall drift invisible to the round loop. Each
probe here computes a MEASURED quality number for one such entry from
its already-collected Spark result plus a DuckDB ground truth over the
same parquet tables, and asserts a floor: `tools/check_oracle.py`
records the probe output as a per-entry ``quality`` field in the sweep
artifact and counts a floor violation as a FAILURE.

Every probed entry is deterministic GIVEN the data (md5-seeded k-means
inits, fixed sample seed), so the measured numbers are stable per
scale factor and the floors sit comfortably below the observed values
— they catch regressions, not noise.

Probe signature: ``probe(con, sf_dir, scols, srows) -> dict`` with at
least ``metric``, ``value``, ``floor``, ``ok``. ``con`` is the DuckDB
connection with the standard table views registered.
"""

from __future__ import annotations

from typing import Callable

# ground truth for every ANN entry: all four query with the embedding
# of the MIN vec_id and return cosine top-10 (desc rounded sim, asc id
# — the same ordering the Spark probes use)
_ANN_TRUTH_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 1
)
SELECT vec_id FROM embeddings, q
ORDER BY ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6)
         DESC, vec_id
LIMIT 10
"""


def _ann_recall(floor: float) -> Callable:
    def probe(con, sf_dir, scols, srows) -> dict:
        truth = {r[0] for r in con.execute(_ANN_TRUTH_SQL).fetchall()}
        id_idx = next(
            (i for i, c in enumerate(scols) if c in ("vec_id", "id")), 0
        )
        got = {r[id_idx] for r in srows}
        recall = len(got & truth) / max(len(truth), 1)
        return {
            "metric": "recall_at_10",
            "value": round(recall, 4),
            "floor": floor,
            "ok": recall >= floor,
        }

    return probe


def _exemplar_coverage(con, sf_dir, scols, srows) -> dict:
    """diverse_exemplar_sample: the per-cell populations must tile the
    corpus exactly (every vector assigned to exactly one cell) and the
    exemplars must be distinct vectors."""
    total = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    n_idx = scols.index("n_covered")
    id_idx = scols.index("vec_id")
    covered = sum(r[n_idx] for r in srows)
    ids = [r[id_idx] for r in srows]
    ratio = covered / max(total, 1)
    ok = abs(ratio - 1.0) < 1e-9 and len(set(ids)) == len(ids)
    return {
        "metric": "coverage_ratio",
        "value": round(ratio, 6),
        "floor": 1.0,
        "ok": ok,
    }


def _bernoulli_rate(con, sf_dir, scols, srows) -> dict:
    """random_sample_bernoulli: fraction=0.05 over lineitem — the
    realized rate must sit inside a generous band around the nominal
    fraction (±40% relative, far beyond sampling noise at every graded
    SF, tight enough to catch a misread fraction or a broken seed
    path)."""
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    rate = len(srows) / max(total, 1)
    ok = 0.03 <= rate <= 0.07
    return {
        "metric": "sample_rate",
        "value": round(rate, 5),
        "floor": 0.03,
        "ceiling": 0.07,
        "ok": ok,
    }


# floors: measured r13 — recall@10 is 0.6/0.6/0.8/0.8 at sf0.01 and
# 0.5-0.6/0.6/0.5/0.5 at sf0.1 for ivf/persisted/pq/ivfpq (the graded
# entries probe 3-4 of 8 one-iteration cells and re-rank bounded
# candidate sets; the sharper contracts live in their pytest files at
# fixture geometry). Floors sit a full band below the cross-SF minimum
# so only real drift (a broken probe path, a collapsed index) trips
# them — the RECORDED value is what the round loop watches.
QUALITY_PROBES: dict[str, Callable] = {
    # floors raised 0.4 → 0.5 in r14 with the measured-recall retune
    # (nprobe 6/8, refine_factor 64): observed values are now 0.8–1.0
    # at both graded SFs, so 0.5 still catches regressions, not noise
    "ann_ivf_topk": _ann_recall(0.5),
    "ann_index_persisted_topk": _ann_recall(0.5),
    "pq_ann_refined_topk": _ann_recall(0.5),
    "ivfpq_ann_refined_topk": _ann_recall(0.5),
    "diverse_exemplar_sample": _exemplar_coverage,
    "random_sample_bernoulli": _bernoulli_rate,
}
