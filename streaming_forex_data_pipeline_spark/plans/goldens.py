"""Golden-parquet oracle plumbing, shared by every seeded-model face.

Some registered queries are deterministic spark.ml pipelines whose
FITS DuckDB cannot replay in closed form (k-means, MinHashLSH, the
rf/lasso/rfe importance tiers) — but whose OUTPUTS are pure functions
of (data, seed) once the fit layout is pinned.  For those, the
driver-visible oracle is a pinned golden: one parquet per query under
``tests/goldens/`` holding the exact expected rows for each testdata
scale, keyed by a CONTENT fingerprint of the source table the query
derives from, computed with DuckDB exactly as the oracle SQL's WHERE
clause recomputes it.  An unknown corpus raises a self-explanatory
DuckDB ``error()`` instead of silently matching zero rows.

THE single definition of each key expression lives here: the oracle
WHERE clauses, the regen scripts (``tests/goldens/regen_*.py``) and
the pytest freshness gates all import these functions — hand-typed
copies could silently drift, desynchronizing the key so fresh goldens
fail as 'no slice' (review-found, round 12).
"""

from __future__ import annotations

from pathlib import Path

GOLDEN_DIR = str(Path(__file__).resolve().parents[2] / "tests" / "goldens")


def corpus_md5_sql(from_target: str = "documents") -> str:
    """DuckDB-computable documents-content fingerprint — md5 is
    engine- and version-portable, unlike DuckDB's hash()."""
    return (
        "SELECT md5(string_agg(md5(coalesce(text, '')), '' "
        f"ORDER BY doc_id)) AS f FROM {from_target}"
    )


def events_md5_sql(from_target: str = "events") -> str:
    """Events-content fingerprint for goldens derived from the events
    table (the candle-matrix spark.ml importance tiers): md5 of the
    event_id-ordered per-row md5s over every column.  Content-keyed
    like corpus_md5_sql — a same-shape edit to any cell changes the
    key (sf0.001 and sf0.01 documents share ROW COUNTS but not
    content; row-count keys are blind, round-12 memory)."""
    return (
        "SELECT md5(string_agg(md5(concat_ws('|', event_id, ts, "
        "user_id, event_type, value, props)), '' ORDER BY event_id)) "
        f"AS f FROM {from_target}"
    )


def golden_oracle(
    name: str,
    select: str,
    order: str,
    key_sql: str | None = None,
    regen: str = "tests/goldens/regen_ml_tiers.py",
) -> str:
    """Golden-slice oracle with the fail-fast guard: select the rows
    whose ``corpus_md5`` matches the live content fingerprint
    (``key_sql``, default the documents key), raising a
    self-explanatory error when NO golden slice exists for this
    corpus (rather than matching zero rows and reporting a baffling
    count mismatch)."""
    key = key_sql or corpus_md5_sql()
    golden = f"read_parquet('{GOLDEN_DIR}/{name}.parquet')"
    return f"""
SELECT {select}
FROM {golden}
WHERE corpus_md5 = (
  SELECT CASE WHEN f IN (SELECT DISTINCT corpus_md5 FROM {golden}) THEN f
         ELSE error('{name}: no golden slice for this corpus (content '
                    || 'md5 ' || f
                    || ') -- run {regen}') END
  FROM ({key}))
ORDER BY {order}
"""
