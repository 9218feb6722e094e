"""Normalization family (SURVEY §2.7, N-series).

Fit/transform split mirrors the reference's FeatureNormalizer
(app/services/preprocessing/normalizer.py): fit produces a tiny params
relation (one row of scalars per feature), transform applies closed-form
expressions.  At scale the params frame is broadcast — the analog of a
broadcast-hash-join build side — so apply is shuffle-free.

Semantics pinned from the reference:
  minmax : (x - min) / (max - min), zero-range → 0.0   (normalizer.py:176-207)
  zscore : (x - mean) / population_std  (ddof=0, normalizer.py:150-160)
  robust : (x - median) / (q75 - q25), exact percentiles (normalizer.py:162-174)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_params(df: DataFrame, cols: list[str]) -> DataFrame:
    """N1/N2/N3 — one-pass global aggregate of every statistic each
    method needs, for all columns at once."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_pop(c).alias(f"{c}__std"),
            F.expr(f"percentile({c}, 0.25)").alias(f"{c}__q25"),
            F.expr(f"percentile({c}, 0.5)").alias(f"{c}__median"),
            F.expr(f"percentile({c}, 0.75)").alias(f"{c}__q75"),
        ]
    return df.agg(*aggs)


def apply_normalization(
    df: DataFrame, params: DataFrame, cols: list[str], method: str = "minmax"
) -> DataFrame:
    """N4 — apply fitted params; broadcast the 1-row params frame."""
    out = df.crossJoin(F.broadcast(params))
    for c in cols:
        if method == "minmax":
            rng = F.col(f"{c}__max") - F.col(f"{c}__min")
            expr = F.when(rng != 0, (F.col(c) - F.col(f"{c}__min")) / rng).otherwise(
                0.0
            )
        elif method == "zscore":
            sd = F.col(f"{c}__std")
            expr = F.when(sd != 0, (F.col(c) - F.col(f"{c}__mean")) / sd).otherwise(0.0)
        elif method == "robust":
            iqr = F.col(f"{c}__q75") - F.col(f"{c}__q25")
            expr = F.when(iqr != 0, (F.col(c) - F.col(f"{c}__median")) / iqr).otherwise(
                0.0
            )
        else:
            raise ValueError(f"unknown method {method!r}")
        out = out.withColumn(f"{c}_normalized", expr)
    return out.drop(*[c for c in out.columns if "__" in c])


def save_params(params: DataFrame, path: str) -> None:
    """N6 — persist fit parameters as JSON for inference reuse
    (normalizer.py:289-342; the fit_on_data=False path).  The params
    relation is one row of scalars — the broadcast build side of every
    later apply."""
    params.coalesce(1).write.mode("overwrite").json(path)


def load_params(spark, path: str) -> DataFrame:
    """N6 — reload persisted fit parameters (Model.load analog)."""
    return spark.read.json(path)


def validate_normalization(
    df: DataFrame, cols: list[str], method: str = "minmax", tol: float = 0.1
) -> DataFrame:
    """N7 — self-check aggregates (normalizer.py:399-443): minmax
    output within [0,1]±1e-6; zscore mean≈0 and std≈1 within `tol`;
    everything finite.  Returns one row per column with pass flags."""
    checks = []
    for c in cols:
        n = F.col(f"{c}_normalized")
        finite = F.count_if(F.isnan(n) | n.isNull()) == 0
        if method == "minmax":
            ok = (F.min(n) >= -1e-6) & (F.max(n) <= 1.0 + 1e-6)
        elif method == "zscore":
            ok = (F.abs(F.avg(n)) <= tol) & (
                F.abs(F.stddev_pop(n) - 1.0) <= tol
            )
        else:  # robust: median≈0
            ok = F.abs(F.expr(f"percentile({c}_normalized, 0.5)")) <= tol
        checks += [
            ok.alias(f"{c}_ok"),
            finite.alias(f"{c}_finite"),
        ]
    return df.agg(*checks)


def denormalize(
    df: DataFrame, params: DataFrame, cols: list[str], method: str = "minmax"
) -> DataFrame:
    """N5 — inverse transforms (normalizer.py:209-234)."""
    out = df.crossJoin(F.broadcast(params))
    for c in cols:
        norm = F.col(f"{c}_normalized")
        if method == "minmax":
            expr = norm * (F.col(f"{c}__max") - F.col(f"{c}__min")) + F.col(f"{c}__min")
        elif method == "zscore":
            expr = norm * F.col(f"{c}__std") + F.col(f"{c}__mean")
        elif method == "robust":
            expr = norm * (F.col(f"{c}__q75") - F.col(f"{c}__q25")) + F.col(
                f"{c}__median"
            )
        else:
            raise ValueError(f"unknown method {method!r}")
        out = out.withColumn(f"{c}_denorm", expr)
    return out.drop(*[c for c in out.columns if "__" in c])
