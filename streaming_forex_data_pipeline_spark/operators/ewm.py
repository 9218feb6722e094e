"""Exact pandas-``ewm(span=N, adjust=True)`` kernels (W2 EMA family).

The EMA recurrence is sequential in event time, so it is not expressible
as a plain Spark window aggregate without numerically unstable
renormalization tricks.  Per SURVEY §2.13 the sanctioned escape is a
grouped, Arrow-batched pandas kernel: ``groupBy(symbol).applyInPandas``
calling ``Series.ewm`` — bit-for-bit pandas parity, one shuffle on the
symbol key, and symbols are the parallel axis at scale (each group is an
independent task; no cross-group state).

Scale note: a single symbol's history must fit in one task's memory.
At 100 TB with per-symbol histories beyond memory, the same kernels run
over coarser re-partitions (e.g. symbol × year with warm-up overlap);
the warm-up length for span N to reach <1e-9 relative error is
~40·N rows, so a 10k-row overlap makes chunked EMA exact in practice.

Reference semantics: app/services/preprocessing/feature_engineer.py
:105-113 (EMA), :115-135 (RSI via EMA of gains/losses), :137-161 (MACD),
:189-204 (ATR via EMA of true range).  All use pandas defaults
``adjust=True, ignore_na=False``; the RSI gain/loss split maps the
leading NaN diff to 0 via ``Series.where``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def _grouped(
    df: DataFrame,
    in_cols: Sequence[str],
    out_cols: Sequence[str],
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """Run ``kernel`` per symbol over the minimal column set.

    Projects to ``in_cols`` before the shuffle so the Arrow transfer
    carries only what the kernel reads; output schema is (symbol, ts,
    *out_cols double).
    """
    narrow = df.select(symbol, ts, *in_cols)
    schema = StructType(
        [narrow.schema[symbol], narrow.schema[ts]]
        + [StructField(c, DoubleType()) for c in out_cols]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        out = kernel(pdf)
        return out[[symbol, ts, *out_cols]]

    return narrow.groupBy(symbol).applyInPandas(run, schema)


def ema(
    df: DataFrame,
    spans: Sequence[int],
    src: str = "close",
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W2 — EMA(span) columns ``ema_<span>`` with adjust=True parity
    (feature_engineer.py:105-113)."""
    out_cols = [f"ema_{s}" for s in spans]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        for s in spans:
            pdf[f"ema_{s}"] = pdf[src].ewm(span=s, adjust=True).mean()
        return pdf

    return _grouped(df, [src], out_cols, kernel, symbol, ts)


def rsi_components(
    df: DataFrame,
    period: int = 14,
    src: str = "close",
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W3 — EMA-smoothed avg gain/loss columns (feature_engineer.py
    :115-135).  The final ``rsi = 100·ag/(ag+al)`` is left to Column
    algebra so the zero-denominator row maps to NULL identically on the
    Spark and DuckDB sides (pandas yields NaN from 0/0 there)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        d = pdf[src].diff()
        gains = d.where(d > 0, 0.0)  # leading NaN -> 0, like the reference
        losses = -d.where(d < 0, 0.0)
        pdf["avg_gain"] = gains.ewm(span=period, adjust=True).mean()
        pdf["avg_loss"] = losses.ewm(span=period, adjust=True).mean()
        return pdf

    return _grouped(df, [src], ["avg_gain", "avg_loss"], kernel, symbol, ts)


def macd(
    df: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    src: str = "close",
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W4 — MACD line, signal line, histogram
    (feature_engineer.py:137-161)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ema_fast = pdf[src].ewm(span=fast, adjust=True).mean()
        ema_slow = pdf[src].ewm(span=slow, adjust=True).mean()
        pdf["macd"] = ema_fast - ema_slow
        pdf["macd_signal"] = pdf["macd"].ewm(span=signal, adjust=True).mean()
        pdf["macd_histogram"] = pdf["macd"] - pdf["macd_signal"]
        return pdf

    return _grouped(
        df, [src], ["macd", "macd_signal", "macd_histogram"], kernel, symbol, ts
    )


def atr_ema(
    df: DataFrame,
    period: int = 14,
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W6 canonical variant — ATR as EMA(span) of the true range
    (feature_engineer.py:189-204).  First row's TR degrades to high-low
    because pandas row-wise max skips the NaN shifted terms."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        prev_close = pdf["close"].shift(1)
        tr = pd.concat(
            [
                pdf["high"] - pdf["low"],
                (pdf["high"] - prev_close).abs(),
                (pdf["low"] - prev_close).abs(),
            ],
            axis=1,
        ).max(axis=1)
        pdf[f"atr_{period}"] = tr.ewm(span=period, adjust=True).mean()
        return pdf

    return _grouped(
        df, ["high", "low", "close"], [f"atr_{period}"], kernel, symbol, ts
    )


#: truncation frame per span for the JVM-side EMA tier: M chosen so the
#: dropped adjust=True tail weight (1-alpha)^M < ~5e-14 — three orders
#: below the queries' 1e-6 output rounding grain at price scale, so the
#: truncated weighted mean is indistinguishable from the exact kernel
#: after round(,6) (span 5: (2/3)^75 ~ 6e-14; 9: (4/5)^140 ~ 3e-14;
#: 12: (11/13)^180 ~ 9e-14; 14: (13/15)^210 ~ 9e-14;
#: 26: (25/27)^400 ~ 4e-14)
EMA_NATIVE_FRAMES = {5: 75, 9: 140, 12: 180, 14: 210, 26: 400}


def ema_native(
    df: DataFrame,
    spans: Sequence[int] = (5, 12, 26),
    col: str = "close",
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W2 EMA, JVM-side tier (round-10 verdict Next #8): pandas
    ``ewm(span=N, adjust=True)`` is the weighted mean
    sum((1-a)^i · x_{t-i}) / sum((1-a)^i) — for bounded spans the tail
    weights vanish below the output rounding grain within
    ``EMA_NATIVE_FRAMES[span]`` rows, so a TRUNCATED rendering is a
    Horner fold over a fixed-length trailing frame: numerator
    fold(acc·r + x) and denominator fold(acc·r + 1) over
    collect_list(col) in frame order.  Everything stays in the JVM
    (window + higher-order aggregate, no Python workers, no Arrow
    transfer).  Measured honestly (r12, tools/bench_native_tiers.py,
    16x-symbol soak): this tier is 0.2-0.5x the pandas kernel's
    throughput at every scale — the fold is O(rows x frame) work vs
    the kernel's O(rows), and no scale-up changes that ratio.  Its
    value is OPERATIONAL: exact indicator parity on deployments with
    no Python on the executors; the applyInPandas kernel is the
    production-throughput default.  Early rows
    (rn <= M) carry the FULL history, i.e. the exact adjust=True
    value; later rows differ from the kernel by < 1e-11 absolute at
    price scale (tolerance-pinned in tests/test_operators.py).

    The fold is left-to-right with init 0.0 — the registered oracle
    replays the identical op sequence via list_reduce(list_prepend(
    0.0, xs), ...), so the query is hash-EXACT against DuckDB even
    though it is tolerance-tiered against the pandas kernel."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(symbol).orderBy(ts)
    # materialize the frame lists in their own projection: higher-order
    # folds get no subexpression elimination, and folding directly over
    # the window expression would re-collect the list per fold
    frames = df.select(
        symbol,
        ts,
        *[
            F.collect_list(col)
            .over(w.rowsBetween(-(EMA_NATIVE_FRAMES[s] - 1), 0))
            .alias(f"__xs_{s}")
            for s in spans
        ],
    )
    return frames.select(
        F.col(symbol),
        F.col(ts),
        *[_horner_ema(f"__xs_{s}", s).alias(f"ema_{s}") for s in spans],
    )


def _horner_ema(xs_col: str, span: int):
    """The truncated adjust=True EMA as two left folds over an
    already-materialized frame-list column: numerator fold(acc·r + x),
    denominator fold(acc·r + 1), both with init 0.0 — the exact op
    sequence the oracles replay with list_reduce(list_prepend(0.0,
    xs), ...).  r is bound via closure, not a lambda default: PySpark
    reads the lambda's parameter count as the higher-order arity."""
    from pyspark.sql import functions as F

    r = F.lit(1.0 - 2.0 / (span + 1.0))
    xs = F.col(xs_col)
    num = F.aggregate(xs, F.lit(0.0), lambda a, x: a * r + x)
    den = F.aggregate(xs, F.lit(0.0), lambda a, x: a * r + F.lit(1.0))
    return num / den


def macd_native(
    df: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    col: str = "close",
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W4 MACD(12,26,9), JVM-side tier: the hot indicator CHAIN of the
    reference (feature_engineer.py:137-161) rendered entirely as
    window collect_list + Horner folds — stage 1 computes the MACD
    line from the fast/slow truncated EMAs, stage 2 collects the
    derived line's trailing frame and folds the signal EMA over it,
    histogram = line - signal.  No Python workers anywhere in the
    chain; each stage materializes its frame lists in a dedicated
    projection (higher-order folds get no subexpression elimination).
    Same truncation tiers as `ema_native` (EMA_NATIVE_FRAMES); the
    registered oracle replays both stages' folds exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(symbol).orderBy(ts)

    def frame(c: str, s: int):
        return (
            F.collect_list(c)
            .over(w.rowsBetween(-(EMA_NATIVE_FRAMES[s] - 1), 0))
            .alias(f"__xs_{s}")
        )

    line = df.select(symbol, ts, frame(col, fast), frame(col, slow)).select(
        symbol,
        ts,
        (_horner_ema(f"__xs_{fast}", fast) - _horner_ema(f"__xs_{slow}", slow)).alias(
            "macd"
        ),
    )
    sig_frames = line.select(symbol, ts, "macd", frame("macd", signal))
    return sig_frames.select(
        symbol,
        ts,
        "macd",
        _horner_ema(f"__xs_{signal}", signal).alias("macd_signal"),
    ).withColumn("macd_histogram", F.col("macd") - F.col("macd_signal"))


def rsi_native(
    df: DataFrame,
    period: int = 14,
    col: str = "close",
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W3 RSI, JVM-side tier: gain/loss split is lag algebra (leading
    NULL delta maps to 0, the reference's NaN->0), then ONE truncated
    numerator fold per side — the adjust=True denominators of avg_gain
    and avg_loss are identical, so they cancel in
    rsi = 100·ag/(ag+al) = 100·num_g/(num_g+num_l), and the
    zero-denominator row maps to NULL exactly like the kernel query.
    Same truncation tier as ema_native; oracle replays the folds
    op-for-op."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(symbol).orderBy(ts)
    m = EMA_NATIVE_FRAMES[period]
    delta = F.col(col) - F.lag(col).over(w)
    s0 = df.select(
        symbol,
        ts,
        F.when(delta > 0, delta).otherwise(F.lit(0.0)).alias("__gain"),
        F.when(delta < 0, -delta).otherwise(F.lit(0.0)).alias("__loss"),
    )
    fr = w.rowsBetween(-(m - 1), 0)
    s1 = s0.select(
        symbol,
        ts,
        F.collect_list("__gain").over(fr).alias("__xg"),
        F.collect_list("__loss").over(fr).alias("__xl"),
    )
    r = F.lit(1.0 - 2.0 / (period + 1.0))
    num_g = F.aggregate(F.col("__xg"), F.lit(0.0), lambda a, x: a * r + x)
    num_l = F.aggregate(F.col("__xl"), F.lit(0.0), lambda a, x: a * r + x)
    rsi = F.when(num_g + num_l != 0, 100.0 * num_g / (num_g + num_l))
    return s1.select(symbol, ts, rsi.alias(f"rsi_{period}"))


def atr_native(
    df: DataFrame,
    period: int = 14,
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """W6 ATR, JVM-side tier: true range is lag algebra (first row
    degrades to high-low through the coalesce, the reference's NaN-
    skipping row max), then the truncated EMA fold — the last piece of
    the W2 chain (EMA/MACD/RSI/ATR) rendered without Python
    workers."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(symbol).orderBy(ts)
    m = EMA_NATIVE_FRAMES[period]
    prev = F.lag("close").over(w)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.coalesce(F.abs(F.col("high") - prev), F.lit(0.0)),
        F.coalesce(F.abs(F.col("low") - prev), F.lit(0.0)),
    )
    s0 = df.select(symbol, ts, tr.alias("__tr"))
    s1 = s0.select(
        symbol,
        ts,
        F.collect_list("__tr")
        .over(w.rowsBetween(-(m - 1), 0))
        .alias(f"__xs_{period}"),
    )
    return s1.select(
        symbol,
        ts,
        _horner_ema(f"__xs_{period}", period).alias(f"atr_{period}"),
    )
