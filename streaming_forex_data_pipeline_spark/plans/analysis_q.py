"""Analysis workloads (SURVEY §2.11 P-series): candlestick patterns,
trading signals, backtest metrics.

The reference implements these as Python loops over pandas frames
(app/services/analysis/); every per-row decision here is lag-window
Column algebra, and only the position-state event loop (P6) uses the
sanctioned per-symbol ``applyInPandas`` escape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import backtest as B
from ..operators import patterns as P
from ..sources.tables import CANDLES_CTE, candles_from_events
from .goldens import GOLDEN_DIR, events_md5_sql, golden_oracle
from .registry import register

R = 6
_W = "PARTITION BY symbol ORDER BY ts"

_PATTERNS_BASE = f"""
, lagd AS (
  SELECT symbol, ts, open, high, low, close,
         lag(open)  OVER ({_W}) AS p_o,
         lag(close) OVER ({_W}) AS p_c,
         lag(open, 2)  OVER ({_W}) AS f_o,
         lag(close, 2) OVER ({_W}) AS f_c,
         abs(close - open) AS body,
         high - low AS rng,
         least(open, close) - low AS lower_sh,
         high - greatest(open, close) AS upper_sh
  FROM candles
),
feat AS (
  SELECT *,
         abs(p_c - p_o) AS p_body,
         abs(f_c - f_o) AS f_body,
         body / rng AS body_ratio,
         lower_sh / rng AS lower_ratio,
         upper_sh / rng AS upper_ratio
  FROM lagd
)
"""


#: the six-pattern UNION body — shared verbatim by the `patterns`
#: oracle below and the `pattern_alerts_replay` oracle
#: (plans/streaming_q.py), so the alert channel's replay face can never
#: drift from the batch pattern semantics.
_PATTERNS_UNION = """
  SELECT symbol, ts, 'doji' AS pattern,
         CASE WHEN body_ratio <= 0.05 THEN 'high' ELSE 'medium' END AS confidence,
         round(close, 6) AS price_level,
         round(least(1.0, 1.0 - body_ratio), 6) AS signal_strength
  FROM feat WHERE rng > 0 AND body_ratio <= 0.1
  UNION ALL
  SELECT symbol, ts, 'hammer',
         CASE WHEN lower_ratio >= 0.7 THEN 'high' ELSE 'medium' END,
         round(close, 6),
         round(least(1.0, lower_ratio), 6)
  FROM feat
  WHERE rng > 0 AND body > 0 AND lower_ratio >= 0.6 AND body_ratio <= 0.3
    AND upper_ratio <= 0.1 AND p_c < p_o
  UNION ALL
  SELECT symbol, ts, 'bullish_engulfing',
         'medium',
         round(close, 6),
         round(least(1.0, body / (p_body + 1e-6)), 6)
  FROM feat
  WHERE p_c < p_o AND close > open AND open < p_c AND close > p_o AND body > p_body
  UNION ALL
  SELECT symbol, ts, 'bearish_engulfing',
         'medium',
         round(close, 6),
         round(least(1.0, body / (p_body + 1e-6)), 6)
  FROM feat
  WHERE p_c > p_o AND close < open AND open > p_c AND close < p_o AND body > p_body
  UNION ALL
  SELECT symbol, ts, 'morning_star',
         CASE WHEN least(1.0, body / (f_body + 1e-6)) > 0.8
              THEN 'high' ELSE 'medium' END,
         round(close, 6),
         round(least(1.0, body / (f_body + 1e-6)), 6)
  FROM feat
  WHERE f_c < f_o AND p_body < f_body * 0.3 AND close > open
    AND close > (f_o + f_c) / 2
  UNION ALL
  SELECT symbol, ts, 'evening_star',
         CASE WHEN least(1.0, body / (f_body + 1e-6)) > 0.8
              THEN 'high' ELSE 'medium' END,
         round(close, 6),
         round(least(1.0, body / (f_body + 1e-6)), 6)
  FROM feat
  WHERE f_c > f_o AND p_body < f_body * 0.3 AND close < open
    AND close < (f_o + f_c) / 2
"""


@register(
    "patterns",
    oracle=CANDLES_CTE
    + _PATTERNS_BASE
    + "SELECT * FROM (\n"
    + _PATTERNS_UNION
    + """) u
ORDER BY symbol, ts, pattern
""",
    doc="P1 — candlestick patterns (doji/hammer/engulfing/stars) as "
    "lag(1..2) boolean predicates emitting one row per (symbol, ts, "
    "pattern) with confidence + strength "
    "(pattern_detection.py:102-286; reference loops vectorized away).  "
    "Engulfing confidence is always 'medium' because the reference "
    "caps strength at 1.0 before its >1.5 high-confidence test — "
    "quirk preserved.",
)
def patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    out = P.detect_patterns(c)
    return out.select(
        "symbol",
        "ts",
        "pattern",
        "confidence",
        F.round("price_level", R).alias("price_level"),
        F.round("signal_strength", R).alias("signal_strength"),
    ).orderBy("symbol", "ts", "pattern")


_SIG_SMA_CTE = f"""
, ma AS (
  SELECT symbol, ts, close,
         CASE WHEN row_number() OVER ({_W}) >= 10
              THEN avg(close) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         END AS fast,
         CASE WHEN row_number() OVER ({_W}) >= 20
              THEN avg(close) OVER ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         END AS slow
  FROM candles
),
crossed AS (
  SELECT symbol, ts, close, fast, slow,
         lag(fast) OVER ({_W}) AS p_fast,
         lag(slow) OVER ({_W}) AS p_slow
  FROM ma
)
"""


@register(
    "signals_sma",
    oracle=CANDLES_CTE
    + _SIG_SMA_CTE
    + """
SELECT symbol, ts,
       CASE WHEN fast > slow AND p_fast <= p_slow THEN 1
            WHEN fast < slow AND p_fast >= p_slow THEN -1
            ELSE 0 END AS signal
FROM crossed
ORDER BY symbol, ts
""",
    doc="P5 — SMA(10/20) cross strategy signals: +1 on upward cross, -1 "
    "on downward, 0 otherwise; warm-up rows compare NULL -> 0 "
    "(backtesting_engine.py:178-203).",
)
def signals_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        B.sma_cross_signals(c)
        .select("symbol", "ts", "signal")
        .orderBy("symbol", "ts")
    )


@register(
    "signals_rsi",
    oracle=CANDLES_CTE
    + f"""
, d AS (
  SELECT symbol, ts, close,
         close - lag(close) OVER ({_W}) AS delta,
         row_number() OVER ({_W}) AS rn
  FROM candles
),
gl AS (
  SELECT symbol, ts, rn,
         CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
         CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss
  FROM d
),
r AS (
  SELECT symbol, ts,
         CASE WHEN rn >= 14
              THEN avg(gain) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         END AS ag,
         CASE WHEN rn >= 14
              THEN avg(loss) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         END AS al
  FROM gl
),
rsi AS (
  SELECT symbol, ts,
         CASE WHEN ag + al <> 0 THEN 100.0 * ag / (ag + al) END AS rsi
  FROM r
),
x AS (
  SELECT symbol, ts, rsi, lag(rsi) OVER ({_W}) AS p_rsi FROM rsi
)
SELECT symbol, ts,
       CASE WHEN rsi > 30 AND p_rsi <= 30 THEN 1
            WHEN rsi < 70 AND p_rsi >= 70 THEN -1
            ELSE 0 END AS signal
FROM x
ORDER BY symbol, ts
""",
    doc="P5 — RSI(14) band-exit strategy signals using the "
    "rolling-mean RSI variant (backtesting_engine.py:213-248; the "
    "second in-reference RSI definition, SURVEY §2.14).",
)
def signals_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        B.rsi_exit_signals(c)
        .select("symbol", "ts", "signal")
        .orderBy("symbol", "ts")
    )




def _macd_lines_sql(src: str, prefix: str) -> str:
    """CTE chain computing the fold-tier MACD(12,26,9) lines over
    ``src`` (must expose symbol, ts, close) — the SQL twin of
    operators/ewm.py:macd_native, shared by signals_macd and the
    strategy-comparison base."""
    from .ewm_q import _fold_sql, _native_frame_sql

    return f"""{prefix}_f1 AS (
  SELECT symbol, ts, close,
         row_number() OVER ({_W}) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n_rows,
         {_native_frame_sql('close', 12)} AS xs12,
         {_native_frame_sql('close', 26)} AS xs26
  FROM {src}
),
{prefix}_m AS (
  SELECT symbol, ts, close, rn, n_rows,
         {_fold_sql('xs12', 12)} - {_fold_sql('xs26', 26)} AS macd
  FROM {prefix}_f1
),
{prefix}_f2 AS (
  SELECT symbol, ts, close, rn, n_rows, macd,
         {_native_frame_sql('macd', 9)} AS xs9
  FROM {prefix}_m
),
{prefix}_l AS (
  SELECT symbol, ts, close, rn, n_rows, macd,
         {_fold_sql('xs9', 9)} AS msig
  FROM {prefix}_f2
),
{prefix}_x AS (
  SELECT symbol, ts, close, rn, n_rows, macd, msig,
         lag(macd) OVER ({_W}) AS p_m,
         lag(msig) OVER ({_W}) AS p_s
  FROM {prefix}_l
)"""


_MACD_SIG_CASE = """CASE WHEN macd > msig AND p_m <= p_s THEN 1
            WHEN macd < msig AND p_m >= p_s THEN -1
            ELSE 0 END"""


@register(
    "signals_macd",
    oracle=CANDLES_CTE
    + ", "
    + _macd_lines_sql("candles", "mc")
    + f"""
SELECT symbol, ts,
       {_MACD_SIG_CASE} AS signal
FROM mc_x
ORDER BY symbol, ts
""",
    doc="P5 — MACD(12,26,9) line/signal crossover strategy signals "
    "(backtesting_engine.py:239-274 MACDStrategy — the third and last "
    "in-reference strategy, previously the only one without a "
    "registered face).  The lines come from the JVM-side fold tier "
    "(operators/ewm.py:macd_native), so the crossover booleans are "
    "bit-reproducible against the oracle's identical folds — a "
    "kernel-vs-SQL 1-ulp near-tie cannot flip a signal.",
)
def signals_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        B.macd_cross_signals(c)
        .select("symbol", "ts", "signal")
        .orderBy("symbol", "ts")
    )


#: the shared price/signal head of every backtest oracle: grid-pinned
#: hourly candles, SMA(10/20) cross signals, is_last flag — one copy so
#: the single- and multi-position recursive loops can never disagree on
#: their inputs (see _bt_candles for the price-grid rationale)
_BT_CANDLES = """candles AS (
  SELECT event_type AS symbol,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts,
         100.0 + floor(round(max_by("value", event_id), 6) * 10.0) / 10000.0 AS close
  FROM events GROUP BY 1, 2
)"""

#: SMA(10/20)-cross signal base over the grid candles — (symbol, rn,
#: ts, price, is_last, sig), the shape every rec loop consumes
_BT_SMA_BASE = """sig0 AS (
  SELECT symbol, ts, close,
         row_number() OVER (PARTITION BY symbol ORDER BY ts) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n_rows,
         CASE WHEN row_number() OVER (PARTITION BY symbol ORDER BY ts) >= 10
              THEN avg(close) OVER (PARTITION BY symbol ORDER BY ts
                                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) END AS f,
         CASE WHEN row_number() OVER (PARTITION BY symbol ORDER BY ts) >= 20
              THEN avg(close) OVER (PARTITION BY symbol ORDER BY ts
                                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) END AS s
  FROM candles
),
base AS MATERIALIZED (
  SELECT symbol, rn, ts, close AS price, (rn = n_rows) AS is_last,
         CASE WHEN f > s AND lag(f) OVER (PARTITION BY symbol ORDER BY ts)
                              <= lag(s) OVER (PARTITION BY symbol ORDER BY ts) THEN 1
              WHEN f < s AND lag(f) OVER (PARTITION BY symbol ORDER BY ts)
                              >= lag(s) OVER (PARTITION BY symbol ORDER BY ts) THEN -1
              ELSE 0 END AS sig
  FROM sig0
)"""

_BT_BASE_CTES = _BT_CANDLES + ",\n" + _BT_SMA_BASE


def _bt_rec_loop(
    base: str = "base", rec: str = "rec", commission: str = "0.0001"
) -> str:
    """DuckDB recursive-CTE rendering of the backtest event loop
    (backtesting_engine.py:284-379) at max_positions=1: the loop state
    collapses to one fixed tuple (capital, open?, entry, price, side,
    size, commission), which a recursive CTE carries row by row.  Named
    Python snippets keep the repeated CASE arms typo-free.

    The arithmetic mirrors ``simulate(pin_grid=True)`` exactly: the
    capital path is snapped to a cent grid and every money value to a
    1e-6 grid via floor(x*s + 0.5) after each update, and the candle
    close is mapped onto an exact 1e-4 price grid near 100
    (100 + floor(raw*10)/10000), so a) the recurrence cannot
    accumulate cross-engine 1-ulp drift, and b) the reference's
    pnl = Δprice × size compounding stays bounded (raw synthetic
    prices swing 10×/hour, which compounds capital to ~1e43 where
    round(x, 6) itself diverges between engines — the r2
    backtest_trades hash failure)."""
    C = commission

    def p2(x: str) -> str:
        return f"(floor(({x}) * 100.0 + 0.5) / 100.0)"

    def p6(x: str) -> str:
        return f"(floor(({x}) * 1000000.0 + 0.5) / 1000000.0)"

    opened = "((NOT r.open) AND b.sig <> 0)"
    o_size = p2("r.capital * 0.1")
    leg1 = p6(f"{o_size} * {C}")
    capital1 = (
        f"(CASE WHEN {opened} THEN {p2(f'r.capital - {leg1}')} ELSE r.capital END)"
    )
    h_open = f"(r.open OR {opened})"
    h_etime = "(CASE WHEN r.open THEN r.e_time ELSE b.ts END)"
    h_eprice = "(CASE WHEN r.open THEN r.e_price ELSE b.price END)"
    h_buy = "(CASE WHEN r.open THEN r.is_buy ELSE b.sig > 0 END)"
    h_size = f"(CASE WHEN r.open THEN r.size ELSE {o_size} END)"
    h_comm = f"(CASE WHEN r.open THEN r.comm ELSE {leg1} END)"
    close_cond = (
        "(r.open AND ((r.is_buy AND b.sig < 0) OR ((NOT r.is_buy) AND b.sig > 0)"
        " OR (r.is_buy AND b.price <= r.e_price * 0.95)"
        " OR ((NOT r.is_buy) AND b.price >= r.e_price * 1.05)))"
    )
    close_now = f"({close_cond} OR ({h_open} AND b.is_last))"
    direction = f"(CASE WHEN {h_buy} THEN 1.0 ELSE -1.0 END)"
    total_comm = p6(f"{h_comm} + {p6(f'{h_size} * {C}')}")
    pnl = p6(f"{direction} * (b.price - {h_eprice}) * {h_size} - {total_comm}")
    capital2 = (
        f"(CASE WHEN {close_now} AND {pnl} <> 0.0"
        f" THEN {p2(f'{capital1} + {pnl}')} ELSE {capital1} END)"
    )
    next_open = f"({h_open} AND NOT {close_now})"
    return _bt_rec_body_text(
        capital2, next_open, h_etime, h_eprice, h_buy, h_size, h_comm,
        close_now, total_comm, pnl, direction, p6, base=base, rec=rec,
    )


def _bt_rec_sql(commission: str = "0.0001") -> str:
    """Full single-strategy oracle head: grid candles + SMA-cross base
    + one rec loop (see _bt_rec_loop's docstring above for the state
    and pinning story)."""
    return f"""
WITH RECURSIVE {_BT_BASE_CTES},
{_bt_rec_loop("base", "rec", commission)}
"""


def _bt_rec_body_text(
    capital2, next_open, h_etime, h_eprice, h_buy, h_size, h_comm,
    close_now, total_comm, pnl, direction, p6, base: str, rec: str
) -> str:
    """One rec-loop CTE body over the signal base ``base``, named
    ``rec`` — factored out so the strategy-comparison oracle can stamp
    one loop per strategy without duplicating the transition SQL."""
    return f"""{rec} AS (
  SELECT symbol, CAST(0 AS BIGINT) AS rn,
         CAST(10000.0 AS DOUBLE) AS capital, FALSE AS open,
         CAST(NULL AS TIMESTAMP) AS e_time, CAST(NULL AS DOUBLE) AS e_price,
         FALSE AS is_buy, CAST(NULL AS DOUBLE) AS size, CAST(NULL AS DOUBLE) AS comm,
         FALSE AS emit,
         CAST(NULL AS TIMESTAMP) AS t_entry, CAST(NULL AS TIMESTAMP) AS t_exit,
         CAST(NULL AS DOUBLE) AS t_eprice, CAST(NULL AS DOUBLE) AS t_xprice,
         CAST(NULL AS VARCHAR) AS t_type, CAST(NULL AS DOUBLE) AS t_size,
         CAST(NULL AS DOUBLE) AS t_comm, CAST(NULL AS DOUBLE) AS t_pnl,
         CAST(NULL AS DOUBLE) AS t_ret
  FROM (SELECT DISTINCT symbol FROM {base})
  UNION ALL
  SELECT b.symbol, b.rn,
         {capital2},
         {next_open},
         CASE WHEN {next_open} THEN {h_etime} END,
         CASE WHEN {next_open} THEN {h_eprice} END,
         CASE WHEN {next_open} THEN {h_buy} ELSE FALSE END,
         CASE WHEN {next_open} THEN {h_size} END,
         CASE WHEN {next_open} THEN {h_comm} END,
         {close_now},
         CASE WHEN {close_now} THEN {h_etime} END,
         CASE WHEN {close_now} THEN b.ts END,
         CASE WHEN {close_now} THEN {h_eprice} END,
         CASE WHEN {close_now} THEN b.price END,
         CASE WHEN {close_now} THEN (CASE WHEN {h_buy} THEN 'buy' ELSE 'sell' END) END,
         CASE WHEN {close_now} THEN {h_size} END,
         CASE WHEN {close_now} THEN {total_comm} END,
         CASE WHEN {close_now} THEN {pnl} END,
         CASE WHEN {close_now}
              THEN {p6(f'{direction} * (b.price - {h_eprice}) / {h_eprice} * 100.0')}
         END
  FROM {rec} r JOIN {base} b ON b.symbol = r.symbol AND b.rn = r.rn + 1
)"""


def _bt_rec_multi_sql(n_pos: int, commission: str = "0.0001") -> str:
    """DuckDB recursive-CTE rendering of the backtest event loop at
    ``max_positions = n_pos`` (backtesting_engine.py:284-379 — the
    reference's general case, round-10 verdict Next #7): the loop state
    is no longer one fixed tuple but the OPEN POSITION LIST, which the
    recursive relation carries as a LIST<STRUCT> column.  Each step:

      1. entry — if sig <> 0 and len(open_list) < n_pos, append one
         trade sized 10% of current capital (entry commission leg
         subtracted first, exactly the reference's order);
      2. exit scan — list_filter over the held list (INCLUDING the
         just-opened trade, as the reference's loop does) with the
         opposite-signal / ±5%-stop / end-of-data conditions;
      3. capital — list_reduce folds each closed trade's pnl into
         capital SEQUENTIALLY with the cent-grid pin after every
         update and the reference's ``if trade.pnl:`` zero-skip,
         mirroring simulate(pin_grid=True)'s per-close recurrence
         (a single pinned sum would round differently).

    Closed trades are emitted through a per-step ``closed`` list and
    unnested at the end.  Same pinned arithmetic and price grid as
    `_bt_rec_sql`.

    Last-row fold-order equivalence limit (advice-found, round 12):
    on the FINAL row this rendering folds all closing trades into
    capital in open-list (entry) order via one list_filter pass,
    while the reference's simulate() closes scan-condition exits
    first and end-of-data leftovers after the loop.  When both kinds
    coexist on the last row, the cent-pinned capital fold order can
    differ.  Invisible today — `backtest_trades_multi` emits only the
    trade rows (identical either way: pnl/ret are per-trade) and no
    trade can OPEN after the last row — but if final_capital or
    multi-position equity metrics are ever surfaced from this CTE,
    split the last-row close into scan-closes followed by is_last
    closes to replay simulate()'s exact order."""
    C = commission

    def p2(x: str) -> str:
        return f"(floor(({x}) * 100.0 + 0.5) / 100.0)"

    def p6(x: str) -> str:
        return f"(floor(({x}) * 1000000.0 + 0.5) / 1000000.0)"

    trade_t = (
        "STRUCT(e_time TIMESTAMP, e_price DOUBLE, is_buy BOOLEAN, "
        "size DOUBLE, comm DOUBLE)"
    )
    closed_t = (
        "STRUCT(e_time TIMESTAMP, x_time TIMESTAMP, e_price DOUBLE, "
        "x_price DOUBLE, is_buy BOOLEAN, size DOUBLE, comm DOUBLE, "
        "pnl DOUBLE, ret DOUBLE)"
    )
    opened = f"(len(r.open_list) < {n_pos} AND b.sig <> 0)"
    o_size = p2("r.capital * 0.1")
    leg = p6(f"{o_size} * {C}")
    capital1 = (
        f"(CASE WHEN {opened} THEN {p2(f'r.capital - {leg}')} "
        f"ELSE r.capital END)"
    )
    new_trade = (
        "{'e_time': b.ts, 'e_price': b.price, 'is_buy': b.sig > 0, "
        f"'size': {o_size}, 'comm': {leg}}}"
    )
    held = (
        f"(CASE WHEN {opened} THEN list_append(r.open_list, {new_trade}) "
        f"ELSE r.open_list END)"
    )
    close_cond = (
        "((t.is_buy AND b.sig < 0) OR ((NOT t.is_buy) AND b.sig > 0)"
        " OR (t.is_buy AND b.price <= t.e_price * 0.95)"
        " OR ((NOT t.is_buy) AND b.price >= t.e_price * 1.05)"
        " OR b.is_last)"
    )
    direction = "(CASE WHEN t.is_buy THEN 1.0 ELSE -1.0 END)"
    total_comm = p6(f"t.comm + {p6(f't.size * {C}')}")
    pnl = p6(f"{direction} * (b.price - t.e_price) * t.size - {total_comm}")
    ret = p6(f"{direction} * (b.price - t.e_price) / t.e_price * 100.0")
    closed_now = (
        f"list_transform(list_filter({held}, t -> {close_cond}), t -> "
        "{'e_time': t.e_time, 'x_time': b.ts, 'e_price': t.e_price, "
        "'x_price': b.price, 'is_buy': t.is_buy, 'size': t.size, "
        f"'comm': {total_comm}, 'pnl': {pnl}, 'ret': {ret}}})"
    )
    remaining = f"list_filter({held}, t -> NOT {close_cond})"
    capital2 = (
        f"list_reduce(list_concat([{capital1}], "
        f"list_transform({closed_now}, t -> t.pnl)), "
        f"(acc, x) -> CASE WHEN x <> 0.0 THEN {p2('acc + x')} "
        "ELSE acc END)"
    )
    return f"""
WITH RECURSIVE {_BT_BASE_CTES},
rec AS (
  SELECT symbol, CAST(0 AS BIGINT) AS rn,
         CAST(10000.0 AS DOUBLE) AS capital,
         CAST([] AS {trade_t}[]) AS open_list,
         CAST([] AS {closed_t}[]) AS closed
  FROM (SELECT DISTINCT symbol FROM base)
  UNION ALL
  SELECT b.symbol, b.rn,
         {capital2},
         {remaining},
         {closed_now}
  FROM rec r JOIN base b ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
"""


_BT_TRADES_MULTI_ORACLE = _bt_rec_multi_sql(3) + """
, x AS (
  SELECT symbol, unnest(closed) AS t FROM rec WHERE len(closed) > 0
)
SELECT symbol,
       t.e_time AS entry_time, t.x_time AS exit_time,
       t.e_price AS entry_price, t.x_price AS exit_price,
       CASE WHEN t.is_buy THEN 'buy' ELSE 'sell' END AS trade_type,
       t.size AS size, t.comm AS commission,
       t.pnl AS pnl, t.ret AS return_pct
FROM x
ORDER BY symbol, entry_time
"""


_BT_TRADES_ORACLE = _bt_rec_sql() + """
SELECT symbol, t_entry AS entry_time, t_exit AS exit_time,
       t_eprice AS entry_price, t_xprice AS exit_price,
       t_type AS trade_type, t_size AS size,
       t_comm AS commission, t_pnl AS pnl,
       t_ret AS return_pct
FROM rec WHERE emit
ORDER BY symbol, entry_time
"""

_BT_METRICS_ORACLE = _bt_rec_sql() + """
, trades AS MATERIALIZED (
  SELECT symbol, rn,
         floor(t_pnl * 1000000.0 + 0.5) AS pnl_s,
         floor(t_ret * 1000000.0 + 0.5) AS ret_s,
         row_number() OVER (PARTITION BY symbol ORDER BY rn) AS seq
  FROM rec WHERE emit
),
finals AS (
  SELECT symbol, capital AS final_capital
  FROM rec
  QUALIFY row_number() OVER (PARTITION BY symbol ORDER BY rn DESC) = 1
),
curve AS (
  SELECT symbol, seq, pnl_s,
         10000000000.0 + sum(pnl_s) OVER (PARTITION BY symbol ORDER BY seq) AS cap_s
  FROM trades
),
peaks AS (
  SELECT symbol, seq, cap_s,
         greatest(10000000000.0,
                  max(cap_s) OVER (PARTITION BY symbol ORDER BY seq)) AS peak_s
  FROM curve
),
runs AS (
  SELECT symbol, (pnl_s > 0) AS win, (pnl_s < 0) AS loss,
         seq - row_number() OVER (PARTITION BY symbol, (pnl_s > 0) ORDER BY seq) AS gw,
         seq - row_number() OVER (PARTITION BY symbol, (pnl_s < 0) ORDER BY seq) AS gl
  FROM trades
),
win_runs AS (SELECT symbol, count(*) AS len FROM runs WHERE win GROUP BY symbol, gw),
loss_runs AS (SELECT symbol, count(*) AS len FROM runs WHERE loss GROUP BY symbol, gl),
agg AS (
  SELECT symbol,
         count(*) AS total_trades,
         count(*) FILTER (WHERE pnl_s > 0) AS winning_trades,
         count(*) FILTER (WHERE pnl_s < 0) AS losing_trades,
         sum(pnl_s) AS sum_pnl_s,
         sum(ret_s) AS sum_ret_s,
         sum(ret_s * ret_s) AS sum_ret2_s,
         sum(CASE WHEN pnl_s > 0 THEN pnl_s ELSE 0.0 END) AS gp_s,
         abs(sum(CASE WHEN pnl_s < 0 THEN pnl_s ELSE 0.0 END)) AS gl_s
  FROM trades GROUP BY symbol
),
std6 AS (
  SELECT symbol,
         sqrt(greatest((sum_ret2_s / total_trades)
                       - (sum_ret_s / total_trades) * (sum_ret_s / total_trades),
                       0.0)) / 1000000.0 AS std6,
         (sum_ret_s / total_trades) / 1000000.0 AS mean6
  FROM agg
)
SELECT f.symbol,
       coalesce(a.total_trades, 0) AS total_trades,
       coalesce(a.winning_trades, 0) AS winning_trades,
       coalesce(a.losing_trades, 0) AS losing_trades,
       coalesce((CAST(a.winning_trades AS DOUBLE)
                 / CAST(a.total_trades AS DOUBLE)) * 100.0, 0.0) AS win_rate,
       coalesce(a.sum_pnl_s / 1000000.0, 0.0) AS total_pnl,
       f.final_capital AS final_capital,
       (f.final_capital - 10000.0) / 10000.0 * 100.0 AS total_return,
       coalesce((SELECT max((p.peak_s - p.cap_s) / p.peak_s * 100.0)
                 FROM peaks p WHERE p.symbol = f.symbol), 0.0) AS max_drawdown,
       coalesce(CASE WHEN a.total_trades >= 2 AND s.std6 <> 0.0
                     THEN (s.mean6 - 2.0) / s.std6 ELSE 0.0 END, 0.0) AS sharpe_ratio,
       coalesce(CASE WHEN a.gl_s = 0
                     THEN (CASE WHEN a.gp_s > 0
                                THEN CAST('infinity' AS DOUBLE) ELSE 0.0 END)
                     ELSE a.gp_s / a.gl_s END, 0.0) AS profit_factor,
       coalesce((SELECT max(len) FROM win_runs w WHERE w.symbol = f.symbol), 0)
         AS max_consecutive_wins,
       coalesce((SELECT max(len) FROM loss_runs l WHERE l.symbol = f.symbol), 0)
         AS max_consecutive_losses
FROM finals f
LEFT JOIN agg a ON a.symbol = f.symbol
LEFT JOIN std6 s ON s.symbol = f.symbol
ORDER BY f.symbol
"""


#: RSI(14) band-exit signal base over the grid candles — the
#: strategy-comparison twin of signals_rsi's oracle, shaped like
#: _BT_SMA_BASE's (symbol, rn, ts, price, is_last, sig)
_BT_RSI_BASE = f"""rsi_d AS (
  SELECT symbol, ts, close,
         close - lag(close) OVER ({_W}) AS delta,
         row_number() OVER ({_W}) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n_rows
  FROM candles
),
rsi_gl AS (
  SELECT symbol, ts, close, rn, n_rows,
         CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
         CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss
  FROM rsi_d
),
rsi_avg AS (
  SELECT symbol, ts, close, rn, n_rows,
         CASE WHEN rn >= 14
              THEN avg(gain) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         END AS ag,
         CASE WHEN rn >= 14
              THEN avg(loss) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         END AS al
  FROM rsi_gl
),
rsi_v AS (
  SELECT symbol, ts, close, rn, n_rows,
         CASE WHEN ag + al <> 0 THEN 100.0 * ag / (ag + al) END AS rsi
  FROM rsi_avg
),
rsi_x AS (
  SELECT symbol, ts, close, rn, n_rows, rsi,
         lag(rsi) OVER ({_W}) AS p_rsi
  FROM rsi_v
),
rsi_base AS MATERIALIZED (
  SELECT symbol, rn, ts, close AS price, (rn = n_rows) AS is_last,
         CASE WHEN rsi > 30 AND p_rsi <= 30 THEN 1
              WHEN rsi < 70 AND p_rsi >= 70 THEN -1
              ELSE 0 END AS sig
  FROM rsi_x
)"""


def _strategy_comparison_oracle() -> str:
    """All three in-reference strategies through the pinned event loop
    (one rec-loop CTE per strategy over its own signal base), unioned
    with strategy labels, then ONE metrics tail keyed
    (strategy, symbol) plus the reference report's per-metric rankings
    (generate_performance_report, backtesting_engine.py:391-439)."""
    mc_base = (
        _macd_lines_sql("candles", "cmp")
        + f""",
mc_base AS MATERIALIZED (
  SELECT symbol, rn, ts, close AS price, (rn = n_rows) AS is_last,
         {_MACD_SIG_CASE} AS sig
  FROM cmp_x
)"""
    )
    loops = ",\n".join(
        [
            _bt_rec_loop("base", "rec_sma"),
            _bt_rec_loop("rsi_base", "rec_rsi"),
            _bt_rec_loop("mc_base", "rec_macd"),
        ]
    )
    return f"""
WITH RECURSIVE {_BT_CANDLES},
{_BT_SMA_BASE},
{_BT_RSI_BASE},
{mc_base},
{loops},
rec AS (
  SELECT 'sma_cross' AS strategy, * FROM rec_sma
  UNION ALL SELECT 'rsi_exit', * FROM rec_rsi
  UNION ALL SELECT 'macd_cross', * FROM rec_macd
),
trades AS MATERIALIZED (
  SELECT strategy, symbol, rn,
         floor(t_pnl * 1000000.0 + 0.5) AS pnl_s,
         floor(t_ret * 1000000.0 + 0.5) AS ret_s
  FROM rec WHERE emit
),
tseq AS (
  SELECT *, row_number() OVER (PARTITION BY strategy, symbol ORDER BY rn) AS seq
  FROM trades
),
finals AS (
  SELECT strategy, symbol, capital AS final_capital
  FROM rec
  QUALIFY row_number() OVER (PARTITION BY strategy, symbol ORDER BY rn DESC) = 1
),
curve AS (
  SELECT strategy, symbol, seq,
         10000000000.0 + sum(pnl_s) OVER (PARTITION BY strategy, symbol ORDER BY seq) AS cap_s
  FROM tseq
),
peaks AS (
  SELECT strategy, symbol, seq, cap_s,
         greatest(10000000000.0,
                  max(cap_s) OVER (PARTITION BY strategy, symbol ORDER BY seq)) AS peak_s
  FROM curve
),
agg AS (
  SELECT strategy, symbol,
         count(*) AS total_trades,
         count(*) FILTER (WHERE pnl_s > 0) AS winning_trades,
         sum(ret_s) AS sum_ret_s,
         sum(ret_s * ret_s) AS sum_ret2_s,
         sum(CASE WHEN pnl_s > 0 THEN pnl_s ELSE 0.0 END) AS gp_s,
         abs(sum(CASE WHEN pnl_s < 0 THEN pnl_s ELSE 0.0 END)) AS gl_s
  FROM trades GROUP BY strategy, symbol
),
std6 AS (
  SELECT strategy, symbol,
         sqrt(greatest((sum_ret2_s / total_trades)
                       - (sum_ret_s / total_trades) * (sum_ret_s / total_trades),
                       0.0)) / 1000000.0 AS std6,
         (sum_ret_s / total_trades) / 1000000.0 AS mean6
  FROM agg
),
summary AS (
  SELECT f.strategy, f.symbol,
         coalesce(a.total_trades, 0) AS total_trades,
         coalesce((CAST(a.winning_trades AS DOUBLE)
                   / CAST(a.total_trades AS DOUBLE)) * 100.0, 0.0) AS win_rate,
         (f.final_capital - 10000.0) / 10000.0 * 100.0 AS total_return,
         coalesce((SELECT max((p.peak_s - p.cap_s) / p.peak_s * 100.0)
                   FROM peaks p
                   WHERE p.strategy = f.strategy AND p.symbol = f.symbol),
                  0.0) AS max_drawdown,
         coalesce(CASE WHEN a.total_trades >= 2 AND s.std6 <> 0.0
                       THEN (s.mean6 - 2.0) / s.std6 ELSE 0.0 END, 0.0)
           AS sharpe_ratio,
         coalesce(CASE WHEN a.gl_s = 0
                       THEN (CASE WHEN a.gp_s > 0
                                  THEN CAST('infinity' AS DOUBLE) ELSE 0.0 END)
                       ELSE a.gp_s / a.gl_s END, 0.0) AS profit_factor
  FROM finals f
  LEFT JOIN agg a ON a.strategy = f.strategy AND a.symbol = f.symbol
  LEFT JOIN std6 s ON s.strategy = f.strategy AND s.symbol = f.symbol
)
SELECT strategy, symbol, total_trades, win_rate, total_return, max_drawdown,
       sharpe_ratio, profit_factor,
       CAST(rank() OVER (PARTITION BY symbol
                         ORDER BY total_return DESC, strategy) AS INT)
         AS rank_total_return,
       CAST(rank() OVER (PARTITION BY symbol
                         ORDER BY win_rate DESC, strategy) AS INT)
         AS rank_win_rate,
       CAST(rank() OVER (PARTITION BY symbol
                         ORDER BY sharpe_ratio DESC, strategy) AS INT)
         AS rank_sharpe_ratio,
       CAST(rank() OVER (PARTITION BY symbol
                         ORDER BY profit_factor DESC, strategy) AS INT)
         AS rank_profit_factor
FROM summary
ORDER BY symbol, strategy
"""


@register(
    "strategy_comparison",
    oracle=_strategy_comparison_oracle(),
    doc="P6+A9 — the reference's compare_strategies + performance "
    "report (backtesting_engine.py:381-439): all three strategies "
    "(SMA cross / RSI band-exit / MACD cross) through the pinned "
    "event loop per symbol, one summary row per (strategy, symbol) "
    "with the report's metric set, plus per-symbol rank columns for "
    "the report's four ranking metrics (ties broken by strategy name "
    "so the order is total on both engines).  One metrics tail keyed "
    "(strategy, symbol) serves all strategies; the MACD signals come "
    "from the fold tier so crossover booleans are engine-exact.",
)
def strategy_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from pyspark.sql import Window

    c = _bt_candles(spark, sf_dir)
    strategies = [
        ("sma_cross", B.sma_cross_signals(c)),
        ("rsi_exit", B.rsi_exit_signals(c)),
        ("macd_cross", B.macd_cross_signals(c)),
    ]
    parts = []
    for name, sig in strategies:
        m = B.backtest_metrics(sig, pin_grid=True)
        parts.append(
            m.select(
                F.lit(name).alias("strategy"),
                "symbol",
                "total_trades",
                "win_rate",
                "total_return",
                "max_drawdown",
                "sharpe_ratio",
                "profit_factor",
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), parts)
    wsym = Window.partitionBy("symbol")

    def rk(metric: str):
        return F.rank().over(
            wsym.orderBy(F.col(metric).desc(), F.col("strategy"))
        ).alias(f"rank_{metric}")

    return u.select(
        "strategy",
        "symbol",
        "total_trades",
        "win_rate",
        "total_return",
        "max_drawdown",
        "sharpe_ratio",
        "profit_factor",
        rk("total_return"),
        rk("win_rate"),
        rk("sharpe_ratio"),
        rk("profit_factor"),
    ).orderBy("symbol", "strategy")


def _bt_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candles with close mapped to an exact 1e-4 price grid near 100
    (100 + floor(raw*10)/10000, range ~[100, 100.06]).  The raw
    synthetic closes swing 10×/hour; fed to the reference's
    pnl = Δprice × size sizing they compound capital to ~1e43, where
    even round(x, 6) diverges by 1 ulp between Spark (BigDecimal) and
    DuckDB (binary scaling) — the r2 backtest_trades hash failure.
    Realistic FX-scale moves keep the pinned capital path exact."""
    c = candles_from_events(spark, sf_dir)
    return c.withColumn(
        "close",
        F.lit(100.0) + F.floor(F.col("close") * F.lit(10.0)) / F.lit(10000.0),
    )


@register(
    "backtest_trades",
    oracle=_BT_TRADES_ORACLE,
    doc="P6 — closed-trade ledger from the SMA-cross strategy through "
    "the reference event loop (entry sizing 10%, commission both "
    "sides, opposite-signal/±5%-stop exits, end-of-data force close; "
    "backtesting_engine.py:284-379).  Sequential per symbol -> "
    "applyInPandas.  At max_positions=1 the loop state is one fixed "
    "tuple, so a recursive CTE replays the event loop exactly and the "
    "ledger is oracle-checked, not just rows-only; independently "
    "differential-tested in tests/test_backtest.py.  pin_grid=True + "
    "grid-mapped prices make the ledger bit-reproducible across "
    "engines (see _bt_candles / _bt_rec_sql docstrings).",
)
def backtest_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = B.sma_cross_signals(_bt_candles(spark, sf_dir))
    out = B.backtest_trades(sig, pin_grid=True)
    return out.select(
        "symbol",
        "entry_time",
        "exit_time",
        "entry_price",
        "exit_price",
        "trade_type",
        "size",
        "commission",
        "pnl",
        "return_pct",
    ).orderBy("symbol", "entry_time")


@register(
    "backtest_trades_multi",
    oracle=_BT_TRADES_MULTI_ORACLE,
    doc="P6 — the reference event loop at max_positions=3 "
    "(backtesting_engine.py:284 run_backtest's general case, round-10 "
    "verdict Next #7): up to three concurrent positions per symbol, "
    "entries skipped while the book is full, every open trade "
    "exit-scanned per row (so an opposite signal both OPENS the "
    "reverse position and CLOSES the standing one in the same row — "
    "capacity genuinely binds: the max_positions=1 ledger is "
    "long-only on this fixture, this one carries shorts).  The "
    "oracle carries the open-position LIST as a LIST<STRUCT> column "
    "through a recursive CTE with list_filter/list_transform/"
    "list_reduce — the per-close sequentially-pinned capital fold "
    "replayed exactly (_bt_rec_multi_sql).  Differential-tested "
    "against simulate() on a capacity-binding fixture in "
    "tests/test_backtest.py.",
)
def backtest_trades_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = B.sma_cross_signals(_bt_candles(spark, sf_dir))
    out = B.backtest_trades(sig, pin_grid=True, max_positions=3)
    return out.select(
        "symbol",
        "entry_time",
        "exit_time",
        "entry_price",
        "exit_price",
        "trade_type",
        "size",
        "commission",
        "pnl",
        "return_pct",
    ).orderBy("symbol", "entry_time")


@register(
    "backtest_metrics",
    oracle=_BT_METRICS_ORACLE,
    doc="P6+A9 — per-symbol portfolio metrics (win rate, PnL, max "
    "drawdown over the capital curve, Sharpe with 2% risk-free and "
    "population std, profit factor incl. the +inf gross-loss-free "
    "path, win/loss streaks via gaps-and-islands; "
    "backtesting_engine.py:79-160, 441-467).  Oracle = the recursive-"
    "CTE event loop + window/aggregate metric derivation, so the whole "
    "P6+A9 chain is hash-checked end to end.  Aggregates are derived "
    "from exact integer-scaled sums (metrics_from_trades_pinned), so "
    "they are bit-identical regardless of engine or summation order; "
    "zero-trade symbols emit a coalesced default row on both sides.",
)
def backtest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = B.sma_cross_signals(_bt_candles(spark, sf_dir))
    out = B.backtest_metrics(sig, pin_grid=True)
    return out.select(
        "symbol",
        "total_trades",
        "winning_trades",
        "losing_trades",
        "win_rate",
        "total_pnl",
        "final_capital",
        "total_return",
        "max_drawdown",
        "sharpe_ratio",
        "profit_factor",
        "max_consecutive_wins",
        "max_consecutive_losses",
    ).orderBy("symbol")


@register(
    "support_resistance_levels",
    oracle=CANDLES_CTE
    + f"""
, base AS (
  SELECT symbol, ts, high, low,
         min(low)  OVER ({_W} ROWS BETWEEN 10 PRECEDING AND 9 FOLLOWING) AS cmin,
         max(high) OVER ({_W} ROWS BETWEEN 10 PRECEDING AND 9 FOLLOWING) AS cmax,
         list(low)  OVER ({_W} ROWS BETWEEN 40 PRECEDING AND 39 FOLLOWING) AS lows,
         list(high) OVER ({_W} ROWS BETWEEN 40 PRECEDING AND 39 FOLLOWING) AS highs,
         row_number() OVER ({_W}) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n
  FROM candles
),
sup AS (
  SELECT symbol, ts, 'support' AS pattern,
         len(list_filter(lows, x -> abs(x - low) / low < 0.002)) AS touches,
         low AS price_level
  FROM base
  WHERE rn >= 21 AND rn <= n - 20 AND low = cmin
),
res AS (
  SELECT symbol, ts, 'resistance' AS pattern,
         len(list_filter(highs, x -> abs(x - high) / high < 0.002)) AS touches,
         high AS price_level
  FROM base
  WHERE rn >= 21 AND rn <= n - 20 AND high = cmax
),
u AS (SELECT * FROM sup UNION ALL SELECT * FROM res)
SELECT symbol, ts, pattern,
       CASE WHEN touches >= 4 THEN 'high' ELSE 'medium' END AS confidence,
       round(price_level, 6) AS price_level,
       round(least(1.0, touches / 5.0), 6) AS signal_strength,
       CAST(touches AS BIGINT) AS touches
FROM u
WHERE touches >= 2
ORDER BY symbol, ts, pattern
""",
    doc="P2 — support/resistance levels: centered rolling(20) min/max "
    "local extrema, touch count within ±40 rows at 0.2% tolerance, "
    ">=2 touches emits a level (pattern_detection.py:288-349).  The "
    "reference's O(n·w) touch loop becomes a bounded list window.",
)
def support_resistance_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    out = P.support_resistance_levels(c)
    return out.select(
        "symbol",
        "ts",
        "pattern",
        "confidence",
        F.round("price_level", R).alias("price_level"),
        F.round("signal_strength", R).alias("signal_strength"),
        F.col("touches").cast("long").alias("touches"),
    ).orderBy("symbol", "ts", "pattern")


@register(
    "trend_signals",
    oracle=CANDLES_CTE
    + f"""
, ma AS (
  SELECT symbol, ts, close,
         avg(close) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)  AS ma_s,
         avg(close) OVER ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ma_l,
         lag(close, 20) OVER ({_W}) AS prev_close,
         stddev_samp(close) OVER ({_W} ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS vol,
         row_number() OVER ({_W}) AS rn
  FROM candles
),
tr AS (
  SELECT symbol, ts, close, rn, prev_close, vol,
         CASE WHEN ma_s > ma_l THEN 'up' ELSE 'down' END AS trend,
         lag(CASE WHEN ma_s > ma_l THEN 'up' ELSE 'down' END) OVER ({_W}) AS prev_trend
  FROM ma
)
SELECT symbol, ts,
       CASE WHEN trend = 'up' THEN 'uptrend' ELSE 'downtrend' END AS pattern,
       CASE WHEN least(1.0, abs(close - prev_close) / (vol * 20)) > 0.7
            THEN 'high' ELSE 'medium' END AS confidence,
       round(close, 6) AS price_level,
       round(least(1.0, abs(close - prev_close) / (vol * 20)), 6) AS signal_strength
FROM tr
WHERE rn >= 22 AND trend <> prev_trend AND vol > 0
  AND least(1.0, abs(close - prev_close) / (vol * 20)) > 0.3
ORDER BY symbol, ts
""",
    doc="P3 — trend-change detection: MA(10) vs MA(20) regime flip, "
    "strength = |Δclose over 20| / (σ·20) with σ the sample std of "
    "the 20 rows ending at the previous row, noise filter 0.3 "
    "(pattern_detection.py:351-400).",
)
def trend_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    out = P.trend_signals(c)
    return out.select(
        "symbol",
        "ts",
        "pattern",
        "confidence",
        F.round("price_level", R).alias("price_level"),
        F.round("signal_strength", R).alias("signal_strength"),
    ).orderBy("symbol", "ts")


@register(
    "breakout_signals",
    oracle=CANDLES_CTE
    + f"""
, bb AS (
  SELECT symbol, ts, close, high, low,
         avg(close) OVER ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ma,
         stddev_samp(close) OVER ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sd,
         CASE WHEN row_number() OVER ({_W}) >= 5
              THEN avg(high - low) OVER ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         END AS vp,
         row_number() OVER ({_W}) AS rn
  FROM candles
),
lagd AS (
  SELECT symbol, ts, close, rn, sd,
         ma + 2 * sd AS up_band,
         ma - 2 * sd AS lo_band,
         lag(close) OVER ({_W}) AS prev_close,
         lag(ma + 2 * sd) OVER ({_W}) AS prev_up,
         lag(ma - 2 * sd) OVER ({_W}) AS prev_lo,
         vp,
         avg(vp) OVER ({_W} ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS avg_vp
  FROM bb
)
SELECT symbol, ts,
       CASE WHEN close > up_band THEN 'breakout_up' ELSE 'breakout_down' END AS pattern,
       CASE WHEN (CASE WHEN sd = 0 THEN 1.0
                       WHEN close > up_band
                       THEN least(1.0, (close - up_band) / sd)
                       ELSE least(1.0, (lo_band - close) / sd) END) > 0.5
            THEN 'high' ELSE 'medium' END AS confidence,
       round(close, 6) AS price_level,
       round(CASE WHEN sd = 0 THEN 1.0
                  WHEN close > up_band
                  THEN least(1.0, (close - up_band) / sd)
                  ELSE least(1.0, (lo_band - close) / sd) END, 6) AS signal_strength
FROM lagd
WHERE rn >= 21
  AND ((close > up_band AND prev_close <= prev_up AND vp > avg_vp * 1.5)
    OR (close < lo_band AND prev_close >= prev_lo AND vp > avg_vp * 1.5))
ORDER BY symbol, ts
""",
    doc="P4 — Bollinger breakout with range-proxy volume confirmation: "
    "band cross vs previous bar + rolling(5) range mean above 1.5x its "
    "prior-20-row mean (pattern_detection.py:402-463); the proxy "
    "respects pandas min_periods NaN-skipping.",
)
def breakout_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    out = P.breakout_signals(c)
    return out.select(
        "symbol",
        "ts",
        "pattern",
        "confidence",
        F.round("price_level", R).alias("price_level"),
        F.round("signal_strength", R).alias("signal_strength"),
    ).orderBy("symbol", "ts")


@register(
    "microstructure",
    oracle="""
WITH ticks AS (
  SELECT event_type AS symbol,
         CAST(ts AS TIMESTAMP) AS ts,
         "value" AS last,
         0.0001 + (event_id % 10) * 0.00001 AS spread,
         CAST(event_id % 100 + 1 AS DOUBLE) * 1000 AS volume,
         CAST(event_id % 150 AS DOUBLE) AS latency_ms,
         lag("value") OVER (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_last
  FROM events
)
SELECT symbol,
       round(avg(spread), 6) AS avg_spread,
       round(stddev_samp(spread), 6) AS spread_volatility,
       round(count(*) / ((epoch(max(ts)) - epoch(min(ts))) / 60.0), 6) AS tick_frequency,
       round(avg(latency_ms), 6) AS avg_latency_ms,
       round(sum(volume), 6) AS total_volume,
       round(avg(volume), 6) AS avg_volume,
       round(stddev_samp(volume), 6) AS volume_std,
       round(avg(abs(last - prev_last) / volume) * avg(volume), 6) AS price_impact,
       round(greatest(0, 1 - avg(spread) / 0.001) * 0.4
             + least(1.0, avg(volume) / 1000000.0) * 0.3
             + 0.5 * 0.3, 6) AS liquidity_score,
       round(avg(CASE WHEN latency_ms < 50 THEN 1.0
                      WHEN latency_ms < 100 THEN 0.8
                      ELSE 0.5 END), 6) AS data_quality_score
FROM ticks
GROUP BY symbol
ORDER BY symbol
""",
    doc="A8 — microstructure metrics per symbol over a derived tick "
    "frame (deterministic spread/volume/latency from event_id): avg "
    "spread + volatility, tick frequency per minute, latency, volume "
    "profile, price impact = mean(|Δprice|/normalized volume) "
    "(= avg(|Δ|/v)·avg(v), one aggregation pass), composite liquidity "
    "score (0.4/0.3/0.3 weights, no-book default 0.5), latency-bucket "
    "quality score (premium_data_provider.py:202-285).",
)
def microstructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = e.select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.col("value").alias("last"),
        (0.0001 + (F.col("event_id") % 10) * 0.00001).alias("spread"),
        ((F.col("event_id") % 100 + 1).cast("double") * 1000).alias("volume"),
        (F.col("event_id") % 150).cast("double").alias("latency_ms"),
        F.lag("value").over(w).alias("prev_last"),
    )
    span_min = (
        F.max("ts").cast("double") - F.min("ts").cast("double")
    ) / 60.0
    spread_score = F.greatest(F.lit(0.0), 1.0 - F.avg("spread") / 0.001)
    volume_score = F.least(F.lit(1.0), F.avg("volume") / 1000000.0)
    return (
        t.groupBy("symbol")
        .agg(
            F.round(F.avg("spread"), R).alias("avg_spread"),
            F.round(F.stddev_samp("spread"), R).alias("spread_volatility"),
            F.round(F.count(F.lit(1)) / span_min, R).alias("tick_frequency"),
            F.round(F.avg("latency_ms"), R).alias("avg_latency_ms"),
            F.round(F.sum("volume"), R).alias("total_volume"),
            F.round(F.avg("volume"), R).alias("avg_volume"),
            F.round(F.stddev_samp("volume"), R).alias("volume_std"),
            F.round(
                F.avg(F.abs(F.col("last") - F.col("prev_last")) / F.col("volume"))
                * F.avg("volume"),
                R,
            ).alias("price_impact"),
            F.round(
                spread_score * 0.4 + volume_score * 0.3 + 0.5 * 0.3, R
            ).alias("liquidity_score"),
            F.round(
                F.avg(
                    F.when(F.col("latency_ms") < 50, 1.0)
                    .when(F.col("latency_ms") < 100, 0.8)
                    .otherwise(0.5)
                ),
                R,
            ).alias("data_quality_score"),
        )
        .orderBy("symbol")
    )


_FEATURE_MATRIX_CTE = f"""
, fm AS (
  SELECT symbol, ts,
         CASE WHEN lag(close) OVER ({_W}) <> 0
              THEN (close - lag(close) OVER ({_W})) / lag(close) OVER ({_W}) END AS ret_1,
         CASE WHEN lag(close, 5) OVER ({_W}) <> 0
              THEN close / lag(close, 5) OVER ({_W}) - 1.0 END AS mom_5,
         (high - low) / close AS range_frac,
         abs(close - open) / close AS body_frac,
         CAST(n_events AS DOUBLE) AS activity,
         CASE WHEN lead(close) OVER ({_W}) IS NOT NULL
              THEN lead(close) OVER ({_W}) / close - 1.0 END AS target
  FROM candles
),
aligned AS (
  SELECT * FROM fm
  WHERE ret_1 IS NOT NULL AND mom_5 IS NOT NULL AND range_frac IS NOT NULL
    AND body_frac IS NOT NULL AND activity IS NOT NULL AND target IS NOT NULL
),
st AS (
  SELECT symbol, ts, 'ret_1' AS feature, ret_1 AS x, target AS y FROM aligned
  UNION ALL
  SELECT symbol, ts, 'mom_5', mom_5, target FROM aligned
  UNION ALL
  SELECT symbol, ts, 'range_frac', range_frac, target FROM aligned
  UNION ALL
  SELECT symbol, ts, 'body_frac', body_frac, target FROM aligned
  UNION ALL
  SELECT symbol, ts, 'activity', activity, target FROM aligned
),
ranked AS (
  SELECT symbol, feature, x, y,
         rank() OVER (PARTITION BY symbol, feature ORDER BY x)
           + (count(*) OVER (PARTITION BY symbol, feature, x) - 1) / 2.0 AS rx,
         rank() OVER (PARTITION BY symbol, feature ORDER BY y)
           + (count(*) OVER (PARTITION BY symbol, feature, y) - 1) / 2.0 AS ry
  FROM st
),
agg AS (
  SELECT symbol, feature,
         count(*) AS n,
         abs(corr(x, y)) AS pearson_score,
         abs(corr(rx, ry)) AS spearman_score,
         -- f_stat from the 6dp-ROUNDED r (mirrors the Spark side):
         -- kills the 1/(1-r²) amplification of aggregation-order drift
         CASE WHEN round(corr(x, y), 6) * round(corr(x, y), 6) < 1.0
              THEN round(corr(x, y), 6) * round(corr(x, y), 6)
                   / (1.0 - round(corr(x, y), 6) * round(corr(x, y), 6))
                   * (count(*) - 2) END AS f_stat
  FROM ranked
  GROUP BY symbol, feature
  -- zero-variance guard (r14, mirrors importance_scores): a group
  -- with constant x or y has no defined correlation (DuckDB corr ->
  -- NULL; Spark corr under ANSI -> DIVIDE_BY_ZERO), so the method
  -- does not report the feature at all in either engine
  HAVING min(x) <> max(x) AND min(y) <> max(y)
),
scored AS (
  SELECT symbol, feature, n, pearson_score, spearman_score, f_stat,
         row_number() OVER (PARTITION BY symbol ORDER BY round(pearson_score, 6) DESC, feature)
           AS pearson_score_rank,
         row_number() OVER (PARTITION BY symbol ORDER BY round(spearman_score, 6) DESC, feature)
           AS spearman_score_rank,
         row_number() OVER (PARTITION BY symbol ORDER BY round(f_stat, 6) DESC, feature)
           AS f_stat_rank
  FROM agg
)
"""


_P = "PARTITION BY symbol, feature"
_MI_CTE = f"""
, mi_b AS (
  SELECT symbol, feature,
         CASE WHEN max(x) OVER ({_P}) = min(x) OVER ({_P}) THEN 0
              ELSE CAST(least(floor(((x - min(x) OVER ({_P}))
                     / (max(x) OVER ({_P}) - min(x) OVER ({_P}))) * 10.0),
                   9.0) AS BIGINT) END AS bx,
         CASE WHEN max(y) OVER ({_P}) = min(y) OVER ({_P}) THEN 0
              ELSE CAST(least(floor(((y - min(y) OVER ({_P}))
                     / (max(y) OVER ({_P}) - min(y) OVER ({_P}))) * 10.0),
                   9.0) AS BIGINT) END AS by
  FROM st
),
mi_joint AS (
  SELECT symbol, feature, bx, by, count(*) AS c
  FROM mi_b GROUP BY symbol, feature, bx, by
),
mi_t AS (
  SELECT symbol, feature,
         (CAST(c AS DOUBLE) / CAST(sum(c) OVER ({_P}) AS DOUBLE))
         * ln(CAST(c * sum(c) OVER ({_P}) AS DOUBLE)
              / CAST(sum(c) OVER ({_P}, bx) * sum(c) OVER ({_P}, by)
                     AS DOUBLE)) AS t
  FROM mi_joint
),
mi AS (
  SELECT symbol, feature, sum(t) AS mi_score
  FROM mi_t GROUP BY symbol, feature
),
mi_ranked AS (
  SELECT symbol, feature, mi_score,
         row_number() OVER (PARTITION BY symbol
             ORDER BY round(mi_score, 6) DESC, feature) AS mi_score_rank
  FROM mi
)
"""


@register(
    "mi_importance",
    oracle=CANDLES_CTE
    + _FEATURE_MATRIX_CTE
    + _MI_CTE
    + """
SELECT symbol, feature,
       round(mi_score, 6) AS mi_score,
       CAST(mi_score_rank AS INT) AS mi_score_rank
FROM mi_ranked
ORDER BY symbol, feature
""",
    doc="P7 mutual-information importance, discretized estimator "
    "(feature_importance.py:378-448): equal-width 10-bin contingency "
    "per (symbol, feature), MI = Σ p(i,j)·ln(p(i,j)/(p(i)p(j))).  "
    "floor-based binning makes every count bit-identical across "
    "engines, so unlike sklearn's kNN estimator this variant is fully "
    "oracle-checkable.  One stacked pass + one tiny contingency "
    "aggregation — scales as a single shuffle on (symbol, feature, "
    "bins).",
)
def mi_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.mutual_info_scores(c)
    return out.select(
        "symbol",
        "feature",
        F.round("mi_score", R).alias("mi_score"),
        "mi_score_rank",
    ).orderBy("symbol", "feature")


@register(
    "lasso_importance",
    oracle=golden_oracle(
        "lasso_importance",
        "feature, importance, coefficient",
        "feature",
        key_sql=events_md5_sql(),
        regen="tests/goldens/regen_importance.py",
    ),
    doc="P7 Lasso importance via pyspark.ml LinearRegression with "
    "elasticNetParam=1 (JVM L1; the container has no sklearn for the "
    "reference's LassoCV, feature_importance.py:247-314): importance "
    "= |standardized coefficient| on the pooled feature matrix.  The "
    "fit layout is pinned (_pin_fit_layout) so the model output is a "
    "pure function of (data, seed) — verified bit-identical across "
    "local[4]/local[32] at sf0.01 and sf0.1 — which makes the "
    "golden-parquet oracle (events-content-keyed, fail-fast guard) "
    "driver-hash-checkable (round 13; previously rows-only).",
)
def lasso_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.lasso_importance(c)
    return out.select(
        "feature",
        F.round("importance", R).alias("importance"),
        F.round("coefficient", R).alias("coefficient"),
    ).orderBy("feature")


@register(
    "rfe_importance",
    oracle=golden_oracle(
        "rfe_importance",
        "feature, rfe_rank, rank_score, selected",
        "feature",
        key_sql=events_md5_sql(),
        regen="tests/goldens/regen_importance.py",
    ),
    doc="P7 recursive feature elimination (reference "
    "feature_importance.py:376-448, sklearn RFE + RandomForest, "
    "step=1): iteratively drop the lowest-importance feature until "
    "n_select survive; sklearn ranking convention (selected=1, "
    "last-eliminated=2, ...), score = 1/rank.  The model-driven "
    "elimination path is not SQL-replayable, but the pinned fit "
    "layout (_pin_fit_layout) makes the output session-shape-"
    "independent, so it carries a golden-parquet oracle "
    "(events-content-keyed) the driver hash-checks (round 13).",
)
def rfe_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.rfe_importance(c)
    return out.select(
        "feature",
        F.col("rfe_rank").cast("int").alias("rfe_rank"),
        F.round("rank_score", R).alias("rank_score"),
        "selected",
    ).orderBy("feature")


@register(
    "feature_importance",
    oracle=CANDLES_CTE
    + _FEATURE_MATRIX_CTE
    + """
SELECT symbol, feature, CAST(n AS BIGINT) AS n,
       round(pearson_score, 6) AS pearson_score,
       round(spearman_score, 6) AS spearman_score,
       round(f_stat, 6) AS f_stat,
       CAST(pearson_score_rank AS INT) AS pearson_score_rank,
       CAST(spearman_score_rank AS INT) AS spearman_score_rank,
       CAST(f_stat_rank AS INT) AS f_stat_rank
FROM scored
ORDER BY symbol, feature
""",
    doc="P7/J3 — feature importance: candle features inner-aligned "
    "with the next-period-return target (the reference's index-"
    "intersection join, feature_importance.py:124-127), then |pearson|"
    ", |spearman| (average-rank ties, scipy convention), and the "
    "f_regression statistic F = r²/(1-r²)·(n-2) per (symbol, feature) "
    "with per-method ranks (feature_importance.py:69-115, 316-376).  "
    "One stacked aggregation — no per-feature passes.",
)
def feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.importance_scores(c)
    return out.select(
        "symbol",
        "feature",
        "n",
        F.round("pearson_score", R).alias("pearson_score"),
        F.round("spearman_score", R).alias("spearman_score"),
        F.round("f_stat", R).alias("f_stat"),
        "pearson_score_rank",
        "spearman_score_rank",
        "f_stat_rank",
    ).orderBy("symbol", "feature")


@register(
    "feature_importance_consensus",
    oracle=CANDLES_CTE
    + _FEATURE_MATRIX_CTE
    + _MI_CTE
    + """
, joined AS (
  SELECT s.*, m.mi_score, m.mi_score_rank
  FROM scored s JOIN mi_ranked m USING (symbol, feature)
),
norm AS (
  SELECT symbol, feature,
         (  CASE WHEN max(pearson_score) OVER (PARTITION BY symbol) > 0
                 THEN pearson_score / max(pearson_score) OVER (PARTITION BY symbol)
                 ELSE 0 END
          + CASE WHEN max(spearman_score) OVER (PARTITION BY symbol) > 0
                 THEN spearman_score / max(spearman_score) OVER (PARTITION BY symbol)
                 ELSE 0 END
          + CASE WHEN max(f_stat) OVER (PARTITION BY symbol) > 0
                 THEN f_stat / max(f_stat) OVER (PARTITION BY symbol)
                 ELSE 0 END
          + CASE WHEN max(mi_score) OVER (PARTITION BY symbol) > 0
                 THEN mi_score / max(mi_score) OVER (PARTITION BY symbol)
                 ELSE 0 END) / 4.0 AS avg_score,
         (  (max(pearson_score_rank) OVER (PARTITION BY symbol) - pearson_score_rank + 1.0)
              / max(pearson_score_rank) OVER (PARTITION BY symbol)
          + (max(spearman_score_rank) OVER (PARTITION BY symbol) - spearman_score_rank + 1.0)
              / max(spearman_score_rank) OVER (PARTITION BY symbol)
          + (max(f_stat_rank) OVER (PARTITION BY symbol) - f_stat_rank + 1.0)
              / max(f_stat_rank) OVER (PARTITION BY symbol)
          + (max(mi_score_rank) OVER (PARTITION BY symbol) - mi_score_rank + 1.0)
              / max(mi_score_rank) OVER (PARTITION BY symbol)) / 4.0 AS avg_rank
  FROM joined
)
SELECT symbol, feature,
       round(avg_score, 6) AS avg_score,
       round(avg_rank, 6) AS avg_rank,
       round((avg_score + avg_rank) / 2.0, 6) AS consensus_score,
       CAST(row_number() OVER (PARTITION BY symbol
             ORDER BY round((avg_score + avg_rank) / 2.0, 6) DESC, feature) AS INT) AS rank
FROM norm
ORDER BY symbol, rank
""",
    doc="P8/J5/T5 — consensus ranking across the four SQL-expressible "
    "methods (|pearson|, |spearman|, F-stat, discretized MI): "
    "per-method max-normalized scores + inverted normalized ranks, "
    "averaged and re-ranked (feature_importance.py:495-563; the "
    "reference's consensus endpoint averages all its methods — the "
    "pooled-model RF/Lasso tiers stay separate rows-only queries "
    "because their outputs are not per-symbol).",
)
def feature_importance_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.consensus_ranking(
        IMP.importance_scores(c), IMP.mutual_info_scores(c)
    )
    return out.select(
        "symbol",
        "feature",
        F.round("avg_score", R).alias("avg_score"),
        F.round("avg_rank", R).alias("avg_rank"),
        F.round("consensus_score", R).alias("consensus_score"),
        "rank",
    ).orderBy("symbol", "rank")


@register(
    "rf_importance",
    oracle=golden_oracle(
        "rf_importance",
        "feature, importance",
        "feature",
        key_sql=events_md5_sql(),
        regen="tests/goldens/regen_importance.py",
    ),
    doc="P7 random-forest importance via pyspark.ml "
    "RandomForestRegressor featureImportances (JVM MLlib; the "
    "container has no sklearn) on the pooled feature matrix "
    "(feature_importance.py:181-245).  The per-partition bagging "
    "seeds made this partition-layout-dependent; _pin_fit_layout "
    "pins the layout, so the output is bit-identical across session "
    "shapes and the golden-parquet oracle (events-content-keyed, "
    "fail-fast guard) is driver-hash-checkable (round 13).",
)
def rf_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.random_forest_importance(c)
    return out.select(
        "feature", F.round("importance", R).alias("importance")
    ).orderBy("feature")


def _consensus_all_oracle() -> str:
    """Hybrid oracle for the pooled six-method consensus: the three
    SQL-expressible methods (pooled |pearson|, F-stat from the
    6dp-rounded r, discretized MI) replay from events; the three
    model tiers read their golden parquets (one shared fail-fast
    events-md5 guard — the goldens regenerate together in
    regen_importance.py, so guarding one file guards all).  Every
    mean/std below is FIXED-ORDER per-row arithmetic in ALL_METHODS
    (alphabetical) order, mirroring the Spark operator expression for
    expression — no aggregation-order freedom after the score stage."""
    from ..operators.importance import ALL_METHODS

    g = {m: f"read_parquet('{GOLDEN_DIR}/{q}.parquet')" for m, q in (
        ("random_forest", "rf_importance"),
        ("lasso", "lasso_importance"),
        ("rfe", "rfe_importance"),
    )}
    _pf = "PARTITION BY feature"
    ns_cols = ",\n         ".join(
        f"max(CASE WHEN method = '{m}' THEN ns END) AS ns_{m}"
        for m in ALL_METHODS
    )
    nr_cols = ",\n         ".join(
        f"max(CASE WHEN method = '{m}' THEN nr END) AS nr_{m}"
        for m in ALL_METHODS
    )
    # fixed-order sums over the per-feature NON-NULL method count
    # (advice r13 — the reference's np.mean over methods present):
    # COALESCE(missing, 0) + divide by methods_count; with all six
    # present the divisor is the same 6.0 double as the old fixed k,
    # so every committed hash is bit-identical.  Mirrors the Spark
    # operator expression for expression.
    ns_sum = " + ".join(f"COALESCE(ns_{m}, 0.0)" for m in ALL_METHODS)
    nr_sum = " + ".join(f"COALESCE(nr_{m}, 0.0)" for m in ALL_METHODS)
    ns_var = " + ".join(
        f"COALESCE((ns_{m} - avg_score) * (ns_{m} - avg_score), 0.0)"
        for m in ALL_METHODS
    )
    nr_var = " + ".join(
        f"COALESCE((nr_{m} - avg_rank) * (nr_{m} - avg_rank), 0.0)"
        for m in ALL_METHODS
    )
    return (
        CANDLES_CTE
        + _FEATURE_MATRIX_CTE
        + f"""
, aggp AS (
  SELECT feature,
         count(*) AS n,
         abs(corr(x, y)) AS pearson_score,
         CASE WHEN round(corr(x, y), 6) * round(corr(x, y), 6) < 1.0
              THEN round(corr(x, y), 6) * round(corr(x, y), 6)
                   / (1.0 - round(corr(x, y), 6) * round(corr(x, y), 6))
                   * (count(*) - 2) END AS f_stat
  FROM st GROUP BY feature
  -- zero-variance guard (r14): see the per-symbol scores CTE
  HAVING min(x) <> max(x) AND min(y) <> max(y)
),
mip_b AS (
  SELECT feature,
         CASE WHEN max(x) OVER ({_pf}) = min(x) OVER ({_pf}) THEN 0
              ELSE CAST(least(floor(((x - min(x) OVER ({_pf}))
                     / (max(x) OVER ({_pf}) - min(x) OVER ({_pf}))) * 10.0),
                   9.0) AS BIGINT) END AS bx,
         CASE WHEN max(y) OVER ({_pf}) = min(y) OVER ({_pf}) THEN 0
              ELSE CAST(least(floor(((y - min(y) OVER ({_pf}))
                     / (max(y) OVER ({_pf}) - min(y) OVER ({_pf}))) * 10.0),
                   9.0) AS BIGINT) END AS by
  FROM st
),
mip_joint AS (
  SELECT feature, bx, by, count(*) AS c
  FROM mip_b GROUP BY feature, bx, by
),
mip_t AS (
  SELECT feature,
         (CAST(c AS DOUBLE) / CAST(sum(c) OVER ({_pf}) AS DOUBLE))
         * ln(CAST(c * sum(c) OVER ({_pf}) AS DOUBLE)
              / CAST(sum(c) OVER ({_pf}, bx) * sum(c) OVER ({_pf}, by)
                     AS DOUBLE)) AS t
  FROM mip_joint
),
mip AS (
  SELECT feature, sum(t) AS mi_score FROM mip_t GROUP BY feature
),
gkey AS (
  SELECT CASE WHEN f IN (SELECT DISTINCT corpus_md5
                         FROM {g['random_forest']}) THEN f
         ELSE error('consensus_all_methods: no golden slice for this '
                    || 'corpus (events md5 ' || f
                    || ') -- run tests/goldens/regen_importance.py') END
         AS f
  FROM ({events_md5_sql()})
),
meth AS (
  SELECT 'correlation' AS method, feature, round(pearson_score, 6) AS s
  FROM aggp
  UNION ALL
  SELECT 'f_statistic', feature, round(f_stat, 6) FROM aggp
  UNION ALL
  SELECT 'mutual_info', feature, round(mi_score, 6) FROM mip
  UNION ALL
  SELECT 'random_forest', feature, round(importance, 6)
  FROM {g['random_forest']} WHERE corpus_md5 = (SELECT f FROM gkey)
  UNION ALL
  SELECT 'lasso', feature, round(importance, 6)
  FROM {g['lasso']} WHERE corpus_md5 = (SELECT f FROM gkey)
  UNION ALL
  SELECT 'rfe', feature, round(rank_score, 6)
  FROM {g['rfe']} WHERE corpus_md5 = (SELECT f FROM gkey)
),
normed AS (
  SELECT method, feature,
         CASE WHEN max(s) OVER (PARTITION BY method) > 0
              THEN s / max(s) OVER (PARTITION BY method)
              ELSE 0.0 END AS ns,
         (CAST(count(*) OVER (PARTITION BY method) AS DOUBLE)
            - row_number() OVER (PARTITION BY method
                                 ORDER BY s DESC, feature) + 1.0)
           / count(*) OVER (PARTITION BY method) AS nr
  FROM meth WHERE s IS NOT NULL
),
pv AS (
  SELECT feature,
         {ns_cols},
         {nr_cols},
         count(*) AS methods_count
  FROM normed GROUP BY feature
),
fin AS (
  SELECT feature,
         ({ns_sum}) / CAST(methods_count AS DOUBLE) AS avg_score,
         ({nr_sum}) / CAST(methods_count AS DOUBLE) AS avg_rank,
         methods_count
  FROM pv
),
fin2 AS (
  SELECT f.feature, f.avg_score, f.avg_rank,
         (f.avg_score + f.avg_rank) / 2.0 AS consensus_score,
         f.methods_count,
         sqrt(({ns_var}) / CAST(f.methods_count AS DOUBLE)) AS score_std,
         sqrt(({nr_var}) / CAST(f.methods_count AS DOUBLE)) AS rank_std
  FROM fin f JOIN pv USING (feature)
)
SELECT feature,
       round(avg_score, 6) AS avg_score,
       round(avg_rank, 6) AS avg_rank,
       round(consensus_score, 6) AS consensus_score,
       CAST(methods_count AS INT) AS methods_count,
       round(score_std, 6) AS score_std,
       round(rank_std, 6) AS rank_std,
       CAST(row_number() OVER (
            ORDER BY round(consensus_score, 6) DESC, feature) AS INT)
         AS rank
FROM fin2
ORDER BY rank
"""
    )


@register(
    "consensus_all_methods",
    oracle=_consensus_all_oracle(),
    doc="P8 — the reference's POOLED all-methods consensus endpoint "
    "(advanced_features.py:230-372 → feature_importance.py:495-563): "
    "all six methods (correlation, f_statistic, mutual_info, "
    "random_forest, lasso, rfe) on ONE pooled feature matrix, "
    "per-method max-normalized scores + inverted normalized ranks "
    "averaged, with methods_count and the np.std population spreads. "
    " Completes the consensus fidelity beside the per-symbol 4-method "
    "`feature_importance_consensus` (r12 verdict Missing #1).  The "
    "model tiers reuse the pinned-layout deterministic fits, so the "
    "oracle replays them from the golden parquets while the SQL "
    "methods replay from events — the whole face is driver-hash-"
    "checked.",
)
def consensus_all_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    out = IMP.consensus_all_methods(c)
    return out.select(
        "feature",
        F.round("avg_score", R).alias("avg_score"),
        F.round("avg_rank", R).alias("avg_rank"),
        F.round("consensus_score", R).alias("consensus_score"),
        "methods_count",
        F.round("score_std", R).alias("score_std"),
        F.round("rank_std", R).alias("rank_std"),
        "rank",
    ).orderBy("rank")


@register(
    "confident_patterns",
    oracle=CANDLES_CTE
    + _PATTERNS_BASE
    + """
SELECT * FROM (
  SELECT symbol, ts, 'doji' AS pattern,
         CASE WHEN body_ratio <= 0.05 THEN 'high' ELSE 'medium' END AS confidence,
         round(close, 6) AS price_level
  FROM feat WHERE rng > 0 AND body_ratio <= 0.1
  UNION ALL
  SELECT symbol, ts, 'hammer',
         CASE WHEN lower_ratio >= 0.7 THEN 'high' ELSE 'medium' END,
         round(close, 6)
  FROM feat
  WHERE rng > 0 AND body > 0 AND lower_ratio >= 0.6 AND body_ratio <= 0.3
    AND upper_ratio <= 0.1 AND p_c < p_o
) u
WHERE confidence = 'high'
ORDER BY symbol, ts, pattern
""",
    doc="F10 — confidence filter over pattern signals: keep only "
    "high-confidence detections (pattern_detection.py:484-504).",
)
def confident_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    out = P.detect_patterns(c)
    return (
        out.filter(
            F.col("pattern").isin("doji", "hammer")
            & (F.col("confidence") == "high")
        )
        .select(
            "symbol",
            "ts",
            "pattern",
            "confidence",
            F.round("price_level", R).alias("price_level"),
        )
        .orderBy("symbol", "ts", "pattern")
    )


@register(
    "recent_signals",
    oracle=CANDLES_CTE
    + _PATTERNS_BASE
    + """
SELECT symbol, ts, pattern FROM (
  SELECT symbol, ts, pattern,
         row_number() OVER (PARTITION BY symbol ORDER BY ts DESC, pattern) AS rn
  FROM (
    SELECT symbol, ts, 'doji' AS pattern
    FROM feat WHERE rng > 0 AND body_ratio <= 0.1
    UNION ALL
    SELECT symbol, ts, 'bullish_engulfing'
    FROM feat
    WHERE p_c < p_o AND close > open AND open < p_c AND close > p_o AND body > p_body
    UNION ALL
    SELECT symbol, ts, 'bearish_engulfing'
    FROM feat
    WHERE p_c > p_o AND close < open AND open > p_c AND close < p_o AND body > p_body
  ) u
) t
WHERE rn <= 10
ORDER BY symbol, ts DESC, pattern
""",
    doc="T4 — recent-N pattern signals: latest 10 detections per symbol "
    "(pattern_detection.py:520-526); ranked window, no global sort.",
)
def recent_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = candles_from_events(spark, sf_dir)
    out = P.detect_patterns(c).filter(
        F.col("pattern").isin("doji", "bullish_engulfing", "bearish_engulfing")
    )
    w = Window.partitionBy("symbol").orderBy(F.desc("ts"), F.asc("pattern"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("symbol", "ts", "pattern")
        .orderBy("symbol", F.desc("ts"), "pattern")
    )


@register(
    "feature_stats",
    oracle=CANDLES_CTE
    + _FEATURE_MATRIX_CTE.split(",\nst AS")[0]
    + """
SELECT 'ret_1' AS feature, count(ret_1) AS n_non_null,
       round(min(ret_1), 6) AS min_v, round(max(ret_1), 6) AS max_v,
       round(avg(ret_1), 6) AS mean_v, round(stddev_samp(ret_1), 6) AS std_v
FROM aligned
UNION ALL
SELECT 'mom_5', count(mom_5), round(min(mom_5), 6), round(max(mom_5), 6),
       round(avg(mom_5), 6), round(stddev_samp(mom_5), 6) FROM aligned
UNION ALL
SELECT 'range_frac', count(range_frac), round(min(range_frac), 6),
       round(max(range_frac), 6), round(avg(range_frac), 6),
       round(stddev_samp(range_frac), 6) FROM aligned
ORDER BY feature
""",
    doc="A10 — per-feature stats/validation pass: non-null counts, "
    "min/max/mean/std over the aligned feature matrix "
    "(feature_engineer.py:345-394).",
)
def feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import importance as IMP

    c = candles_from_events(spark, sf_dir)
    m = IMP.feature_matrix(c)
    rows = []
    for f_ in ("ret_1", "mom_5", "range_frac"):
        rows.append(
            m.agg(
                F.lit(f_).alias("feature"),
                F.count(f_).alias("n_non_null"),
                F.round(F.min(f_), R).alias("min_v"),
                F.round(F.max(f_), R).alias("max_v"),
                F.round(F.avg(f_), R).alias("mean_v"),
                F.round(F.stddev_samp(f_), R).alias("std_v"),
            )
        )
    out = rows[0]
    for r_ in rows[1:]:
        out = out.unionByName(r_)
    return out.orderBy("feature")


@register(
    "premium_stats",
    oracle="""
SELECT source,
       count(*) AS n_ticks,
       round(avg(latency_ms), 6) AS avg_latency_ms,
       round(avg(spread), 6) AS avg_spread,
       CAST(count(*) FILTER (WHERE latency_ms < 50) AS BIGINT) AS n_institutional
FROM (
  SELECT CASE CAST(event_id % 3 AS INT)
              WHEN 0 THEN 'polygon' WHEN 1 THEN 'fxcm' ELSE 'simulated' END AS source,
         CAST(event_id % 150 AS DOUBLE) AS latency_ms,
         0.0001 + (event_id % 10) * 0.00001 AS spread
  FROM events
) t
GROUP BY source
ORDER BY source
""",
    doc="A11 — premium-source stats: per-source tick counts, latency and "
    "spread means, institutional-grade (sub-50ms) counts "
    "(app/api/premium_data.py:353-417) over the derived tick frame.",
)
def premium_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    src = (
        F.when(F.col("event_id") % 3 == 0, "polygon")
        .when(F.col("event_id") % 3 == 1, "fxcm")
        .otherwise("simulated")
    )
    t = e.select(
        src.alias("source"),
        (F.col("event_id") % 150).cast("double").alias("latency_ms"),
        (0.0001 + (F.col("event_id") % 10) * 0.00001).alias("spread"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(F.avg("latency_ms"), R).alias("avg_latency_ms"),
            F.round(F.avg("spread"), R).alias("avg_spread"),
            F.count_if(F.col("latency_ms") < 50).alias("n_institutional"),
        )
        .orderBy("source")
    )
