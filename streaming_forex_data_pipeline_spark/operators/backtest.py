"""Signal generation (P5) + backtest simulation (P6) + portfolio
metrics (A9).

Reference: app/services/analysis/backtesting_engine.py.
- Signals (SMA/RSI/MACD cross strategies, :178-274) are pure lag-window
  Column algebra — `generate_signals` loops vectorized away.
- The position-state event loop (:284-379) is inherently sequential per
  symbol -> sanctioned `applyInPandas` kernel (SURVEY §2.13); symbols
  parallelize across executors.
- Metrics (:79-160, :441-467) are computed from the ordered trade list
  inside the same kernel, exactly as the reference derives them from
  BacktestResult.

Faithful quirks preserved:
- `if trade.pnl:` truthiness — a trade with pnl == 0.0 does NOT update
  capital (:339-341, :365-367).
- Sharpe subtracts a 2.0 "annual %" risk-free rate from per-trade mean
  return and uses population std (np.std, :131-149).
- profit_factor is +inf when gross_loss == 0 and gross_profit > 0
  (:151-160).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from . import indicators as I


def _cross_signal(fast: Column, slow: Column, w: Window) -> Column:
    """+1 on upward cross, -1 on downward cross, else 0; null windows
    (min_periods warm-up) compare to NULL -> no signal, matching pandas
    NaN comparisons being False."""
    p_fast, p_slow = F.lag(fast).over(w), F.lag(slow).over(w)
    return (
        F.when((fast > slow) & (p_fast <= p_slow), 1)
        .when((fast < slow) & (p_fast >= p_slow), -1)
        .otherwise(0)
    )


def sma_cross_signals(
    df: DataFrame, fast: int = 10, slow: int = 20,
    symbol: str = "symbol", ts: str = "ts",
) -> DataFrame:
    """P5 — SMA fast/slow cross strategy (backtesting_engine.py:178-203)."""
    w = Window.partitionBy(symbol).orderBy(ts)
    f_ma = I.sma("close", fast)
    s_ma = I.sma("close", slow)
    return df.withColumn("signal", _cross_signal(f_ma, s_ma, w))


def rsi_rolling(
    df: DataFrame, period: int = 14, symbol: str = "symbol", ts: str = "ts"
) -> Column:
    """W3 rolling-mean RSI variant used by the RSI strategy
    (backtesting_engine.py:213-221) — distinct from the EMA-smoothed
    feature_engineer variant.  pandas: the leading NaN diff maps to 0
    via .where (NaN > 0 is False), so gain/loss rolling(period).mean()
    is valid from row ``period`` on."""
    w = Window.partitionBy(symbol).orderBy(ts)
    frame = w.rowsBetween(-(period - 1), 0)
    delta = F.col("close") - F.lag("close").over(w)
    gain = F.when(delta > 0, delta).otherwise(0.0)
    loss = F.when(delta < 0, -delta).otherwise(0.0)
    guard = F.row_number().over(w) >= period
    avg_gain = F.when(guard, F.avg(gain).over(frame))
    avg_loss = F.when(guard, F.avg(loss).over(frame))
    # rsi = 100 - 100/(1+rs) == 100*g/(g+l); l=0 -> 100 (pandas inf path)
    return F.when(
        avg_gain + avg_loss != 0, 100.0 * avg_gain / (avg_gain + avg_loss)
    )


def rsi_exit_signals(
    df: DataFrame, period: int = 14, oversold: float = 30.0,
    overbought: float = 70.0, symbol: str = "symbol", ts: str = "ts",
) -> DataFrame:
    """P5 — RSI leaves-oversold buy / leaves-overbought sell
    (backtesting_engine.py:224-248)."""
    w = Window.partitionBy(symbol).orderBy(ts)
    rsi = rsi_rolling(df, period, symbol, ts)
    out = df.withColumn("__rsi", rsi)
    p = F.lag("__rsi").over(w)
    sig = (
        F.when((F.col("__rsi") > oversold) & (p <= oversold), 1)
        .when((F.col("__rsi") < overbought) & (p >= overbought), -1)
        .otherwise(0)
    )
    return out.withColumn("signal", sig).drop("__rsi")


def macd_cross_signals(
    df: DataFrame, fast: int = 12, slow: int = 26, signal: int = 9,
    symbol: str = "symbol", ts: str = "ts",
) -> DataFrame:
    """P5 — MACD-line/signal-line crossover strategy
    (backtesting_engine.py:239-274 MACDStrategy.generate_signals):
    +1 when the MACD line crosses above its signal line, -1 below.
    The lines come from the JVM-side fold tier
    (operators/ewm.py:macd_native) rather than the pandas kernel, so
    the crossover booleans are bit-reproducible against the fold-replay
    oracle — a kernel-vs-SQL 1-ulp difference at a near-tie would
    otherwise flip a signal and cascade through the whole backtest
    ledger."""
    from .ewm import macd_native

    w = Window.partitionBy(symbol).orderBy(ts)
    lines = macd_native(
        df, fast=fast, slow=slow, signal=signal, symbol=symbol, ts=ts
    )
    sig = lines.select(
        symbol,
        ts,
        _cross_signal(F.col("macd"), F.col("macd_signal"), w).alias(
            "signal"
        ),
    )
    # join the signal back so callers keep every input column (the
    # backtest needs close); equi-join on the (symbol, ts) key
    return df.join(sig, [symbol, ts])


#: one output row per symbol with the full A9 metric set
METRICS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("total_trades", LongType()),
        StructField("winning_trades", LongType()),
        StructField("losing_trades", LongType()),
        StructField("win_rate", DoubleType()),
        StructField("total_pnl", DoubleType()),
        StructField("final_capital", DoubleType()),
        StructField("total_return", DoubleType()),
        StructField("max_drawdown", DoubleType()),
        StructField("sharpe_ratio", DoubleType()),
        StructField("profit_factor", DoubleType()),
        StructField("max_consecutive_wins", LongType()),
        StructField("max_consecutive_losses", LongType()),
    ]
)

TRADES_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("entry_time", TimestampType()),
        StructField("exit_time", TimestampType()),
        StructField("entry_price", DoubleType()),
        StructField("exit_price", DoubleType()),
        StructField("trade_type", StringType()),
        StructField("size", DoubleType()),
        StructField("commission", DoubleType()),
        StructField("pnl", DoubleType()),
        StructField("return_pct", DoubleType()),
    ]
)


def _pin(x: float, scale: float) -> float:
    """Snap ``x`` to a 1/scale grid with floor(x*s + 0.5) — the
    engine-portable quantizer (DuckDB ``floor`` mirrors ``math.floor``
    bit-for-bit on identical doubles, unlike ``round`` whose half-way
    semantics differ between Spark's BigDecimal path and DuckDB's
    binary scaling).  Also normalizes -0.0 to 0.0."""
    return math.floor(x * scale + 0.5) / scale


def _pin2(x: float) -> float:
    return _pin(x, 100.0)


def _pin6(x: float) -> float:
    return _pin(x, 1000000.0)


def simulate(
    pdf: pd.DataFrame,
    initial_capital: float = 10000.0,
    commission: float = 0.0001,
    max_positions: int = 1,
    pin_grid: bool = False,
) -> tuple[list[dict], float]:
    """The reference event loop (backtesting_engine.py:284-379) over one
    symbol's (ts, close, signal) frame.  Plain-Python state machine —
    runs inside the applyInPandas kernel, also callable directly by the
    differential tests.

    ``pin_grid=True`` snaps the capital path to a cent grid and every
    money column to a 1e-6 grid after each update, so the recurrence is
    bit-reproducible across engines (the registered oracle replays the
    identical pinned arithmetic).  Default keeps the reference's raw
    IEEE recurrence.
    """
    capital = initial_capital
    open_trades: list[dict] = []
    closed: list[dict] = []
    rows = list(pdf.itertuples(index=False))

    def close_trade(t: dict, ts, price: float) -> None:
        nonlocal capital
        t["exit_time"], t["exit_price"] = ts, price
        if pin_grid:
            t["commission"] = _pin6(t["commission"] + _pin6(t["size"] * commission))
            direction = 1.0 if t["trade_type"] == "buy" else -1.0
            pnl = _pin6(
                direction * (price - t["entry_price"]) * t["size"] - t["commission"]
            )
            t["return_pct"] = _pin6(
                direction * (price - t["entry_price"]) / t["entry_price"] * 100.0
            )
        else:
            t["commission"] += t["size"] * commission
            pnl = _pnl(t)
            t["return_pct"] = _return_pct(t)
        t["pnl"] = pnl
        if pnl:  # truthiness quirk: pnl == 0.0 skips the update
            capital = _pin2(capital + pnl) if pin_grid else capital + pnl

    for row in rows:
        price, signal = float(row.close), int(row.signal)
        if signal != 0 and len(open_trades) < max_positions:
            size = _pin2(capital * 0.1) if pin_grid else capital * 0.1
            leg = _pin6(size * commission) if pin_grid else size * commission
            open_trades.append(
                {
                    "entry_time": row.ts,
                    "entry_price": price,
                    "trade_type": "buy" if signal > 0 else "sell",
                    "size": size,
                    "commission": leg,
                }
            )
            capital = _pin2(capital - leg) if pin_grid else capital - leg

        to_close = []
        for t in open_trades:
            close_it = (
                (t["trade_type"] == "buy" and signal < 0)
                or (t["trade_type"] == "sell" and signal > 0)
                or (t["trade_type"] == "buy" and price <= t["entry_price"] * 0.95)
                or (t["trade_type"] == "sell" and price >= t["entry_price"] * 1.05)
            )
            if close_it:
                close_trade(t, row.ts, price)
                to_close.append(t)
        for t in to_close:
            open_trades.remove(t)
            closed.append(t)

    if rows:
        last = rows[-1]
        for t in open_trades:
            close_trade(t, last.ts, float(last.close))
            closed.append(t)
    return closed, capital


def _pnl(t: dict) -> float:
    direction = 1.0 if t["trade_type"] == "buy" else -1.0
    gross = direction * (t["exit_price"] - t["entry_price"]) * t["size"]
    return gross - t["commission"]


def _return_pct(t: dict) -> float:
    direction = 1.0 if t["trade_type"] == "buy" else -1.0
    return direction * (t["exit_price"] - t["entry_price"]) / t["entry_price"] * 100.0


def _streak(pnls: list, pred) -> int:
    best = cur = 0
    for p in pnls:
        if p and pred(p):
            cur += 1
            best = max(best, cur)
        else:
            cur = 0
    return best


def metrics_from_trades_pinned(
    trades: list[dict], final_capital: float, initial_capital: float = 10000.0
) -> dict:
    """A9 metrics derived with engine-portable arithmetic from a
    ``simulate(pin_grid=True)`` trade list: every aggregate is built
    from exact integer-scaled sums (pnl/ret × 1e6 are exact integers,
    totals stay far below 2^53), so the result is bit-identical no
    matter which engine — or in which order — performs the summation.
    Mirrored 1:1 by the registered DuckDB oracle."""
    pnl_s = [math.floor(t["pnl"] * 1000000.0 + 0.5) for t in trades]
    ret_s = [math.floor(t["return_pct"] * 1000000.0 + 0.5) for t in trades]
    n = len(trades)
    wins = sum(1 for p in pnl_s if p > 0)
    losses = sum(1 for p in pnl_s if p < 0)

    cap_s = 10000000000  # initial capital on the 1e-6 grid, exact int
    peak_s, max_dd = cap_s, 0.0
    for p in pnl_s:
        cap_s += p
        peak_s = max(peak_s, cap_s)
        max_dd = max(max_dd, (peak_s - cap_s) / peak_s * 100.0)

    if n >= 2:
        m1 = sum(ret_s) / n
        m2 = sum(r * r for r in ret_s) / n
        std6 = math.sqrt(max(m2 - m1 * m1, 0.0)) / 1000000.0
        sharpe = (m1 / 1000000.0 - 2.0) / std6 if std6 != 0.0 else 0.0
    else:
        sharpe = 0.0

    gp_s = sum(p for p in pnl_s if p > 0)
    gl_s = -sum(p for p in pnl_s if p < 0)
    if gl_s == 0:
        profit_factor = float("inf") if gp_s > 0 else 0.0
    else:
        profit_factor = gp_s / gl_s

    return {
        "total_trades": n,
        "winning_trades": wins,
        "losing_trades": losses,
        "win_rate": (wins / n * 100.0) if n else 0.0,
        "total_pnl": sum(pnl_s) / 1000000.0,
        "final_capital": final_capital,
        "total_return": (final_capital - initial_capital) / initial_capital * 100.0,
        "max_drawdown": max_dd,
        "sharpe_ratio": sharpe,
        "profit_factor": profit_factor,
        "max_consecutive_wins": _streak(pnl_s, lambda p: p > 0),
        "max_consecutive_losses": _streak(pnl_s, lambda p: p < 0),
    }


def metrics_from_trades(
    trades: list[dict], final_capital: float, initial_capital: float = 10000.0
) -> dict:
    """A9 — derive the BacktestResult metric set from the ordered trade
    list (backtesting_engine.py:79-160, 441-467)."""
    import numpy as np

    pnls = [_pnl(t) for t in trades]
    n = len(trades)
    wins = sum(1 for p in pnls if p > 0)
    losses = sum(1 for p in pnls if p < 0)

    curve = [initial_capital]
    running = initial_capital
    for p in pnls:
        running += p
        curve.append(running)
    peak, max_dd = curve[0], 0.0
    for cap in curve:
        peak = max(peak, cap)
        max_dd = max(max_dd, (peak - cap) / peak * 100.0)

    rets = [_return_pct(t) for t in trades]
    if len(rets) >= 2 and float(np.std(rets)) != 0.0:
        sharpe = (float(np.mean(rets)) - 2.0) / float(np.std(rets))
    else:
        sharpe = 0.0

    gross_profit = sum(p for p in pnls if p > 0)
    gross_loss = abs(sum(p for p in pnls if p < 0))
    if gross_loss == 0:
        profit_factor = float("inf") if gross_profit > 0 else 0.0
    else:
        profit_factor = gross_profit / gross_loss

    def streak(pred) -> int:
        best = cur = 0
        for p in pnls:
            if p and pred(p):
                cur += 1
                best = max(best, cur)
            else:
                cur = 0
        return best

    return {
        "total_trades": n,
        "winning_trades": wins,
        "losing_trades": losses,
        "win_rate": (wins / n * 100.0) if n else 0.0,
        "total_pnl": float(sum(pnls)),
        "final_capital": final_capital,
        "total_return": (final_capital - initial_capital) / initial_capital * 100.0,
        "max_drawdown": max_dd,
        "sharpe_ratio": sharpe,
        "profit_factor": profit_factor,
        "max_consecutive_wins": streak(lambda p: p > 0),
        "max_consecutive_losses": streak(lambda p: p < 0),
    }


def backtest_trades(
    signals_df: DataFrame, pin_grid: bool = False, max_positions: int = 1
) -> DataFrame:
    """P6 — closed-trade ledger, one applyInPandas kernel per symbol.
    ``max_positions`` is the reference's concurrent-position capacity
    (backtesting_engine.py:284 run_backtest arg): entries are skipped
    while the open list is full; each open trade is exit-scanned every
    row."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        sym = pdf["symbol"].iloc[0] if len(pdf) else None
        closed, _cap = simulate(
            pdf, pin_grid=pin_grid, max_positions=max_positions
        )
        return pd.DataFrame(
            [
                {
                    "symbol": sym,
                    "entry_time": t["entry_time"],
                    "exit_time": t["exit_time"],
                    "entry_price": t["entry_price"],
                    "exit_price": t["exit_price"],
                    "trade_type": t["trade_type"],
                    "size": t["size"],
                    "commission": t["commission"],
                    "pnl": t["pnl"],
                    "return_pct": t["return_pct"],
                }
                for t in closed
            ],
            columns=[f.name for f in TRADES_SCHEMA.fields],
        )

    narrow = signals_df.select("symbol", "ts", "close", "signal")
    return narrow.groupBy("symbol").applyInPandas(kernel, TRADES_SCHEMA)


def backtest_metrics(signals_df: DataFrame, pin_grid: bool = False) -> DataFrame:
    """P6+A9 — per-symbol metrics row from the simulated trade list."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        sym = pdf["symbol"].iloc[0] if len(pdf) else None
        closed, cap = simulate(pdf, pin_grid=pin_grid)
        derive = metrics_from_trades_pinned if pin_grid else metrics_from_trades
        m = derive(closed, cap)
        m["symbol"] = sym
        return pd.DataFrame([m], columns=[f.name for f in METRICS_SCHEMA.fields])

    narrow = signals_df.select("symbol", "ts", "close", "signal")
    return narrow.groupBy("symbol").applyInPandas(kernel, METRICS_SCHEMA)
