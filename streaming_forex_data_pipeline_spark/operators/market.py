"""Market-context features (SURVEY §2.6, X-series).

Pure scalar Column expressions over the event-time column — zero
shuffle, fused into whatever projection precedes them.
Reference: app/services/preprocessing/market_filters.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed UTC session hours (market_filters.py:30-44). Sydney wraps
# midnight (22-07).
SESSIONS = {
    "sydney": (22, 7),
    "tokyo": (0, 9),
    "london": (8, 17),
    "new_york": (13, 22),
}

# Session weights + overlap bonuses for the liquidity score
# (market_filters.py:233-270).
SESSION_WEIGHTS = {"sydney": 0.2, "tokyo": 0.4, "london": 0.8, "new_york": 0.9}
OVERLAP_BONUS = {
    ("london", "new_york"): 0.5,
    ("sydney", "tokyo"): 0.2,
    ("tokyo", "london"): 0.3,
}


def in_session(hour: Column, start: int, end: int) -> Column:
    """X1 — session membership incl. midnight wrap
    (market_filters.py:272-287).  End-INCLUSIVE like pandas .between."""
    if start <= end:
        return (hour >= start) & (hour <= end)
    return (hour >= start) | (hour <= end)


def session_flags(ts: str = "ts") -> dict[str, Column]:
    """X1 — is_<session> boolean flags (market_filters.py:100-121)."""
    h = F.hour(ts)
    return {
        f"is_{name}": in_session(h, s, e).cast("int")
        for name, (s, e) in SESSIONS.items()
    }


def overlap_flags(ts: str = "ts") -> dict[str, Column]:
    """X2 — pairwise session overlaps + active-session count
    (market_filters.py:116-137)."""
    flags = session_flags(ts)
    out = {}
    for (a, b), _bonus in OVERLAP_BONUS.items():
        out[f"overlap_{a}_{b}"] = (
            (flags[f"is_{a}"] == 1) & (flags[f"is_{b}"] == 1)
        ).cast("int")
    out["active_sessions"] = sum(flags.values())
    return out


def calendar_features(ts: str = "ts") -> dict[str, Column]:
    """X3/X4 — calendar + weekend features (market_filters.py:186-215).
    day_of_week is ISO Monday=0..Sunday=6 like pandas .dt.dayofweek."""
    dow = (F.dayofweek(ts) + 5) % 7  # Spark: Sun=1..Sat=7 → Mon=0..Sun=6
    return {
        "hour": F.hour(ts),
        "day": F.dayofmonth(ts),
        "month": F.month(ts),
        "quarter": F.quarter(ts),
        "day_of_week": dow,
        "is_weekend": (dow >= 5).cast("int"),
        "is_friday": (dow == 4).cast("int"),
    }


def cyclical_encodings(ts: str = "ts") -> dict[str, Column]:
    """X5 — sin/cos encodings of hour/day/month
    (market_filters.py:218-223)."""
    two_pi = 2.0 * math.pi
    h = F.hour(ts).cast("double")
    d = F.dayofmonth(ts).cast("double")
    m = F.month(ts).cast("double")
    return {
        "hour_sin": F.sin(two_pi * h / 24.0),
        "hour_cos": F.cos(two_pi * h / 24.0),
        "day_sin": F.sin(two_pi * d / 31.0),
        "day_cos": F.cos(two_pi * d / 31.0),
        "month_sin": F.sin(two_pi * m / 12.0),
        "month_cos": F.cos(two_pi * m / 12.0),
    }


def time_of_day_bucket(ts: str = "ts") -> Column:
    """X6 — night/morning/afternoon/evening (market_filters.py:226-229)."""
    h = F.hour(ts)
    return (
        F.when(h < 6, "night")
        .when(h < 12, "morning")
        .when(h < 18, "afternoon")
        .when(h < 22, "evening")
        .otherwise("night")  # hours 22-23 fall back to night (ref :226-229)
    )


def liquidity_score(ts: str = "ts") -> Column:
    """X7 — weighted session flags + overlap bonuses, normalized by the
    theoretical max (market_filters.py:233-270)."""
    flags = session_flags(ts)
    overlaps = overlap_flags(ts)
    raw = F.lit(0.0)
    for name, wgt in SESSION_WEIGHTS.items():
        raw = raw + flags[f"is_{name}"] * F.lit(wgt)
    for (a, b), bonus in OVERLAP_BONUS.items():
        raw = raw + overlaps[f"overlap_{a}_{b}"] * F.lit(bonus)
    # max attainable: london+new_york sessions plus their overlap bonus
    # (0.8 + 0.9 + 0.5 = 2.2, reached at hours 13-17 with inclusive bounds)
    max_score = (
        SESSION_WEIGHTS["london"]
        + SESSION_WEIGHTS["new_york"]
        + OVERLAP_BONUS[("london", "new_york")]
    )
    return raw / F.lit(max_score)


def liquidity_level(score: Column) -> Column:
    """X7 — bucket {low, medium, high, very_high}
    (market_filters.py:262-270)."""
    return (
        F.when(score >= 0.8, "very_high")
        .when(score >= 0.6, "high")
        .when(score >= 0.3, "medium")
        .otherwise("low")
    )
