"""Provider payload adapters (S4 Alpha Vantage, S5 Polygon), F12
date-range validation, and S11 retention tests — deterministic fake
payloads, no network."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.sources import providers as P
from streaming_forex_data_pipeline_spark.sources import sinks as S


def _av_payload():
    return json.dumps(
        {
            "Meta Data": {
                "1. Information": "Forex Daily Prices",
                "2. From Symbol": "EUR",
                "3. To Symbol": "USD",
            },
            P.AV_SERIES_KEY_DAILY: {
                "2024-01-02": {
                    "1. open": "1.1000",
                    "2. high": "1.1100",
                    "3. low": "1.0900",
                    "4. close": "1.1050",
                },
                "2024-01-03": {
                    "1. open": "1.1050",
                    "2. high": "1.1200",
                    "3. low": "1.1000",
                    "4. close": "1.1150",
                },
            },
        }
    )


def test_parse_alpha_vantage(spark):
    df = spark.createDataFrame(
        [("EURUSD", _av_payload())], ["symbol", "payload"]
    )
    out = P.parse_alpha_vantage(df).orderBy("ts")
    assert out.columns == ["symbol", "ts", "open", "high", "low", "close", "volume"]
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["symbol"] == "EURUSD"
    assert rows[0]["ts"] == dt.datetime(2024, 1, 2)
    assert rows[0]["open"] == pytest.approx(1.10)
    assert rows[0]["close"] == pytest.approx(1.105)
    assert rows[0]["volume"] == 0.0  # FX responses carry no volume
    assert rows[1]["high"] == pytest.approx(1.12)


def test_parse_alpha_vantage_malformed_is_dropped(spark):
    df = spark.createDataFrame(
        [("EURUSD", "{not json"), ("GBPUSD", json.dumps({"Meta Data": {}}))],
        ["symbol", "payload"],
    )
    # no series key anywhere -> zero candle rows, no exception
    assert P.parse_alpha_vantage(df).count() == 0


def test_parse_alpha_vantage_indicator(spark):
    """S4 sibling (alpha_vantage_client.py:148-175): the economic-
    indicator `{'data': [{date, value}]}` shape — empty and
    non-numeric ('.') values become NULL, a payload without 'data'
    parses to zero rows, malformed JSON never raises."""
    good = json.dumps(
        {
            "name": "Real GDP",
            "interval": "annual",
            "unit": "billions of dollars",
            "data": [
                {"date": "2023-01-01", "value": "27360.935"},
                {"date": "2022-01-01", "value": "25744.108"},
                {"date": "2021-01-01", "value": ""},
                {"date": "2020-01-01", "value": "."},
            ],
        }
    )
    df = spark.createDataFrame(
        [(good,), ("{not json",), (json.dumps({"name": "CPI"}),)],
        ["payload"],
    )
    out = P.parse_alpha_vantage_indicator(df).orderBy("ts")
    assert out.columns == ["indicator", "date", "value", "ts"]
    rows = out.collect()
    assert len(rows) == 4  # only the well-formed response yields rows
    assert {r["indicator"] for r in rows} == {"Real GDP"}
    assert rows[0]["date"] == "2020-01-01"
    assert rows[0]["value"] is None  # '.' placeholder -> NULL
    assert rows[1]["value"] is None  # empty string -> NULL
    assert rows[3]["value"] == pytest.approx(27360.935)
    assert rows[3]["ts"] == dt.datetime(2023, 1, 1)


def _polygon_payload():
    t0 = int(dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc).timestamp() * 1000)
    return json.dumps(
        {
            "ticker": "C:EURUSD",
            "status": "OK",
            "results": [
                {
                    "t": t0,
                    "o": 1.10,
                    "h": 1.11,
                    "l": 1.09,
                    "c": 1.105,
                    "v": 1000.0,
                    "vw": 1.102,
                    "n": 42,
                },
                {
                    "t": t0 + 3_600_000,
                    "o": 1.105,
                    "h": 1.12,
                    "l": 1.10,
                    "c": 1.115,
                    "v": 2000.0,
                    "vw": 1.11,
                    "n": 77,
                },
            ],
        }
    )


def test_parse_polygon(spark):
    df = spark.createDataFrame([(_polygon_payload(),)], ["payload"])
    out = P.parse_polygon(df).orderBy("ts")
    assert out.columns == [
        "symbol",
        "ts",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "vwap",
        "transactions",
    ]
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["symbol"] == "EURUSD"  # C: prefix stripped
    assert rows[0]["vwap"] == pytest.approx(1.102)
    assert rows[0]["transactions"] == 42
    assert rows[1]["volume"] == pytest.approx(2000.0)


def test_parse_polygon_no_python_udf(spark):
    """The parse pipeline must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the physical plan."""
    df = spark.createDataFrame([(_polygon_payload(),)], ["payload"])
    plan = P.parse_polygon(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_granularity_mapping():
    assert P.GRANULARITY_TO_AV_INTERVAL["1h"] == "60min"
    assert P.GRANULARITY_TO_AV_INTERVAL["1d"] == "daily"


def test_validate_date_range():
    t0 = dt.datetime(2024, 1, 1)
    P.validate_date_range(t0, t0 + dt.timedelta(days=30))  # ok
    with pytest.raises(ValueError, match="before"):
        P.validate_date_range(t0, t0)
    with pytest.raises(ValueError, match="max_historical_days"):
        P.validate_date_range(t0, t0 + dt.timedelta(days=2000))


def test_apply_retention(spark, tmp_path):
    tdir = str(tmp_path / "hist")
    t0 = dt.datetime(2024, 1, 1)
    rows = [("S", t0 + dt.timedelta(days=i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["symbol", "ts", "close"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.parquet(tdir)
    # drop everything older than day 5
    S.apply_retention(spark, tdir, "ts", t0 + dt.timedelta(days=4))
    kept = spark.read.parquet(tdir)
    assert kept.count() == 5
    assert kept.agg(F.min("ts")).collect()[0][0] == t0 + dt.timedelta(days=5)
