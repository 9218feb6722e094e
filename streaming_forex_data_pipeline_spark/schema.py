"""Canonical schemas (SURVEY §1.1/§1.2 data model).

Fixed, declared StructTypes for the engine's core rows — no schema
inference anywhere (the reference declares its shapes via Pydantic +
SQL DDL; app/domain/schemas.py:26-167, docker/init-scripts/
02-create-tables.sh:14-27).

Type mapping pinned in SURVEY §1.2: prices DOUBLE in compute
(DECIMAL(15,8) only at a storage boundary), volume LONG, timestamps UTC
TIMESTAMP, enums as strings, open feature maps as MAP<STRING,DOUBLE>.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: OHLCV candle row (app/domain/schemas.py:26-105)
CANDLE = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", LongType()),
        StructField("data_source", StringType()),
    ]
)

#: validated candle = candle + quality columns (schemas.py:110-167);
#: flags are flat columns, never nested objects
VALIDATED_CANDLE = StructType(
    CANDLE.fields
    + [
        StructField("quality_score", DoubleType()),
        StructField("quality_level", StringType()),
        StructField("is_outlier", BooleanType()),
        StructField("is_gap_fill", BooleanType()),
    ]
)

#: ML-ready candle: open-keyed feature maps at the serialization edge
#: (normalizer.py:378-393; JSONB DDL) — compute uses wide columns
ML_CANDLE = StructType(
    VALIDATED_CANDLE.fields
    + [
        StructField("normalized_features", MapType(StringType(), DoubleType())),
        StructField("technical_indicators", MapType(StringType(), DoubleType())),
        StructField("market_features", MapType(StringType(), DoubleType())),
    ]
)

#: tick row (premium_data_provider.py:33-46)
TICK = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("symbol", StringType(), False),
        StructField("bid", DoubleType()),
        StructField("ask", DoubleType()),
        StructField("last", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("spread", DoubleType()),
        StructField("source", StringType()),
        StructField("quality", StringType()),
        StructField("latency_ms", DoubleType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

#: order-book level + snapshot (premium_data_provider.py:49-68) — a
#: genuinely nested ArrayType(Struct) column pair
BOOK_LEVEL = StructType(
    [
        StructField("price", DoubleType()),
        StructField("size", DoubleType()),
        StructField("orders", IntegerType()),
    ]
)

ORDER_BOOK = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("symbol", StringType(), False),
        StructField("bids", ArrayType(BOOK_LEVEL)),
        StructField("asks", ArrayType(BOOK_LEVEL)),
        StructField("spread", DoubleType()),
        StructField("mid_price", DoubleType()),
    ]
)

#: stream message envelope (websocket_manager.py:79-87)
STREAM_MESSAGE = StructType(
    [
        StructField("stream_type", StringType(), False),
        StructField("emitted_at", TimestampType()),
        StructField("sequence", LongType()),
        StructField("symbol", StringType()),
        StructField("latency_ms", DoubleType()),
    ]
)
