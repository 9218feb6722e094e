"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference streaming-FOREX-data-pipeline
(Ayrton-Machado/streaming-FOREX-data-pipeline), re-expressed Spark-first.

Layout:
    session.py    -- SparkSession factory tuned for local[N] + 100TB posture
    schema.py     -- canonical StructTypes (candles, ticks, order book)
    sources/      -- parquet table loaders + candle derivation (S-series)
    operators/    -- quality (F/D), indicators (W), ewm/backtest/pattern
                     kernels (W2-W4/P-series), market features (X),
                     normalization (N)
    plans/        -- query registry: every SURVEY §2 operator exposed as a
                     (spark_builder, duckdb_oracle_sql) pair
    streaming/    -- Structured Streaming channels (ST-series)
    llm/          -- LLM-data-pipeline ops: dedup, similarity, multimodal,
                     text analysis
"""

__version__ = "0.1.0"
