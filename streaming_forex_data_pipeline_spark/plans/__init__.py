"""Query plan registry — importing this package registers every query.

The modules are grouped by SURVEY §2 operator family:
    relational  — scans/filters/aggregations/joins/top-k (S/F/A/J/T)
    timeseries  — resample + window indicators (A1/A2, W-series, X-series)
    quality     — dedup/gaps/outliers/scoring (D-series, F5)
    llm         — dedup/similarity/text-analysis extensions
"""

from . import (  # noqa: F401
    advanced_q,
    analysis_q,
    corpus_q,
    ewm_q,
    llm_q,
    quality_q,
    relational,
    streaming_q,
    timeseries,
)
from . import olap_q  # noqa: F401,E402 — imported LAST: keeps every
# pre-round-8 registration index (the evidence-rotation tie-break)
# exactly where the driver's historical samples left it
from . import media_q  # noqa: F401,E402 — round-9 module, after olap_q
# for the same index-stability reason
from . import tpch_q  # noqa: F401,E402 — round-9, after media_q
from . import scale_q  # noqa: F401,E402 — round-9, after tpch_q
from . import subquery_q  # noqa: F401,E402 — round-10, after scale_q
from . import modal_q  # noqa: F401,E402 — round-10, after subquery_q
from . import pipeline_q  # noqa: F401,E402 — round-10, after modal_q
from .registry import all_queries, oracle_sqls, spark_queries

__all__ = ["all_queries", "spark_queries", "oracle_sqls"]
