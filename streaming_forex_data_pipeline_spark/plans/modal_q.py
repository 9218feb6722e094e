"""Round-10 registered queries: the video modality made real, the
cross-modal canonical-keep decision, and the streaming-health batch
face.  Filled in over the round; import order (after subquery_q) keeps
every earlier registration index stable for the driver's evidence
rotation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as DD
from ..llm import multimodal as MM
from ..sources.tables import fan_out, load_table
from .registry import register
