"""Stateful streaming operators (ST7).

The reference keeps per-connection/channel state in the WebSocket
manager: a global message sequence counter (:615-618) and per-channel
ring buffers (:249-252).  The Spark-native equivalents:

- sequence counters -> `applyInPandasWithState` with a per-key GroupState
  holding the last assigned sequence, so numbering is contiguous and
  monotonic ACROSS micro-batches (a plain monotonically_increasing_id
  restarts per batch and leaves gaps);
- ring buffers -> the sink's concern (a bounded memory sink / windowed
  retention), not engine state.

Scale: state is one bigint per channel key — negligible; keys
partition across executors, so throughput scales with channel count.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def assign_sequence(
    df: DataFrame, key_col: str = "stream_type", order_col: str = "emitted_at"
) -> DataFrame:
    """ST7 — contiguous per-key sequence numbers that survive micro-batch
    boundaries (websocket_manager.py:615-618's `self._sequence += 1`).

    Rows within a batch are ordered by ``order_col`` before numbering so
    the assignment is deterministic; the GroupState carries the running
    counter to the next batch.
    """
    out_schema = StructType(
        list(df.schema.fields) + [StructField("sequence", LongType())]
    )
    state_schema = StructType([StructField("seq", LongType())])
    order_key = order_col

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seq = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(order_key, kind="mergesort").reset_index(
                drop=True
            )
            pdf["sequence"] = range(seq + 1, seq + len(pdf) + 1)
            seq += len(pdf)
            yield pdf
        state.update((seq,))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
