"""Spark 4 ``transformWithStateInPandas`` variant of the running per-user
aggregator (streaming/stateful.py) — the successor API to
``applyInPandasWithState``: typed named state (ValueState/ListState/
MapState), timers, and TTL live on a StatefulProcessor object, backed by
the RocksDB state store (required provider; set in
:func:`rocksdb_state_conf`).

Both variants are kept: applyInPandasWithState is the broadly-deployed
API; this is where custom stateful streaming is headed.

NOTE: executing this path requires ``google.protobuf`` (the state-server
protocol), which is absent in the build container — the test is
skipif-gated on that import and the applyInPandasWithState variant
provides the executable coverage here.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


def rocksdb_state_conf(spark) -> None:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)


class RunningTotalsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator:
        import pandas as pd

        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, round(total, 6)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 6)]})

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    return (events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))
