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
        # Raw float in state/output — same rationale as stateful._update:
        # per-batch rounding accumulates a residue with batch count.
        self._totals.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

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


def protobuf_available() -> bool:
    """The transformWithStateInPandas Python worker speaks a protobuf
    state-server protocol; without google.protobuf the engine path cannot
    execute (ImportError inside the worker)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# --- contract-faithful batch harness ---------------------------------------
# When the engine path is environment-blocked (no google.protobuf), the
# SAME StatefulProcessor object can still be certified: drive
# init → N× handleInputRows (with ValueState persisted between calls)
# → close per key through applyInPandas, splitting each key's rows into
# deterministic micro-batch chunks so state genuinely evolves across
# calls.  This exercises the processor-side contract — typed named state,
# incremental accumulation, final-update semantics — not Spark's state
# store; tests/test_stateful_v2.py runs the real engine when protobuf is
# present.

class _BatchValueState:
    def __init__(self) -> None:
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v

    def clear(self) -> None:
        self._v = None


class _BatchHandle:
    """Duck-typed StatefulProcessorHandle: ValueState only (what
    RunningTotalsProcessor uses)."""

    def __init__(self) -> None:
        self._states: dict = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return self._states.setdefault(name, _BatchValueState())


def run_processor_batch(events: DataFrame, n_microbatches: int = 3,
                        processor_cls=RunningTotalsProcessor) -> DataFrame:
    """Drive ``processor_cls`` through the StatefulProcessor lifecycle per
    user over ``n_microbatches`` deterministic chunks; return each key's
    FINAL update (what an availableNow drain of the update-mode stream
    yields per key)."""

    def drive(key, pdf):
        proc = processor_cls()
        proc.init(_BatchHandle())
        chunks = [pdf.iloc[i::n_microbatches] for i in range(n_microbatches)]
        last = None
        for chunk in chunks:
            if len(chunk) == 0:
                continue
            for out in proc.handleInputRows(key, iter([chunk]), None):
                last = out
        proc.close()
        return last

    return (events.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandas(drive, OUTPUT_SCHEMA))
