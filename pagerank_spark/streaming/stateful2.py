"""Second-generation stateful streaming via ``transformWithStateInPandas``.

``applyInPandasWithState`` (``stateful.py``) carries ONE opaque state
tuple per key. Spark 4's ``transformWithStateInPandas`` replaces that
with a typed state store API — named ValueState / ListState / MapState
variables per key, optional TTL, and timers — the shape long-running
keyed pipelines need (feature stores, rate limiters, per-entity
profiles). Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``), which Spark 4
bundles.

``user_profile`` is the demonstration operator: a per-user profile
maintained across micro-batches with all three typed-state kinds —

- ValueState ``n``:      total event count (and running value sum);
- ListState  ``topv``:   the top-K event values seen so far;
- MapState   ``types``:  event_type → occurrence count.

Every fold is ORDER-INSENSITIVE (count/sum/top-k/per-type counts), so
the streamed result converges to the single-pass batch twin no matter
how files are split into micro-batches — that convergence is what the
parity test pins. (An order-sensitive fold like EWMA would need
event-time ordering guarantees the file source doesn't provide.)

No reference analogue (the reference is batch-only); extension tier.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    HAS_TWS = False

# The typed-state API client speaks protobuf to the JVM. When the
# google.protobuf runtime is absent, install the wire-compatible
# pure-Python shim (state_pb.py) under the generated module's import
# name — at THIS module's import time, which covers both the driver
# and the Python workers: the worker unpickles the StatefulProcessor
# (importing this module by reference) before the state client's first
# lazy `import ...StateMessage_pb2`.
if HAS_TWS:
    from pagerank_spark.streaming import state_pb as _state_pb

    HAS_TWS_RUNTIME = _state_pb.install()
else:  # pragma: no cover - older Spark
    HAS_TWS_RUNTIME = False

TOP_K = 3

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, "
    "top_values STRING, type_counts STRING"
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _fold_batches(
    pdfs: list[pd.DataFrame],
    n: int,
    s: float,
    topv: list[float],
    types: dict[str, int],
) -> tuple[int, float, list[float], dict[str, int]]:
    """Order-insensitive accumulation of event batches into the profile."""
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += int(len(pdf))
        s += float(pdf["value"].sum())
        topv = heapq.nlargest(TOP_K, topv + [float(v) for v in pdf["value"]])
        for t, c in pdf["event_type"].value_counts().items():
            types[str(t)] = types.get(str(t), 0) + int(c)
    return n, s, topv, types


def _profile_row(
    user_id: int, n: int, s: float, topv: list[float], types: dict[str, int]
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(user_id)],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "top_values": [
                ",".join(f"{v:.2f}" for v in sorted(topv, reverse=True))
            ],
            "type_counts": [
                ",".join(f"{t}:{c}" for t, c in sorted(types.items()))
            ],
        }
    )


class ShimmedProcessor(StatefulProcessor):
    """Delegating wrapper that makes ANY StatefulProcessor safe to ship
    to workers in a protobuf-less environment.

    The wire shim installs at THIS module's import time. A processor
    class defined at module level pickles by reference, so unpickling
    it in the worker imports its module (and, if that module imports
    ``stateful2``, the shim). But a processor defined in a notebook,
    ``__main__``, or a test function pickles BY VALUE — the worker
    never imports anything, the shim never installs, and the state
    client's first lazy pb2 import crashes the pre-init runner. This
    wrapper is module-level HERE, so its pickled form always imports
    ``stateful2`` on unpickle, installing the shim before any state
    call, while the inner processor travels by value inside it. Wrap
    with ``ensure_state_runtime(processor)`` (a no-op passthrough when
    the real protobuf runtime exists).
    """

    def __init__(self, inner: StatefulProcessor) -> None:
        self._inner = inner

    def init(self, handle) -> None:
        self._inner.init(handle)

    def handleInputRows(self, key, rows, timerValues):
        return self._inner.handleInputRows(key, rows, timerValues)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return self._inner.handleExpiredTimer(
            key, timerValues, expiredTimerInfo
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        self._inner.handleInitialState(key, initialState, timerValues)

    def close(self) -> None:
        self._inner.close()


def ensure_state_runtime(processor: StatefulProcessor) -> StatefulProcessor:
    """Wrap ``processor`` so typed-state streams run even without the
    google.protobuf runtime (see ShimmedProcessor); passthrough when
    the real runtime is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return processor
    except ImportError:
        return ShimmedProcessor(processor)


class UserProfileProcessor(StatefulProcessor):
    """Typed-state per-user profile (ValueState + ListState + MapState)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._count = handle.getValueState("n", "n BIGINT, s DOUBLE")
        self._topv = handle.getListState("topv", "v DOUBLE")
        self._types = handle.getMapState("types", "t STRING", "c BIGINT")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, s = (
            (int(self._count.get()[0]), float(self._count.get()[1]))
            if self._count.exists()
            else (0, 0.0)
        )
        topv = (
            [float(r[0]) for r in self._topv.get()]
            if self._topv.exists()
            else []
        )
        types = (
            {str(k[0]): int(v[0]) for k, v in self._types.iterator()}
            if self._types.exists()
            else {}
        )
        n, s, topv, types = _fold_batches(list(rows), n, s, topv, types)
        self._count.update((n, s))
        self._topv.put([(v,) for v in topv])
        for t, c in types.items():
            self._types.updateValue((t,), (c,))
        yield _profile_row(key[0], n, s, topv, types)

    def close(self) -> None:
        pass


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming: per-user typed-state profile, one updated row per
    (user, micro-batch); pair with ``outputMode("update")`` and the
    RocksDB state store provider (``ROCKSDB_PROVIDER``)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin: one-pass fold per user via ``applyInPandas`` — the
    backfill path and the convergence oracle for the stream."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n, s, topv, types = _fold_batches([pdf], 0, 0.0, [], {})
        return _profile_row(int(pdf["user_id"].iloc[0]), n, s, topv, types)

    return events.groupBy("user_id").applyInPandas(fn, schema=OUTPUT_SCHEMA)


class FlushOnTimerProcessor(StatefulProcessor):
    """Inactivity-flush via PROCESSING-TIME TIMERS: per key, count
    events and (re-)arm a timer ``timeout_ms`` past the current
    processing time on every batch — deleting the previously armed
    timer first, so exactly one timer is live per key. Output is
    emitted ONLY from ``handleExpiredTimer`` (the key has been quiet
    for ``timeout_ms``): the accumulated count flushes and the state
    clears, the write-behind / session-drain shape. Exercises the
    remaining typed-state protocol paths: RegisterTimer, DeleteTimer,
    ListTimers (asserted to hold exactly the live timer), the
    expiry-timer iterator, and ``getCurrentProcessingTimeInMs``.
    """

    def __init__(self, timeout_ms: int = 2_000) -> None:
        self._timeout_ms = timeout_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._handle = handle
        self._state = handle.getValueState("acc", "n BIGINT, t BIGINT")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        prev_n, prev_t = (
            (int(self._state.get()[0]), int(self._state.get()[1]))
            if self._state.exists()
            else (0, -1)
        )
        now = timerValues.getCurrentProcessingTimeInMs()
        new_t = now + self._timeout_ms
        if prev_t >= 0:
            self._handle.deleteTimer(prev_t)
        self._handle.registerTimer(new_t)
        live = list(self._handle.listTimers())
        assert new_t in live, (new_t, live)
        self._state.update((prev_n + n, new_t))
        return iter([])

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._state.exists():
            n = int(self._state.get()[0])
            self._state.clear()
            yield pd.DataFrame(
                {"user_id": [int(key[0])], "n_events": [n]}
            )

    def close(self) -> None:
        pass


def user_event_count_flush_stream(
    events: DataFrame, timeout_ms: int = 2_000
) -> DataFrame:
    """Streaming: per-user event counts flushed ONLY after
    ``timeout_ms`` of inactivity (processing-time timers). Pair with
    ``timeMode="ProcessingTime"`` (set here) and the RocksDB provider."""
    return events.groupBy("user_id").transformWithStateInPandas(
        ensure_state_runtime(FlushOnTimerProcessor(timeout_ms)),
        outputStructType="user_id BIGINT, n_events BIGINT",
        outputMode="Append",
        timeMode="ProcessingTime",
    )
