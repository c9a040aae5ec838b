"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in windowed/session aggregations can't express the
semantics (arbitrary per-key state machines), Structured Streaming's
escape hatch is ``applyInPandasWithState``: per grouping key, an
Arrow-batched Python function receives the key's new rows each
micro-batch plus its persisted state, and emits arbitrary output rows.
State lives in the state store (checkpointed, partitioned by key) — the
operator scales horizontally like any keyed aggregation.

``running_user_stats`` is the reference shape: a per-user running
accumulator (count / sum / min / max event time) maintained across
micro-batches — the pattern a fraud-score, rate-limiter, or
cumulative-feature operator would follow. The same function body serves
batch via ``applyInPandas`` (no state, single pass), which is what the
equivalence test pins against.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, "
    "first_ep BIGINT, last_ep BIGINT"
)
STATE_SCHEMA = (
    "n_events BIGINT, sum_value DOUBLE, first_ep BIGINT, last_ep BIGINT"
)


def _fold(pdfs: list[pd.DataFrame], prior: tuple | None) -> tuple:
    # State keeps the raw (unrounded) sum — rounding belongs to output
    # only, or multi-batch folds would drift from a single-pass fold.
    n, s, first_ep, last_ep = prior or (0, 0.0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # unit-agnostic epoch seconds (Arrow may deliver ns or µs units)
        ep = (pdf["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        n += int(len(pdf))
        s += float(pdf["value"].sum())
        lo, hi = int(ep.min()), int(ep.max())
        first_ep = lo if first_ep is None else min(first_ep, lo)
        last_ep = hi if last_ep is None else max(last_ep, hi)
    return n, s, first_ep, last_ep


def _stateful_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prior = tuple(state.get) if state.exists else None
    n, s, first_ep, last_ep = _fold(list(pdfs), prior)
    state.update((n, s, first_ep, last_ep))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "first_ep": [first_ep],
            "last_ep": [last_ep],
        }
    )


def running_user_stats_stream(events: DataFrame) -> DataFrame:
    """Streaming: per-user running stats across micro-batches.

    Each micro-batch emits the user's updated cumulative row; pair with
    outputMode("update"). State never times out here — a production
    operator would pick a timeout (ProcessingTimeTimeout /
    EventTimeTimeout) to bound the key space.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _stateful_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same fold applied once per user (applyInPandas).

    Exists so the streaming operator's final state is testable against a
    single-pass batch computation — and as the backfill path (same code,
    no state store).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n, s, first_ep, last_ep = _fold([pdf], None)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "sum_value": [round(s, 2)],
                "first_ep": [first_ep],
                "last_ep": [last_ep],
            }
        )

    return events.groupBy("user_id").applyInPandas(fn, schema=OUTPUT_SCHEMA)
