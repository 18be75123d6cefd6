"""Custom stateful streaming operators (``applyInPandasWithState``).

The batch suite catches cross-partition duplicates by re-scanning key
columns (plans/runner.py ``_global_key_checks``); on a *stream* that rescan
is unbounded, so the streaming-native design keeps per-key state instead:
each key group carries a running count across micro-batches in the state
store, and a violation row is emitted the moment a key's running total
exceeds one — including when the two occurrences arrived in different
micro-batches, which the stateless ``foreachBatch`` checks in
incremental.py structurally cannot see.

Scale notes: state is per-key O(1) (a single long), partitioned by the
grouping key across executors exactly like a shuffle — no driver state. Keys
that can never repeat again (event-time ordered ingest) should use a
processing-time timeout to bound the store; the default keeps state forever
(correct for unbounded clip_id reuse detection, sized 8 bytes/key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_duplicate_monitor(
    stream: DataFrame,
    key_col: str = "clip_id",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Running per-key occurrence counts with duplicate emission.

    Output rows ``(key, n_seen, n_new)`` appear only for keys whose running
    total exceeds 1: ``n_seen`` is the total occurrences ever seen (state +
    this batch), ``n_new`` the occurrences in this micro-batch. A key seen
    once in batch 1 and once in batch 7 emits at batch 7 with n_seen=2 —
    cross-batch detection via the state store, resumable through the
    streaming checkpoint like the batch runner's verdict markers.

    ``timeout='ProcessingTimeTimeout'`` lets callers bound the state store
    when keys are known to stop repeating (set a timeout inside a custom
    variant); the default never expires state.
    """
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_seen long, n_new long"
    state_schema = "n long"

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd

        prior = state.get[0] if state.exists else 0
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        total = prior + n_new
        state.update((total,))
        if total > 1 and n_new > 0:
            yield pd.DataFrame(
                {key_col: [key[0]], "n_seen": [total], "n_new": [n_new]}
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def stateful_chronology_monitor(
    stream: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming version of operators/sequence.chronology_audit: per entity,
    the state store carries the high-water timestamp (epoch microseconds)
    seen so far; any arrival whose timestamp is EARLIER than the entity's
    high water is an out-of-order event, detected across micro-batches
    (batch 1 ends at 12:00, batch 7 delivers 11:58 -> emit) — the defect a
    stateless per-batch lag() can only see inside one batch.

    Emits ``(group, n_late, max_backstep_sec, high_water_us)`` for batches
    containing at least one late arrival for that entity. Within a batch,
    rows are compared in ascending ``ts`` order against the running high
    water: late = strictly below the PRE-BATCH high water (intra-batch
    reordering inside one micro-batch is delivery jitter, not a data
    defect — the batch checker q91 owns intra-order). State is one long per
    entity, executor-partitioned; same store economics as the duplicate
    monitor.
    """
    # Derive the group column's type from the input schema — hardcoding
    # 'long' broke grouping by string entity keys (clip_id) at runtime.
    group_type = stream.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {group_type}, n_late long, max_backstep_sec double, "
        "high_water_us long"
    )
    state_schema = "hw long"

    def fn(key: tuple, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        hw = state.get[0] if state.exists else None
        n_late = 0
        max_back = 0
        new_hw = hw
        for pdf in pdfs:
            ts = pdf[ts_col]
            # NaT casts to int64-min, which would read as a ~292k-year
            # backstep; null timestamps are the schema check's violation,
            # not a chronology event
            us = (
                ts[ts.notna()].astype("datetime64[us]").astype("int64")
            ).to_numpy()
            if us.size == 0:
                continue
            if hw is not None:
                late = us < hw
                n_late += int(late.sum())
                if late.any():
                    max_back = max(max_back, int((hw - us[late]).max()))
            mx = int(us.max())
            new_hw = mx if new_hw is None else max(new_hw, mx)
        if new_hw is not None:
            state.update((new_hw,))
        if n_late > 0:
            yield pd.DataFrame(
                {
                    group_col: [key[0]],
                    "n_late": [n_late],
                    "max_backstep_sec": [max_back / 1e6],
                    "high_water_us": [new_hw],
                }
            )

    return stream.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
