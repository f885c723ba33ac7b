"""Custom stateful streaming operator: per-key changelog compaction.

``applyInPandasWithState`` keyed by ``doc_id`` with the per-key max-LSN
high-water mark as state: each micro-batch emits AT MOST one row per key —
the batch's max-LSN event — and only when it advances the key's running
watermark. Duplicate delivery, stale replays, and out-of-order stragglers
emit nothing. This is the streaming analogue of the LWW kernel
(``operators.lww``): a changelog *compactor* that thins an event stream to
its per-key frontier before it ever reaches the MERGE sink (useful when the
upstream fans in many partitions with heavy per-key churn — the sink then
sees one event per hot key per batch instead of thousands).

The MERGE path itself deliberately does NOT need this (the target table's
per-row ``_lsn`` makes it self-correcting); this operator exists for
pre-sink thinning and as the engine's custom-stateful-operator surface
(SURVEY.md §2.9). State is one long per live key, Arrow-batched per group —
no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def compact_changelog_stream(
    events: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "lsn",
) -> DataFrame:
    """Stateful per-key frontier filter over a (streaming) change-event frame.

    Emits the micro-batch's max-``lsn_col`` row per key iff it advances the
    key's high-water mark (kept in group state across batches). Output schema
    == input schema."""
    out_schema = events.schema
    state_schema = "max_lsn long"

    def compact(key, pdf_iter, state: GroupState):
        high = state.get[0] if state.exists else -1
        best = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[[pdf[lsn_col].idxmax()]]
            if best is None or int(cand[lsn_col].iloc[0]) > int(best[lsn_col].iloc[0]):
                best = cand
        if best is not None and int(best[lsn_col].iloc[0]) > high:
            state.update((int(best[lsn_col].iloc[0]),))
            yield best
        else:
            yield pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema})

    return events.groupBy(key_col).applyInPandasWithState(
        compact,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
