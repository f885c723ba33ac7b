"""Engine-independent pandas oracle for replay correctness (FIXTURES.md A4).

Final expected state = for each doc_id, the event with max lsn wins; if it is
a delete the doc disappears; otherwise its payload is the row
(insert/update/upsert all write the payload). Docs never touched by the log
keep their base payload. Pure pandas — shares no code path with the engine.
"""

from __future__ import annotations

import pandas as pd


def expected_final_state(base: pd.DataFrame, log: pd.DataFrame) -> pd.DataFrame:
    """Compute the golden final table from materialized base + change log."""
    payload_cols = [c for c in log.columns if c not in ("lsn", "op")]
    winners = (
        log.sort_values(["doc_id", "lsn"], kind="mergesort")
        .groupby("doc_id", as_index=False)
        .tail(1)
    )
    deleted = set(winners.loc[winners["op"] == "delete", "doc_id"])
    surviving = winners[winners["op"] != "delete"][payload_cols]

    base = base.copy()
    for c in payload_cols:
        if c not in base.columns:
            base[c] = None
    base = base[payload_cols]
    untouched = base[
        ~base["doc_id"].isin(set(winners["doc_id"]))
    ]
    out = pd.concat([untouched, surviving], ignore_index=True)
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)) or type(v).__module__ == "numpy" and hasattr(v, "__len__"):
        return tuple(int(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, float) and v.is_integer():
        # NaN-bearing pandas columns upcast ints to float; fold back so the
        # strict DataFrame.equals comparison sees identical dtypes/values.
        return int(v)
    if hasattr(v, "item"):  # numpy scalar → python scalar
        return v.item()
    return v


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize for bit-exact comparison: sort rows/columns, reset index,
    arrays→tuples, NA→None, numpy scalars→python scalars."""
    df = df.copy()
    for c in df.columns:
        # astype(object) after the value map: values are already python
        # scalars, but pandas re-infers a numeric dtype from them, and
        # DataFrame.equals compares dtypes even on ZERO rows — an empty
        # engine result (int64 from the Spark schema) would spuriously
        # mismatch an empty oracle frame (object from a list literal).
        df[c] = df[c].map(_canon_value).astype(object)
    df = df[sorted(df.columns)]
    return (
        df.sort_values(list(df.columns), kind="mergesort", key=lambda s: s.map(repr))
        .reset_index(drop=True)
    )
