"""CDC upsert at ingest — the streaming twin of ``op_merge_upsert``.

The batch MERGE arbitrates a base snapshot against a delta in one
full-outer join; the streaming form is how lakehouse tables actually
ingest changes: a keyed state store holding the CURRENT row per key,
updated latest-sequence-wins as change events arrive in any order across
micro-batches. On a bounded replay of (base, then delta) the final state
must equal the batch MERGE's arbitration exactly — pinned in
tests/test_streaming.py, including across a checkpointed restart between
the two deliveries (the state store IS the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_stream(changes: DataFrame) -> DataFrame:
    """Keyed upsert over a change stream of rows
    ``(k long, price double, seq long)``: per key, keep the row with the
    highest ``seq`` (ties: the larger price is deterministic noise-proofing;
    real CDC sequences are unique). Emits the post-update current row per
    touched key each micro-batch (update mode).

    State per key is ONE (seq, price) pair — bounded by the live key
    count, the same bound as the table itself; this is the
    applyInPandasWithState escape hatch because Structured Streaming has
    no built-in "latest row wins" aggregate with exactly-once replacement
    semantics across restarts."""
    import pandas as pd

    def update(key, pdfs, state):
        seq, price = state.get if state.exists else (-1, None)
        for pdf in pdfs:
            for s, p in zip(pdf["seq"], pdf["price"]):
                s = int(s)
                if s > seq or (s == seq and (price is None or p > price)):
                    seq, price = s, float(p)
        state.update((seq, price))
        yield pd.DataFrame(
            {"k": [key[0]], "seq": [seq], "price": [price]}
        )

    return changes.groupBy("k").applyInPandasWithState(
        update,
        outputStructType="k long, seq long, price double",
        stateStructType="seq long, price double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
