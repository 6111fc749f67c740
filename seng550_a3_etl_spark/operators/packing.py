"""Training-sequence packing (sample packing) — north-star extension.

After chunking (functions/text.py:token_chunks), an LLM data pipeline
packs variable-length chunks into fixed-capacity training sequences so
no context window trains mostly on padding. The packing rule here is
deterministic greedy sequential fill: within a shard, walk the chunks in
a total order and start a new sequence exactly when adding the next
chunk would exceed the capacity (a chunk larger than the capacity gets a
sequence of its own). Sequential fill is the industry default (trades a
few percent of fill efficiency for order stability and O(n) cost —
optimal bin packing is NP-hard and non-streamable).

Physical shape: one shuffle on the shard key, then applyInPandas runs
the O(n) fill per shard — per-partition sequential state is exactly what
Arrow-batched grouped-map UDFs are for; the rule is order-dependent so
no built-in window can express it (a running sum resets conditionally on
its own value). State is one integer per shard; output adds (seq_id,
seq_fill) per chunk.

Even this operator is fully oracle-checked: greedy fill is a linear
recurrence, so a DuckDB ``WITH RECURSIVE`` walks the same order and
reproduces seq_id exactly (suite/text.py:seq_packed_chunks).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def pack_sequences(
    chunks: DataFrame,
    shard_col: str,
    order_cols: Sequence[str],
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each chunk a ``seq_id`` (0-based per shard) by greedy
    sequential fill under ``capacity`` tokens; also emits ``seq_fill``,
    the running token count of the chunk's sequence up to and including
    the chunk. Input columns pass through unchanged.

    ``size_col`` must be non-null (it comes from a size()/count upstream
    — filter or fillna first if the source allows nulls); ``order_cols``
    must totally order each shard's chunks or the packing is
    nondeterministic.
    """
    order_cols = list(order_cols)
    # backtick-quote names so columns named like reserved words (or
    # containing spaces) survive the DDL parser
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in chunks.schema.fields
    )
    out_schema = f"{fields}, seq_id bigint, seq_fill bigint"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        seq_ids, fills = [], []
        seq, fill, first = 0, 0, True
        for n in pdf[size_col]:
            n = int(n)
            if not first and fill + n > capacity:
                seq += 1
                fill = n
            else:
                fill += n
            first = False
            seq_ids.append(seq)
            fills.append(fill)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return chunks.groupBy(shard_col).applyInPandas(pack, out_schema)
