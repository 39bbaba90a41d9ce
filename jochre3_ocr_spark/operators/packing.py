"""Sequence packing — greedy first-fit-in-order binning of documents
into fixed token-capacity packs, the step a training pipeline runs after
chunking to fill context windows without padding waste.

Semantics (deterministic, oracle-expressible): documents are sharded by
``doc_id mod n_shards`` and, WITHIN each shard, walked in numeric doc_id
order; a running token total accumulates until adding the next doc would
exceed ``capacity``, which closes the pack and starts a new one. A doc
larger than the capacity occupies a pack of its own. Output is one row
per doc: (doc_id, shard, pack_id, pack_pos, n_tokens).

Scale shape: packing is inherently a sequential fold, so it runs
per-shard — shards are independent and parallel (one shuffle on the
shard key; ``n_shards`` is the parallelism knob, set it ≥ cluster
cores at scale). Per-task state is just (doc_id, n_tokens) pairs for
one shard — no text ever enters the fold. This mirrors how production
packers shard by hash and pack map-side; a global single-sequence pack
would serialize the whole corpus through one walker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PACK_SCHEMA = (
    "doc_id string, shard int, pack_id int, pack_pos int, n_tokens int"
)


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy first-fit-in-order packing per shard (see module doc).

    ``id_col`` must be castable to BIGINT — the walk order inside a
    shard is numeric doc_id, which both this implementation and the
    DuckDB recursive-CTE oracle sort by (lexicographic string order
    would diverge between engines on numeric ids).
    """
    import pandas as pd

    base = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(id_col).cast("long").alias("_ord"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        # coalesce: a NULL text yields NULL size → NaN in the pandas
        # fold → an opaque int(NaN) ValueError; treat as 0 tokens
        F.coalesce(
            F.size(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ),
            F.lit(0),
        ).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord").reset_index(drop=True)
        pack_id, pack_pos, cum = 0, 0, 0
        pids, ppos = [], []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if cum > 0 and cum + tok > capacity:
                pack_id += 1
                pack_pos, cum = 0, 0
            pids.append(pack_id)
            ppos.append(pack_pos)
            pack_pos += 1
            cum += tok
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["pack_id"] = pids
        out["pack_pos"] = ppos
        return out[["doc_id", "shard", "pack_id", "pack_pos", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(pack, schema=PACK_SCHEMA)
