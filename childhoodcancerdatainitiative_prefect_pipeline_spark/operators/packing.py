"""Sequence packing — bin docs into fixed token-budget packs.

A training-data pipeline stage with no reference analog (LLM-data
north star): documents are grouped into "packs" whose token totals
stay under a budget, so downstream tokenization emits dense
fixed-length sequences instead of one padded sequence per doc.

Spark shape: documents are salted into ``n_groups`` independent
shards by id hash, and each shard is packed greedily (first-fit
decreasing) inside ONE ``applyInPandas`` call — the only Python in
the operator, Arrow-batched, O(docs·packs_per_shard) per shard with
shards sized by the salt, never by the corpus.  Packing quality is
within a few percent of global first-fit-decreasing because shards
are hash-uniform samples of the length distribution.  Deterministic:
shard assignment is a pure id hash and the in-shard order is
(tokens desc, id asc).

Docs longer than the budget get a singleton pack (truncation is the
tokenizer's decision, not the packer's).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_groups: int = 64,
    shard_col: "F.Column | None" = None,
) -> DataFrame:
    """First-fit-decreasing packing within hash shards.

    Returns ``(pack_id, <id_col>, <token_col>)`` — every input doc
    exactly once, each pack's token total ≤ ``budget`` (singleton
    packs may exceed it when one doc alone does).

    ``shard_col`` overrides the default ``xxhash64(id) % n_groups``
    salt with a caller-supplied expression — used by the certified
    registry twin, which shards on a portable ``id % n_groups`` so a
    SQL oracle can replay the identical FFD loop (same trick as the
    ``_md5`` dedup entries: pin the algorithm by substituting a
    portable salt).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if shard_col is None:
        shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
    salted = docs.select(
        shard_col.cast("int").alias("__shard__"),
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
    )
    out_schema = f"pack_id string, {id_col} long, {token_col} long"

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard__"].iloc[0])
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        pack_totals: list[int] = []
        assignment: list[int] = []
        for tokens in pdf[token_col]:
            placed = None
            for i, total in enumerate(pack_totals):
                if total + tokens <= budget:
                    placed = i
                    break
            if placed is None:
                pack_totals.append(int(tokens))
                assignment.append(len(pack_totals) - 1)
            else:
                pack_totals[placed] += int(tokens)
                assignment.append(placed)
        return pd.DataFrame(
            {
                "pack_id": [f"{shard}-{a}" for a in assignment],
                id_col: pdf[id_col],
                token_col: pdf[token_col],
            }
        )

    return salted.groupBy("__shard__").applyInPandas(pack_shard, out_schema)
