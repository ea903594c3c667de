"""Shared helpers for the scripts/measure_*_scaling harnesses.

THE one copy of salted corpus replication. The salt MUST be
letters-only (the digit-salt lesson from measure_scaling.py: a digit
prefix glues onto numeric tokens and changes tokenization class, so
replicas stop being token-disjoint and near-dup mass grows
quadratically, polluting the measurement). Every replica's tokens are
prefixed with a replica-unique two-letter salt so cross-replica
duplicates cannot exist and true dup/feature mass grows LINEARLY with
the factor.
"""
from __future__ import annotations

import string

from pyspark.sql import functions as F


def _salt(i: int) -> str:
    a, b = divmod(i, 26)
    return "q" + string.ascii_lowercase[a] + string.ascii_lowercase[b]


def replicate_salted(df, factor):
    parts = [
        df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        .withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"(\S+)", f"{_salt(i)}$1"),
        )
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
