"""Frequency-sketch partials for heavy-hitter detection at scale.

The full-vocabulary ``groupBy(token).count()`` that answers "which items
exceed phi*n frequency" shuffles EVERY distinct item — at 100 TB that is a
vocabulary-sized exchange to answer a question whose output is a handful of
rows. The Misra-Gries summary bounds that: each partition keeps at most m
counters and ships at most m candidate items, and the merged candidate set
PROVABLY contains every item with global count > n/(m+1) (Misra & Gries
1982; mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
An exact recount of the candidates only (a broadcast semi-join instead of a
vocabulary shuffle) then turns the superset into the exact answer.

Reference: n/a (capability extension — the reference engine has no
approximate/sketch operators; SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(items: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries(m) candidate items for ``items[col]``.

    Returns a DataFrame with the single column ``col`` holding every item
    that survives an m-counter Misra-Gries summary of its partition —
    guaranteed to include every item whose PARTITION count exceeds
    n_partition/(m+1), and therefore (pigeonhole over partitions) every
    item whose GLOBAL count exceeds n_total/(m+1). At most m rows per
    partition leave the executor.

    Arrow-batched (mapInPandas): each batch folds in via value_counts, and
    the summary prunes back to m counters by subtracting the (m+1)-th
    largest counter from all and dropping non-positives — the standard
    mergeable-summaries reduction, vectorized.
    """

    def mg(batches):
        counts: dict = {}
        for pdf in batches:
            for tok, c in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > m:
                vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))
                thresh = int(vals[-(m + 1)])
                counts = {t: c - thresh for t, c in counts.items() if c > thresh}
        yield pd.DataFrame({col: pd.Series(list(counts.keys()), dtype="object")})

    return items.mapInPandas(mg, schema=f"{col} string")
