"""One-to-one assignment per block (SURVEY.md G5, extension).

The reference's fastLink path solves a per-block 1:1 assignment maximizing
sum of logit(p) with linear programming
(steps/fastLink/fastLink_links_to_clusters.R:99-107, dedupeMatches
linprog=TRUE).  There is no distributed LP primitive; blocks are small
after blocking, so the Spark shape is groupBy(block).applyInPandas with:

- scipy.optimize.linear_sum_assignment (Hungarian, exact) when scipy is
  importable, else
- greedy descending-logit matching (each left/right used once) — the
  classic 1/2-approximation, deterministic via (logit desc, keys asc)
  ordering.

Input: links contract + precomputed block column.  Output: the accepted
1:1 links subset.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from easylink_spark.contracts import (
    LEFT_DATASET,
    LEFT_ID,
    PAIR_COLS,
    PROBABILITY,
    RIGHT_DATASET,
    RIGHT_ID,
    record_key,
)

try:  # scipy is optional in this environment
    from scipy.optimize import linear_sum_assignment  # type: ignore

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def _assign_block(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["_logit"] = pdf["_p"].clip(1e-9, 1 - 1e-9).map(
        lambda p: math.log(p / (1 - p))
    )
    if _HAVE_SCIPY and len(pdf) > 1:
        lefts = sorted(pdf["_lk"].unique())
        rights = sorted(pdf["_rk"].unique())
        li = {k: i for i, k in enumerate(lefts)}
        ri = {k: i for i, k in enumerate(rights)}
        # maximize sum logit -> cost = -logit, missing pairs strongly penalized
        import numpy as np

        cost = np.full((len(lefts), len(rights)), 1e9)
        for _, row in pdf.iterrows():
            cost[li[row["_lk"]], ri[row["_rk"]]] = -row["_logit"]
        r_idx, c_idx = linear_sum_assignment(cost)
        chosen = {
            (lefts[r], rights[c]) for r, c in zip(r_idx, c_idx)
            if cost[r, c] < 1e8
        }
        mask = [
            (row["_lk"], row["_rk"]) in chosen for _, row in pdf.iterrows()
        ]
        return pdf[mask].drop(columns=["_logit"])
    # greedy fallback: deterministic order, each key used once
    pdf = pdf.sort_values(["_logit", "_lk", "_rk"],
                          ascending=[False, True, True])
    used_l, used_r, keep = set(), set(), []
    for idx, row in pdf.iterrows():
        if row["_lk"] in used_l or row["_rk"] in used_r:
            continue
        used_l.add(row["_lk"])
        used_r.add(row["_rk"])
        keep.append(idx)
    return pdf.loc[keep].drop(columns=["_logit"])


def one_to_one_assignment(links: DataFrame, block_col: str = "block_id") -> DataFrame:
    """Accept at most one link per left record and per right record within
    each block, maximizing total logit probability (G5)."""
    prepared = links.withColumn(
        "_lk", record_key(f"`{LEFT_DATASET}`", f"`{LEFT_ID}`")
    ).withColumn(
        "_rk", record_key(f"`{RIGHT_DATASET}`", f"`{RIGHT_ID}`")
    ).withColumn("_p", F.col(f"`{PROBABILITY}`"))
    assigned = prepared.groupBy(block_col).applyInPandas(
        lambda pdf: _assign_block(pdf), schema=prepared.schema
    )
    return assigned.select(
        *[F.col(f"`{c}`") for c in PAIR_COLS], F.col(f"`{PROBABILITY}`")
    )
