"""Group-wise Pandas operators — ``applyInPandas`` (the third Pandas
API surface next to mapInPandas in multimodal.py and
applyInPandasWithState in streaming/stateful.py).

Used where per-group logic wants a real dataframe library (rank
methods, interpolation, model scoring) but the grouping/shuffle stays
in Spark. One Arrow batch per group — groups must fit an executor's
memory, which is the operator's documented contract (salt or pre-split
pathological groups first; see operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def group_pct_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(id, groups..., value, pct_rank) — min-method percentile rank of
    ``value_col`` within each group: rank_min / group_size.

    THE public operator for group-wise percentile ranks: pure built-in
    window algebra (``rank() / count() over partition``) — JVM-side,
    whole-stage-codegen'd, one shuffle on the group key. Use this, not
    :func:`quantile_rank`, for plain ranks.
    """
    w_order = Window.partitionBy(*group_cols).orderBy(value_col)
    w_all = Window.partitionBy(*group_cols)
    return df.select(id_col, *group_cols, value_col).withColumn(
        "pct_rank",
        F.rank().over(w_order).cast("double") / F.count("*").over(w_all),
    )


def quantile_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(id, groups..., value, pct_rank) — min-method percentile rank,
    computed IN PANDAS one group per Arrow batch.

    NEVER use this for plain ranks — :func:`group_pct_rank` is the
    built-in-window public operator (JVM-side, codegen'd); this twin
    exists solely as the harness probe for the ``applyInPandas``
    extension point: because its result is exactly reproducible in SQL
    (RANK() / COUNT(*) OVER partition), the oracle harness verifies the
    whole Pandas path — schema contract, group iteration, Arrow
    transfer — value-exactly. A row-group-at-a-time Python path for a
    one-line window is otherwise always the wrong trade.
    """
    out_schema = T.StructType(
        [df.schema[id_col]]
        + [df.schema[c] for c in group_cols]
        + [df.schema[value_col], T.StructField("pct_rank", T.DoubleType())]
    )
    cols = [id_col, *group_cols, value_col]

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[cols].copy()
        out["pct_rank"] = pdf[value_col].rank(method="min") / len(pdf)
        return out

    return df.select(*cols).groupBy(*group_cols).applyInPandas(
        per_group, out_schema
    )
