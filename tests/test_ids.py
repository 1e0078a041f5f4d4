"""dense_rank_ids must be bit-identical to the single-task global-sort
row_number it replaces (the DuckDB oracles keep the row_number form)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from entityresolution_capstone_spark.functions.ids import dense_rank_ids


@pytest.mark.parametrize("n_rows,n_parts", [(1, 4), (37, 4), (500, 8), (500, 3)])
def test_matches_global_sort(spark, n_rows, n_parts):
    # deterministic synthetic vocabulary with heavy df ties (the realistic
    # case: many tokens share a document frequency; (df, token) stays unique)
    df = spark.range(n_rows).select(
        F.concat(F.lit("tok"), F.col("id")).alias("token"),
        (F.col("id") % 7 + 1).alias("df"),
    )
    got = {
        r["token"]: r["token_id"]
        for r in dense_rank_ids(df, ["df", "token"], num_partitions=n_parts).collect()
    }
    w = Window.orderBy("df", "token")
    want = {
        r["token"]: r["token_id"]
        for r in df.select(
            "token", F.row_number().over(w).cast("long").alias("token_id")
        ).collect()
    }
    assert got == want


def test_no_single_partition_global_sort(spark):
    """The physical plan must not contain a partition-less global Sort feeding
    a Window (the straggler this helper exists to remove)."""
    df = spark.range(100).select(
        F.concat(F.lit("t"), F.col("id")).alias("token"),
        (F.col("id") % 5).alias("df"),
    )
    plan = dense_rank_ids(df, ["df", "token"])._jdf.queryExecution().executedPlan().toString()
    # the vocabulary goes through rangepartitioning and a _pid-partitioned
    # window; the only partition-less window allowed is the one over the tiny
    # per-partition offsets table (numPartitions rows)
    assert "rangepartitioning(df" in plan
    assert "windowspecdefinition(_pid" in plan
