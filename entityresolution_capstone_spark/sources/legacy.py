"""Legacy-format readers, Spark-native (parity with the reference's parsers).

- graph JSON rows ``{"node_id": int, "edge_id": int, "attr_dict": {...}}``
  (reference parser/graph_parser.py:39-72)
- ground-truth JSON rows ``{"node_id": int, "cluster_id": int}``
  (parser/ground_truth_parser.py:23-49)
- pipe-delimited ``.dat``: ``author_id | author_cluster_id | normalized_author
  | full_author | author_no | paper_id | paper_cluster_id | title``
  (scripts.py:80-126, format per data/citeseer/format.txt), including the
  reference's drop of the corrupt citeseer author_id 2716 (scripts.py:104-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_graph_json(
    spark: SparkSession, path: str, attr_names: list[str]
) -> DataFrame:
    """-> (node_id long, edge_id long, <one column per attr>)."""
    attr_fields = T.StructType(
        [T.StructField(a, T.StringType(), True) for a in attr_names]
    )
    schema = T.StructType(
        [
            T.StructField("node_id", T.LongType(), False),
            T.StructField("edge_id", T.LongType(), False),
            T.StructField("attr_dict", attr_fields, True),
        ]
    )
    df = spark.read.schema(schema).json(path)
    cols = ["node_id", "edge_id"] + [
        F.col(f"attr_dict.{a}").alias(a) for a in attr_names
    ]
    return df.select(*cols)


def read_ground_truth_json(spark: SparkSession, path: str) -> DataFrame:
    """-> (node_id long, cluster_id long), ordered by node_id (reference sorts)."""
    schema = T.StructType(
        [
            T.StructField("node_id", T.LongType(), False),
            T.StructField("cluster_id", T.LongType(), False),
        ]
    )
    return spark.read.schema(schema).json(path).orderBy("node_id")


def read_citeseer_dat(
    spark: SparkSession, path: str, drop_corrupt_ids: tuple[int, ...] = (2716,)
) -> DataFrame:
    """Pipe-delimited author rows -> typed columns, corrupt ids dropped.

    Quoting is DISABLED: the reference parses with a plain text split
    (scripts.py:94-101), and real citeseer titles contain unbalanced ``"``
    characters — CSV quote handling would silently swallow the rows after
    one (measured: 2 records lost on citeseer-mrdm05)."""
    raw = spark.read.option("quote", "").csv(path, sep="|", header=False)
    cols = [
        "author_id",
        "author_cluster_id",
        "normalized_author",
        "full_author",
        "author_no",
        "paper_id",
        "paper_cluster_id",
        "title",
    ]
    df = raw.toDF(*cols)
    for c in ("author_id", "author_cluster_id", "paper_id", "paper_cluster_id"):
        df = df.withColumn(c, F.trim(F.col(c)).cast("long"))
    df = df.withColumn("normalized_author", F.trim("normalized_author"))
    if drop_corrupt_ids:
        df = df.filter(~F.col("author_id").isin(list(drop_corrupt_ids)))
    return df


def write_graph_json(df: DataFrame, path: str, attr_names: list[str]) -> None:
    """Inverse of read_graph_json (reference scripts.py:123-126 sink)."""
    out = df.select(
        "node_id",
        "edge_id",
        F.struct(*[F.col(a) for a in attr_names]).alias("attr_dict"),
    )
    out.write.mode("overwrite").json(path)


def read_arxiv_dat(spark: SparkSession, path: str) -> DataFrame:
    """Pipe-delimited arxiv author rows -> typed columns.

    Same layout as citeseer (reference scripts.py:80-126 parses both with one
    routine); arxiv has no corrupt ids to drop (the id-2716 filter is
    citeseer-specific, scripts.py:96-106)."""
    return read_citeseer_dat(spark, path, drop_corrupt_ids=())


def prep_dat(
    spark: SparkSession,
    data: str,
    graph_path: str,
    ground_truth_path: str,
    name: str = "citeseer",
) -> None:
    """CLI-parity port of the reference's prep-arxiv / prep-citeseer commands
    (scripts.py:36-77): .dat -> graph.json (node_id, edge_id, attr_dict.name)
    + ground_truth.json (node_id, cluster_id). Only column 3
    (normalized_author) is kept as the 'name' attribute, per the reference."""
    if name == "citeseer":
        df = read_citeseer_dat(spark, data)
    elif name == "arxiv":
        df = read_arxiv_dat(spark, data)
    else:
        raise ValueError(f"unknown dataset: {name!r} (want 'arxiv' or 'citeseer')")
    graph = df.select(
        F.col("author_id").alias("node_id"),
        F.col("paper_id").alias("edge_id"),
        F.col("normalized_author").alias("name"),
    )
    write_graph_json(graph, graph_path, ["name"])
    df.select(
        F.col("author_id").alias("node_id"),
        F.col("author_cluster_id").alias("cluster_id"),
    ).write.mode("overwrite").json(ground_truth_path)
