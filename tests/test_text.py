"""Tokenizer / name-cleaner parity with the reference semantics.

Reference: /root/reference/src/entity_resolver/core/graph.py:77-110
(strip -> [^a-zA-Z0-9]->space -> lower -> whitespace split; name split on '_').
Golden expectations computed with plain Python below, NOT by importing the
reference.
"""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.functions import text as T


def ref_tokenize(doc: str) -> list[str]:
    return re.sub("[^a-zA-Z0-9]", " ", doc.strip()).lower().split()


CASES = [
    "Hello, World!",
    "  leading and trailing  ",
    "under_score-and.dots",
    "MiXeD CaSe 123",
    "!!!",
    "",
    "a",
    "tabs\tand\nnewlines here",
    "unicode café naïve",  # non-ascii chars become separators
]


def test_tokenize_matches_reference_semantics(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], ["i", "t"])
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", T.tokenize("t").alias("toks")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == ref_tokenize(c), f"case {c!r}"


def test_tokenize_sql_matches_spark(spark):
    con = duckdb.connect()
    for c in CASES:
        sql = "select " + T.tokenize_sql("?")
        got = con.execute(sql, [c]).fetchone()[0]
        assert got == ref_tokenize(c), f"sql case {c!r}"


def test_clean_person_name(spark):
    df = spark.createDataFrame(
        [("wang_w_w",), ("smith_john",), ("solo",)], ["name"]
    )
    rows = df.select(T.clean_person_name("name").alias("n")).collect()
    assert (rows[0]["n"]["last"], rows[0]["n"]["first"]) == ("wang", "w w")
    assert (rows[1]["n"]["last"], rows[1]["n"]["first"]) == ("smith", "john")
    assert (rows[2]["n"]["last"], rows[2]["n"]["first"]) == ("solo", "")


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], ["t"])
    rows = df.select(T.char_ngrams("t", 3).alias("g")).collect()
    assert rows[0]["g"] == ["abc", "bcd", "cde", "def"]
    assert rows[1]["g"] == ["ab"]


def test_token_ngrams(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d"],), (["x"],)], ["t"])
    rows = df.select(T.token_ngrams("t", 2).alias("g")).collect()
    assert rows[0]["g"] == ["a b", "b c", "c d"]
    assert rows[1]["g"] == ["x"]
