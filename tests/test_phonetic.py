"""Soundex goldens (NIST examples) — Column impl vs soundex_sql vs pinned codes."""

import duckdb
import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.functions.phonetic import soundex_code, soundex_sql

GOLDEN = {
    # the canonical NIST / census examples (H/W transparency, vowel breaks,
    # first-letter suppression, padding)
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
    "O'Brien": "O165",
    "VanDeusen": "V532",
    "": "",
    "123": "",
    "a": "A000",
    "h": "H000",
}


def test_soundex_spark_goldens(spark):
    df = spark.createDataFrame([(n,) for n in GOLDEN], ["name"])
    got = {r["name"]: r["code"] for r in df.select("name", soundex_code("name").alias("code")).collect()}
    assert got == GOLDEN


def test_soundex_sql_matches_goldens():
    con = duckdb.connect()
    for name, code in GOLDEN.items():
        lit = "'" + name.replace("'", "''") + "'"
        (got,) = con.execute("select " + soundex_sql(lit)).fetchone()
        assert got == code, name


@pytest.mark.parametrize("name", ["Euler", "Gauss", "Hilbert", "Knuth", "Lloyd", "Lukasiewicz"])
def test_soundex_spark_equals_sql(spark, name):
    df = spark.createDataFrame([(name,)], ["name"])
    (spark_code,) = df.select(soundex_code("name")).first()
    (duck_code,) = duckdb.connect().execute("select " + soundex_sql("'" + name + "'")).fetchone()
    assert spark_code == duck_code


def test_soundex_blocks_similar_names(spark):
    # same-sounding surname variants land in one block
    df = spark.createDataFrame(
        [("Smith",), ("Smyth",), ("Schmidt",), ("Jones",)], ["name"]
    )
    codes = df.select(soundex_code("name").alias("c")).collect()
    c = [r["c"] for r in codes]
    assert c[0] == c[1]  # Smith == Smyth
    assert c[0] != c[3]  # Smith != Jones
