"""Text preprocessing as Catalyst Column expressions.

Parity targets (behavior only — implementation is Spark-native):
- tokenizer semantics of the reference ``Attribute._tokenize``
  (/root/reference/src/entity_resolver/core/graph.py:87-90):
  strip -> replace ``[^a-zA-Z0-9]`` with space -> lower -> whitespace split
  (Python ``str.split()`` drops empty tokens).
- person-name cleaner of ``Attribute._clean_person_name`` (graph.py:92-110):
  ``'wang_w_w'`` -> last='wang', first='w w'.

Each helper also ships a DuckDB-SQL rendering (used by the correctness oracle)
so Spark and the SQL oracle share one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-zA-Z0-9]"


def tokenize(col: Column | str) -> Column:
    """Tokenize text with the reference's exact semantics.

    strip -> non-alphanumeric runs to spaces -> lower -> split, dropping empty
    tokens. Returns ``array<string>`` (empty array for all-punctuation text,
    matching Python's ``''.split() == []``). NULL text yields NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.lower(F.regexp_replace(F.trim(c), TOKEN_PATTERN, " "))
    return F.filter(F.split(cleaned, " "), lambda t: t != F.lit(""))


def tokenize_sql(expr: str) -> str:
    """DuckDB SQL with semantics identical to :func:`tokenize`."""
    return (
        "list_filter(string_split(lower(regexp_replace(trim({e}), "
        "'[^a-zA-Z0-9]', ' ', 'g')), ' '), t -> t <> '')"
    ).format(e=expr)


def clean_person_name(col: Column | str) -> Column:
    """``'wang_w_w'`` -> struct(last='wang', first='w w')."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "_")
    last = F.element_at(parts, 1)
    first = F.trim(F.array_join(F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), " "))
    return F.struct(last.alias("last"), first.alias("first"))


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-grams (shingles) of the lowercased text, for MinHash/Jaccard.

    Produces ``array<string>`` of all length-``n`` substrings; texts shorter
    than ``n`` yield a single shingle (the whole text). Built entirely from
    JVM-side expressions (sequence + transform), no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(c))
    count = F.greatest(F.length(s) - F.lit(n - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), count), lambda i: s.substr(i, F.lit(n)))


def token_ngrams(tokens: Column | str, n: int = 3) -> Column:
    """Word n-grams over a token array (``array<string>`` -> ``array<string>``).

    Arrays shorter than ``n`` yield one gram (the whole array); empty arrays
    yield an empty result (guarded: Spark's ``sequence(1, 0)`` would count
    *down*, not produce an empty sequence).
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    count = F.greatest(F.size(c) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(c, i, n), " "),
    )
    return F.when(F.size(c) > 0, grams).otherwise(F.array().cast("array<string>"))
