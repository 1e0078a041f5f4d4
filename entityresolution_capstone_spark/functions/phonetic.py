"""Phonetic encoding for blocking keys — American Soundex.

The reference has no phonetic blocking (its canopy blocking compares raw
strings, core/resolver.py:347-376), but Soundex keys are the classic
name-blocking scheme in record linkage (Fellegi & Sunter deployments, US
Census): same-sounding surnames land in one block at O(1) key cost.

Both an engine-side Column implementation and a SQL-text generator live here
so the driver query and its DuckDB oracle are built from the SAME steps:

1. uppercase, strip non-letters;
2. code letters (vowels+Y -> 0, H/W -> 9-transparent, consonant groups 1-6:
   ``A0 B1 C2 D3 E0 F1 G2 H9 I0 J2 K2 L4 M5 N5 O0 P1 Q2 R6 S2 T3 U0 V1 W9 X2
   Y0 Z2``);
3. delete the 9s (consonants separated only by H/W code once — NIST rule),
   then collapse runs of each digit (RE2-safe: one ``d+ -> d`` replace per
   digit, no backreferences, so DuckDB's regexp engine replays it);
4. drop the leading group unless the first letter is H/W (its own code was a
   deleted 9, so the leading group already belongs to the second letter);
5. delete vowels (0s), keep 3 digits right-padded with 0, prepend the first
   letter. Empty/garbage input -> ''.

Golden-pinned in tests/test_phonetic.py against the NIST examples
(Robert/Rupert R163, Ashcraft A261, Tymczak T522, Pfister P236,
Honeyman H555).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230129022455012623019202"
_BIG = 1 << 30  # "rest of string" length for substring


def soundex_code(col: Column | str) -> Column:
    """American Soundex code of a name (pure Column algebra, codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    d = F.translate(s, _LETTERS, _CODES)
    d = F.translate(d, "9", "")  # H/W transparent
    collapsed = d
    for dig in "0123456":
        collapsed = F.regexp_replace(collapsed, f"{dig}+", dig)
    first = F.substring(s, 1, 1)
    rest = F.when(first.isin("H", "W"), collapsed).otherwise(
        F.substring(collapsed, 2, _BIG)
    )
    digits = F.translate(rest, "0", "")
    return F.when(F.length(s) == 0, F.lit("")).otherwise(
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    )


def soundex_sql(expr: str) -> str:
    """DuckDB SQL text computing the same Soundex code as :func:`soundex_code`."""
    s = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    d = f"translate(translate({s}, '{_LETTERS}', '{_CODES}'), '9', '')"
    collapsed = d
    for dig in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{dig}+', '{dig}', 'g')"
    first = f"substr({s}, 1, 1)"
    rest = (
        f"case when {first} in ('H', 'W') then {collapsed} "
        f"else substr({collapsed}, 2) end"
    )
    digits = f"translate({rest}, '0', '')"
    return (
        f"case when length({s}) = 0 then '' "
        f"else {first} || rpad(substr({digits}, 1, 3), 3, '0') end"
    )
