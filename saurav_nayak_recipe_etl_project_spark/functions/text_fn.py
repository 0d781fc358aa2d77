"""Reusable Column expressions for text operators.

All JVM-side (split/HOF/regexp builtins) — no Python UDFs — so the text
suite stays inside whole-stage codegen and scales linearly with bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"
# Word-or-single-punct pieces: a BPE-ish pre-tokenization regex.
BPE_PIECE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(text), WS_SPLIT)


def rolling_hash(chars_src: Column, mod: int = 2147483647, mult: int = 31) -> Column:
    """Polynomial rolling hash over the characters of a string — the
    document-fingerprint primitive, as a left-to-right fold so any
    engine reproducing the fold gets the identical value."""
    return F.aggregate(
        F.split(chars_src, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * mult + F.coalesce(F.ascii(c), F.lit(0))) % mod,
    )
