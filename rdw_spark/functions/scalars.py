"""Scalar helpers beyond pyspark.sql.functions (SURVEY.md §2.9).

Everything in the reference's documented SQL maps to a Catalyst built-in
(concat/coalesce/substring/md5/to_date/timestamp arithmetic/when — see the
§2.9 table); the only true gaps are below. UDFs here are Arrow-batched
pandas_udfs, never row-at-a-time.
"""

from __future__ import annotations

import html
import re
from datetime import timedelta

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def html_unescape(s: pd.Series) -> pd.Series:
    """HTML-entity unescape — used by reference pipeline scripts on embedded
    item text (docs/Runbook.Pipeline.md:343-407); no Catalyst equivalent."""
    return s.map(lambda v: html.unescape(v) if v is not None else None)


def unicode_normalize(col: Column, form: str = "NFKC",
                      strip_control: bool = True) -> Column:
    """Unicode normalization for corpus hygiene — the pre-dedup pass that
    stops 'e' + COMBINING ACUTE and the precomposed 'é' (or width/ligature
    variants under NFKC) from defeating exact and shingle dedup. Catalyst
    has no normalizer, so this is one of the repo's few Python paths:
    an Arrow-batched pandas_udf (never row-at-a-time), one map-only pass.
    ``strip_control`` also removes C0/C1 control chars except tab/newline
    (the usual crawl junk). NFC output is hash-verified against DuckDB's
    nfc_normalize in ``zz_text_normalize``; NFKC folding is pytest-covered
    (DuckDB has no NFKC to oracle against)."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"bad normalization form: {form!r}")
    import unicodedata

    ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]") if strip_control else None

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            v = unicodedata.normalize(form, v)
            return ctrl.sub("", v) if ctrl is not None else v

        return s.map(one)

    return _norm(col)


_ISO_DUR = re.compile(
    r"^(?P<sign>[+-])?P(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)


def parse_iso_duration(s: str) -> timedelta:
    """ISO-8601 duration (API param form, e.g. ``-PT1H`` — docs/API.md:430-432)
    → timedelta. Driver-side: durations arrive as single API params."""
    m = _ISO_DUR.match(s.strip())
    if not m or (m.group("days") is None and m.group("hours") is None
                 and m.group("minutes") is None and m.group("seconds") is None):
        raise ValueError(f"bad ISO-8601 duration: {s!r}")
    td = timedelta(
        days=int(m.group("days") or 0), hours=int(m.group("hours") or 0),
        minutes=int(m.group("minutes") or 0), seconds=int(m.group("seconds") or 0),
    )
    return -td if m.group("sign") == "-" else td


def after_expr(duration: str, ts_col: str = "updated") -> Column:
    """Row filter for the reference's relative-time params (P8):
    ``after=-PT1H`` → ``ts_col >= now() - 1 hour``."""
    td = parse_iso_duration(duration)
    seconds = int(abs(td.total_seconds()))
    bound = F.current_timestamp() - F.expr(f"INTERVAL {seconds} SECOND")
    return F.col(ts_col) >= bound
