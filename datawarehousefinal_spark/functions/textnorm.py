"""Text normalization (SURVEY.md §2.7 F1-F5).

The reference normalizes free-text columns before matching and dim
construction: lowercase + NFD accent strip + whitespace collapse
(Datos/preprocessing.py:14-21) and Kettle trim/lower steps
(etl_final.ktr:3158-3162, 3366-3369). All implemented as JVM-side column
expressions so the hot path stays inside whole-stage codegen; the exact
Unicode-NFD variant is available as an Arrow-batched pandas UDF behind a
flag for parity corner cases (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spanish-corpus accent map — covers every accented char the reference's
# data contains (á é í ó ú ü ñ and uppercase). `translate` is codegen'd;
# the NFD UDF below is the exact-parity fallback.
_ACCENTED = "áéíóúüñÁÉÍÓÚÜÑàèìòùâêîôûäëïöÀÈÌÒÙÂÊÎÔÛÄËÏÖ"
_PLAIN = "aeiouunAEIOUUNaeiouaeiouaeioAEIOUAEIOUAEIO"


def lower(col: Column | str) -> Column:
    """F1: lowercase (Kettle lower_upper=lower, etl_final.ktr:3158-3162)."""
    return F.lower(F.col(col) if isinstance(col, str) else col)


def trim(col: Column | str) -> Column:
    """F4: both-side trim (etl_final.ktr:3161,3369)."""
    return F.trim(F.col(col) if isinstance(col, str) else col)


def strip_accents(col: Column | str) -> Column:
    """F2: accent strip via codegen'd translate (Spanish corpus coverage).

    Reference: unicodedata.normalize('NFD') + drop combining marks
    (Datos/preprocessing.py:18-19). For the Latin-1 range the reference's
    data actually uses, a char-map translate is semantically identical and
    stays JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _ACCENTED, _PLAIN)


def strip_accents_nfd(col: Column | str) -> Column:
    """F2 exact-parity variant: true Unicode NFD via Arrow-batched pandas
    UDF. ~10-100× slower than `strip_accents`; only for corpora with
    combining marks outside the Latin map."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfd(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda x: (
                "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", x)
                    if unicodedata.category(ch) != "Mn"
                )
                if x is not None
                else None
            )
        )

    return _nfd(F.col(col) if isinstance(col, str) else col)


def collapse_whitespace(col: Column | str) -> Column:
    """F3: `' '.join(text.split())` (Datos/preprocessing.py:21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_text(col: Column | str) -> Column:
    """The reference's composite normalize_text: lower → accent strip →
    whitespace collapse (Datos/preprocessing.py:14-21). Idempotent."""
    return collapse_whitespace(strip_accents(lower(col)))


def normalize_column_names(df):
    """F5: apply text normalization to header names
    (Datos/preprocessing.py:125). Spaces become underscores so the names
    stay referenceable."""
    import unicodedata

    def norm(name: str) -> str:
        stripped = "".join(
            ch
            for ch in unicodedata.normalize("NFD", name.lower())
            if unicodedata.category(ch) != "Mn"
        )
        return "_".join(stripped.split())

    return df.toDF(*[norm(c) for c in df.columns])
