"""Scalar string/text column functions (SURVEY.md §2.9 F1-F11).

Every function here is a pure ``Column -> Column`` built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python in
the hot path.  Reference citations are per-function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_control_chars(c: Column) -> Column:
    """F1 — remove \\n \\r \\t (datashow.ipynb cell 23)."""
    return F.regexp_replace(c, "[\\n\\r\\t]", "")


def normalize_whitespace(c: Column, keep_single_space: bool = True) -> Column:
    """F3 — collapse/remove whitespace (datashow.ipynb cell 56 removes it
    entirely; the engine defaults to collapsing to single spaces, which is
    what dedup shingling needs)."""
    if keep_single_space:
        return F.trim(F.regexp_replace(c, "[\\s\\x0B]+", " "))
    return F.regexp_replace(c, "[\\s\\x0B]+", "")


def truncate(c: Column, n: int) -> Column:
    """F4 — byte-honest truncate (author→255 at datashow.ipynb cell 45;
    sentiment input→300 at spark_daily_report.py:177)."""
    return F.substring(c, 1, n)


def first_sentence(c: Column, terminator: str = "다.", fallback_len: int = 40) -> Column:
    """F5 — first-sentence summary (spark_daily_report.py:180).

    ``content.split("다.")[0] + "다."`` when the terminator occurs, else
    the first ``fallback_len`` chars.  Terminator is parameterized so the
    same op serves Korean ("다.") and Latin (". ") corpora.
    """
    lit_term = F.lit(terminator)
    head = F.concat(F.split(c, F.lit(_regex_escape(terminator)))[0], lit_term)
    return F.when(c.contains(terminator), head).otherwise(F.substring(c, 1, fallback_len))


def split_trim_csv(c: Column) -> Column:
    """F6 — comma-split → trimmed array (consumer.py:142, consumer2.py:76)."""
    return F.transform(F.split(c, ","), lambda x: F.trim(x))


def korean_line_filter(c: Column, min_hangul: int = 3) -> Column:
    """F2 — keep newline-separated lines containing a run of >=3 Hangul
    syllables, re-join with spaces (collect/consumer.py:103-113, regex at
    :109)."""
    pattern = "[가-힣]{%d,}" % min_hangul
    lines = F.split(c, "\\n")
    kept = F.filter(lines, lambda line: line.rlike(pattern))
    return F.array_join(kept, " ")


def tokenize_ws(c: Column) -> Column:
    """F10 test-mode tokenizer — whitespace split standing in for the
    konlpy Okt noun extractor (spark_daily_report.py:31-36); pluggable
    with the pandas_udf tokenizer in functions/udfs.py."""
    return F.filter(F.split(F.trim(c), "[\\s\\x0B]+"), lambda t: t != F.lit(""))


def tokenize_words(c: Column) -> Column:
    """BPE-ish word tokenizer: lowercase, split on non-alphanumerics
    (keeps CJK blocks as runs).  Used by token counting and shingling."""
    return F.filter(
        F.split(F.lower(c), "[^\\p{L}\\p{N}]+"),
        lambda t: t != F.lit(""),
    )


def _regex_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in ".\\+*?[^]$(){}=!<>|:-#&~":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)
