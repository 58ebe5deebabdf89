"""PII scrubbing for the training-data pipeline: redact emails, SSNs,
payment-card numbers, IPv4 addresses, and phone numbers from a text
column, with per-category match counts.

This is the curation stage the reference lacks entirely (it stops at
record I/O — /root/reference/warc/warc.py never looks inside payloads);
a modern corpus pipeline scrubs PII between extraction and packing.

Plan shape for 100 TB: the whole operator is a chain of
``regexp_replace`` / ``regexp_count`` built-ins — JVM-side, whole-stage
codegen, strictly map-only (zero shuffle, zero Python). Patterns are
written in the Java-regex ∩ RE2 common subset (no lookaround, no
backreferences) so the DuckDB oracle replays the exact same automaton —
the same trick as ``text.bpe_token_count``.

Rules apply IN ORDER, each to the output of the previous one, and each
rule's count is taken on the text state it actually saw — so counts sum
to the number of redactions performed, with no double counting when
patterns could overlap (an SSN is never also counted as a phone).
Patterns are deliberately high-recall / lenient (e.g. the IPv4 rule
matches any dotted quad without octet range checks): for scrubbing,
a false redaction is cheap and a miss is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement token) — applied in this order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("cc", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CC>"),
    ("cc_plain", r"\b\d{15,16}\b", "<CC>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"(?:\(\d{3}\)[ .-]?|\b\d{3}[ .-])\d{3}[ .-]\d{4}\b",
     "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_clean",
    counts: bool = True,
    prefix: str = "pii_",
) -> DataFrame:
    """Add ``out_col`` = ``text_col`` with every :data:`PII_RULES` match
    replaced by its token, plus (when ``counts``) one ``<prefix><name>``
    bigint column per rule and ``<prefix>total``.

    Null text passes through null with zero counts. Purely map-side
    built-ins — safe to run over the full corpus at any scale."""
    cur = F.col(text_col)
    count_cols: list[tuple[str, F.Column]] = []
    for name, pat, tok in PII_RULES:
        if counts:
            c = F.coalesce(
                F.regexp_count(cur, F.lit(pat)), F.lit(0)
            ).cast("bigint")
            count_cols.append((prefix + name, c))
        cur = F.regexp_replace(cur, pat, tok)
    out = df.withColumn(out_col, cur)
    if counts:
        total = None
        for cname, c in count_cols:
            out = out.withColumn(cname, c)
            total = c if total is None else total + c
        out = out.withColumn(prefix + "total", total)
    return out


def pii_scrub_oracle_ctes(
    base_cte: str, text_expr: str = "text"
) -> tuple[str, str]:
    """Build the DuckDB CTE chain replaying :func:`scrub_pii` over
    ``base_cte`` (which must expose ``text_expr``), staged exactly like
    the Spark chain (each count on the previous rule's output).

    Returns ``(with_clause_body, final_cte_name)``; the final CTE carries
    every base column plus ``pii_<name>`` counts, ``pii_total`` and
    ``text_clean``. Counts use ``len(regexp_extract_all(...))`` (DuckDB
    has no regexp_count); replacement uses the ``'g'`` flag to match
    Spark's replace-all."""
    ctes = []
    prev = base_cte
    cur_text = text_expr
    names = []
    for i, (name, pat, tok) in enumerate(PII_RULES):
        sql_pat = pat.replace("'", "''")
        cte = f"pii_s{i}"
        ctes.append(
            f"{cte} AS (SELECT *,"
            f" CAST(len(regexp_extract_all({cur_text}, '{sql_pat}')) AS BIGINT)"
            f" AS pii_{name},"
            f" regexp_replace({cur_text}, '{sql_pat}', '{tok}', 'g')"
            f" AS t_{i} FROM {prev})"
        )
        prev = cte
        cur_text = f"t_{i}"
        names.append(f"pii_{name}")
    last = len(PII_RULES) - 1
    ctes.append(
        f"pii_final AS (SELECT *, {' + '.join(names)} AS pii_total,"
        f" t_{last} AS text_clean FROM {prev})"
    )
    return ",\n".join(ctes), "pii_final"
