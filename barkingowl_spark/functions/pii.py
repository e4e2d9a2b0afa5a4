"""PII scan + redaction — the pre-training privacy pass: count and mask
email-like and phone-like tokens. The detection rule is deliberately
built from string PRIMITIVES (split_part/translate/LIKE), not regex:
Spark compiles Java regex and DuckDB RE2, and subtle dialect divergence
in a privacy gate is exactly the bug class an oracle-checked pipeline
exists to exclude. The rule IS the spec, and both engines run it
verbatim:

  email(t): exactly one '@', non-empty local part, domain len >= 3
            containing an interior '.' (no leading/trailing dot)
  phone(t): after stripping '+', '-', '(', ')': >= 7 chars, all digits

Tokens are space-split per newline-split line, so redaction preserves
the document's exact line structure and whitespace runs (empty tokens
survive the round-trip).

Scale shape (10^10 docs): both ops are pure per-row JVM expressions —
no shuffle at all for redaction, one doc_id-keyed map-side-combined
aggregation for the scan. Whole-stage-codegen keeps everything in one
pass over the scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_MASK = "<EMAIL>"
PHONE_MASK = "<PHONE>"

# SQL-fragment predicates over a token expression `t` — shared between
# the scan and the redaction transform (and mirrored in oracle SQL).
_EMAIL_PRED = (
    "(length({t}) - length(replace({t}, '@', '')) = 1"
    " AND length(split_part({t}, '@', 1)) >= 1"
    " AND length(split_part({t}, '@', 2)) >= 3"
    " AND split_part({t}, '@', 2) LIKE '%.%'"
    " AND NOT split_part({t}, '@', 2) LIKE '.%'"
    " AND NOT split_part({t}, '@', 2) LIKE '%.')"
)
_PHONE_PRED = (
    "(length(translate({t}, '+-()', '')) >= 7"
    " AND translate(translate({t}, '+-()', ''),"
    " '0123456789', '') = '')"
)


def pii_scan(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, email_tokens, phone_tokens, has_pii): per-doc counts of
    matching tokens (email rule wins when both match, as in redaction).
    """
    flat = docs.select(
        id_col, F.translate(F.col(text_col), "\n", " ").alias("t0"))
    toks = "filter(split(t0, ' '), x -> x <> '')"
    email = _EMAIL_PRED.format(t="x")
    phone = _PHONE_PRED.format(t="x")
    # NULL text scans as 0/0/False (a doc with no text has no PII);
    # redact() instead preserves NULL -> NULL (no text to mask)
    counted = flat.select(
        id_col,
        F.coalesce(
            F.expr(f"size(filter({toks}, x -> {email}))").cast("long"),
            F.lit(0),
        ).alias("email_tokens"),
        F.coalesce(
            F.expr(f"size(filter({toks}, x -> NOT {email} AND {phone}))")
            .cast("long"),
            F.lit(0),
        ).alias("phone_tokens"),
    )
    return counted.select(
        id_col, "email_tokens", "phone_tokens",
        ((F.col("email_tokens") > 0) | (F.col("phone_tokens") > 0))
        .alias("has_pii"),
    )


def redact(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text") -> DataFrame:
    """(id, text_redacted): email tokens -> <EMAIL>, phone tokens ->
    <PHONE>, everything else (including whitespace runs and line
    breaks) byte-identical."""
    email = _EMAIL_PRED.format(t="t")
    phone = _PHONE_PRED.format(t="t")
    expr = (
        f"array_join(transform(split({text_col}, '\\n'), line -> "
        f"array_join(transform(split(line, ' '), t -> "
        f"CASE WHEN {email} THEN '{EMAIL_MASK}' "
        f"WHEN {phone} THEN '{PHONE_MASK}' "
        f"ELSE t END), ' ')), '\\n')"
    )
    return docs.select(
        id_col, F.expr(expr).alias("text_redacted"))
