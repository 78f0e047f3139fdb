"""Redaction / normalization of PII in text columns.

Reference: /root/reference/src/anonymize/anonymizer.py:8-61 — spaCy PERSON
NER, then email regex, then phone regex, then custom terms; *order is
load-bearing* (a masked email must not be re-masked as a phone). Here the
whole chain is native `regexp_replace` — zero Python, fully codegen'd.
The NER step is replaced by a deterministic dictionary regex (the corpus
draws names from known lists); on a real corpus this one step would swap
to a batched pandas UDF running `nlp.pipe` (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.config import RedactionConfig
from corporate_knowledge_extractor_spark.functions import rules


def redact_expr(col: Column, cfg: RedactionConfig = RedactionConfig()) -> Column:
    """The anonymize() chain as a single column expression. Patterns come
    from the config (defaults mirror functions/rules.py) so deployments
    can override them per-preset — overriding a config field must never
    be a silent no-op."""
    out = col
    if cfg.mask_names:
        out = F.regexp_replace(out, cfg.name_pattern, rules.MASK_PERSON)
    if cfg.mask_emails:
        out = F.regexp_replace(out, cfg.email_pattern, rules.MASK_EMAIL)
    if cfg.mask_phones:
        out = F.regexp_replace(out, cfg.phone_pattern, rules.MASK_PHONE)
    for term in cfg.custom_terms:
        # anonymizer.py:52-59: literal, case-insensitive
        escaped = "".join("\\" + c if not c.isalnum() else c for c in term)
        out = F.regexp_replace(out, "(?i)" + escaped, "[REDACTED]")
    return out


def redact_columns(
    df: DataFrame, columns: list[str], cfg: RedactionConfig = RedactionConfig()
) -> DataFrame:
    """Apply the chain to each named column in place — the reference
    anonymizes speech / slide_text / frame text in place
    (scripts/run.py:86-91)."""
    out = df
    for c in columns:
        out = out.withColumn(c, redact_expr(F.col(c), cfg))
    return out
