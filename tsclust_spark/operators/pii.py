"""PII detection and redaction over a document corpus.

Training-data pipelines scrub personally identifiable information
before anything else sees the text (reference pipelines: CCNet,
RefinedWeb, Dolma all run a regex scrub pass).  This operator counts
and masks three conservative, engine-portable pattern classes:

- ``email``  — ``EMAIL_RE`` (local@domain.tld)
- ``ipv4``   — dotted quads (word-bounded)
- ``id_num`` — SSN-shaped ``ddd-dd-dddd`` (word-bounded)

Counts are computed on the ORIGINAL text per class (independent,
order-free); ``redacted_text`` applies the three substitutions as a
fixed chain (email -> ipv4 -> id) so the output is deterministic even
where classes could overlap.  The patterns avoid lookarounds and
backreferences so the exact same strings compile identically under
Java's regex (Spark) and RE2 (DuckDB oracle) — the portability is the
contract, asserted by the oracle gate.

Scale shape: map-only JVM ``regexp_count`` / ``regexp_replace`` — zero
shuffle, fused into the scan.  No Python in the row path.  False
negatives are by design (obfuscated PII needs an NER model, out of
scope); the operator is the plumbing + the exact-match tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
ID_RE = r"\b\d{3}-\d{2}-\d{4}\b"

MASKS = {"email": "<EMAIL>", "ipv4": "<IP>", "id_num": "<ID>"}
PATTERNS = {"email": EMAIL_RE, "ipv4": IPV4_RE, "id_num": ID_RE}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_email`` / ``n_ipv4`` / ``n_id`` match counts,
    ``pii_total``, and ``redacted_text``."""
    text = F.col(text_col)
    out = (
        df.withColumn("n_email", F.regexp_count(text, F.lit(EMAIL_RE)))
        .withColumn("n_ipv4", F.regexp_count(text, F.lit(IPV4_RE)))
        .withColumn("n_id", F.regexp_count(text, F.lit(ID_RE)))
    )
    out = out.withColumn(
        "pii_total", F.col("n_email") + F.col("n_ipv4") + F.col("n_id")
    )
    red = text
    for cls in ("email", "ipv4", "id_num"):
        red = F.regexp_replace(red, PATTERNS[cls], MASKS[cls])
    return out.withColumn("redacted_text", red)
