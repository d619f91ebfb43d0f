"""Reusable column expressions mirroring the reference's helper functions.

All JVM-side (codegen'd) — no Python UDFs here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Verbatim pattern from shipper.js:22 (Java-regex compatible as-is):
# ISO-8601 ms timestamp + Z, [space|tab], 8-4-4-4-12 alphanumeric token,
# [space|tab], free text. Unanchored — JS .match() and Spark rlike both
# substring-search, so parity holds.
STRUCTURED_LOG_PATTERN = (
    "[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[1-2][0-9]|3[0-1])"
    "T(2[0-3]|[01][0-9]):[0-5][0-9]:[0-5][0-9].[0-9][0-9][0-9]Z"
    "([ \\t])[a-zA-Z0-9]{8}-[a-zA-Z0-9]{4}-[a-zA-Z0-9]{4}-[a-zA-Z0-9]{4}"
    "-[a-zA-Z0-9]{12}([ \\t])(.*)"
)

# checkLogError buckets (shipper.js:4-14), case-insensitive substring
# matches. Precedence preserved: generic 'error' first (Q1 — so
# 'module initialization error' classifies as runtime, never reaches the
# configuration bucket).
ERROR_PATTERNS = ["error"]
CONFIGURATION_ERROR_PATTERNS = ["module initialization error", "unable to import module"]
TIMEOUT_ERROR_PATTERNS = ["task timed out", "process exited before completing"]

PLATFORM_PREFIXES = ["START RequestId", "END RequestId", "REPORT RequestId"]


def lambda_name(log_group: Column) -> Column:
    """Last '/'-segment of logGroup (shipper.js:28). A string without '/'
    returns itself; trailing '/' returns '' — exact JS split/reverse parity."""
    return F.element_at(F.split(log_group, "/"), -1)


def lambda_version(log_stream: Column) -> Column:
    """Text between first '[' and first ']' of logStream (shipper.js:27).

    Replicates JS ``substring(indexOf('[')+1, indexOf(']'))`` exactly,
    including the clamp-and-swap semantics of JS String.substring for
    pathological inputs (no '[' -> '', '[' without ']' -> prefix swap).
    """
    n = F.length(log_stream)
    start = F.least(F.instr(log_stream, "["), n)  # JS indexOf('[')+1, clamped
    end = F.least(F.greatest(F.instr(log_stream, "]") - F.lit(1), F.lit(0)), n)
    lo = F.least(start, end)
    hi = F.greatest(start, end)
    return F.substring(log_stream, lo + F.lit(1), hi - lo)


def is_platform_message(message: Column) -> Column:
    """Lambda platform lines dropped before parsing (shipper.js:63-69)."""
    out = F.lit(False)
    for p in PLATFORM_PREFIXES:
        out = out | message.startswith(p)
    return out


def _contains_any(lower_msg: Column, needles: list[str]) -> Column:
    out = F.lit(False)
    for needle in needles:
        out = out | lower_msg.contains(needle)
    return out


def severity_columns(message: Column) -> tuple[Column, Column]:
    """(severity, error.type) per checkLogError (shipper.js:31-49).

    Case-insensitive substring buckets in reference precedence order (Q1).
    Implemented as contains() over lower() — cheaper than regex, same
    semantics for these literal patterns, and fully codegen'd.
    """
    low = F.lower(message)
    severity = F.when(
        _contains_any(
            low,
            ERROR_PATTERNS + CONFIGURATION_ERROR_PATTERNS + TIMEOUT_ERROR_PATTERNS,
        ),
        F.lit("error"),
    ).otherwise(F.lit("debug"))
    error_type = (
        F.when(_contains_any(low, ERROR_PATTERNS), F.lit("runtime"))
        .when(_contains_any(low, CONFIGURATION_ERROR_PATTERNS), F.lit("configuration"))
        .when(_contains_any(low, TIMEOUT_ERROR_PATTERNS), F.lit("timeout"))
        .otherwise(F.lit(None).cast("string"))
    )
    return severity, error_type
