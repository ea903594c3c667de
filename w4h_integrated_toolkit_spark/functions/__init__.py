"""Scalar Column helpers — the engine's C-family functions (SURVEY §2.7).

All are pure Column expressions (JVM-side, whole-stage-codegen'd); no Python
UDFs here. Each cites the reference behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "kcal_to_kj",
    "mets",
    "age_from_dob",
    "seconds_of_day",
    "time_of_day_between",
    "portable_hash32",
    "portable_hash31",
    "rolling_hash",
    "word_shingles",
]

KCAL_TO_KJ = 4.186  # viz.py:76 — kcal -> kJ conversion factor
DEFAULT_WEIGHT_KG = 70.0  # viz.py:74 / import_hub_main.py:77 — default subject weight


def kcal_to_kj(cal: Column) -> Column:
    """Unit conversion, viz.py:76."""
    return cal * F.lit(KCAL_TO_KJ)


def mets(cal_kcal: Column, weight_kg: Column) -> Column:
    """METs derivation (viz.py:71-78): kJ / weight, defaulting weight to 70 kg
    when the subject has no recorded weight (dict-default in the reference,
    broadcast-join + coalesce here)."""
    return kcal_to_kj(cal_kcal) / F.coalesce(weight_kg, F.lit(DEFAULT_WEIGHT_KG))


def age_from_dob(dob: Column) -> Column:
    """Age in whole years from date-of-birth (data_preproc.ipynb cell 2)."""
    return F.floor(F.months_between(F.current_date(), dob) / 12).cast("int")


def seconds_of_day(ts: Column) -> Column:
    """Seconds since UTC midnight — basis for time-of-day slicing (F10)."""
    # pmod guards negative epochs; timestamps here are instants, so this is
    # timezone-stable (session TZ pinned to UTC).
    return F.pmod(F.unix_timestamp(ts), F.lit(86400))


def time_of_day_between(ts: Column, start_sec: int, end_sec: int) -> Column:
    """Time-of-day range predicate incl. overnight wrap (viz.py:1074, ranges
    defined viz.py:542-547, e.g. Evening 20:00 -> 04:45 next day).

    Non-wrapping (start <= end): ``tod BETWEEN start AND end``.
    Wrapping (start > end): two-arm OR ``tod >= start OR tod <= end`` — the
    explicit compilation SURVEY §7 calls out (no single built-in exists).
    """
    tod = seconds_of_day(ts)
    if start_sec <= end_sec:
        return tod.between(start_sec, end_sec)
    return (tod >= start_sec) | (tod <= end_sec)


def portable_hash32(col: Column) -> Column:
    """Deterministic 32-bit string hash that DuckDB can reproduce exactly:
    first 8 hex digits of MD5, as a BIGINT. Used for exact-dedup
    fingerprints and LSH band keys so the DuckDB oracle can verify them
    (Spark's ``hash()`` and DuckDB's ``hash()`` are engine-specific)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# Modulus for the polynomial rolling hash: 2^31 - 1 (Mersenne prime). Both
# engines evaluate (acc*31 + ascii) % M in BIGINT, so results match exactly.
ROLLING_HASH_MOD = 2147483647


def portable_hash31(col: Column) -> Column:
    """portable_hash32 reduced mod 2^31-1 — the hot-path hash for MinHash
    domains. MD5 runs JVM-side inside whole-stage codegen (~100ns/value),
    where the per-character array fold of :func:`rolling_hash` runs
    interpreted per element (measured >30x slower at corpus scale). Keeping
    h < 2^31 makes ``a*h + b`` overflow-safe in BIGINT for LCG permutation
    constants a,b < 2^31. DuckDB side:
    ``CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % 2147483647``.
    """
    return portable_hash32(col) % F.lit(ROLLING_HASH_MOD)


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash h = fold(h*31 + ascii(ch)) mod (2^31-1).

    The document-fingerprinting primitive (training-data pipeline ops): pure
    built-in expression (split -> transform -> aggregate), reproducible in
    DuckDB as list_reduce over string_split — the oracle for MinHash et al.
    """
    # filter the trailing "" Spark's split-on-empty-pattern emits (DuckDB's
    # string_split does not)
    chars = F.filter(F.split(col, ""), lambda c: F.length(c) > 0)
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(ROLLING_HASH_MOD),
    )


def word_shingles(text: Column, n: int) -> Column:
    """Word-level n-gram shingles as an array<string>.

    ``split(text, '\\s+')`` then a sliding window of n words joined by a
    single space. Documents shorter than n words produce an empty array.
    """
    words = F.split(F.trim(text), r"\s+")
    k = F.size(words) - F.lit(n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
