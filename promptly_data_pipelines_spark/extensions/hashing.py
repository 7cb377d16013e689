"""Oracle-expressible 64-bit-ish hash family (r6): both Spark and
DuckDB parse the SAME md5 hex substring big-endian, so every
hash-derived value in minhash/simhash/winnowing is bit-identical
across engines and those queries carry full value-hash oracle checks
instead of rows-only ones.

  Spark : conv(substring(md5(x), start, 16), 16, -10)::long & mask
  DuckDB: CAST(('0x' || substr(md5(x), start, 16))::UBIGINT % (mask+1) AS BIGINT)

(conv(..,-10) parses two's-complement signed; the mask keeps only low
bits, where signed and unsigned agree — verified value-for-value in
tests/test_properties.py.) Masks stay ANSI-overflow-safe: minhash
double hashing h_i = h1 + i*h2 needs h1 < 2^62 and i*h2 < 16*2^58 =
2^62, so h_i < 2^63 with no wraparound under Spark 4's default ANSI
mode.

At 100 TB, once cross-engine verification is out of the loop, swap
the family for xxhash64 (same call sites — cheaper per byte, no
crypto rounds); the md5 form is what makes the operators testable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_MASK63 = (1 << 63) - 1
_MASK62 = (1 << 62) - 1
_MASK58 = (1 << 58) - 1


def _md5_word(col, start: int, mask: int):
    """Low bits of an 8-byte big-endian window of md5(col) — the
    cross-engine hash primitive documented above."""
    return (
        F.conv(F.substring(F.md5(col), start, 16), 16, -10)
        .cast("long")
        .bitwiseAND(F.lit(mask))
    )


def md5h63(col):
    """63-bit uniform hash of a string column (simhash bit votes,
    winnowing gram hashes)."""
    return _md5_word(col, 17, _MASK63)


# DuckDB twins of the hash primitives, for oracle SQL f-strings
_SQL_H63 = "CAST(('0x' || substr(md5({x}), 17, 16))::UBIGINT % 9223372036854775808 AS BIGINT)"
_SQL_H1 = "CAST(('0x' || substr(md5({x}), 17, 16))::UBIGINT % 4611686018427387904 AS BIGINT)"
_SQL_H2 = "CAST(('0x' || substr(md5({x}), 1, 16))::UBIGINT % 288230376151711744 AS BIGINT)"
