"""Shared 60-bit md5 column hash.

md5_h60_col(c) = conv(substring(md5(c), 1, 15), 16, 10) cast BIGINT:
15 hex chars = 60 bits, fits a signed 64-bit on every engine involved,
bit-identical to Python's int(hashlib.md5(s).hexdigest()[:15], 16)
(webmodel.attr_h60) and to DuckDB's ('0x'||substring(md5(t),1,15))::BIGINT.

One law, three consumers — SimHash signatures (operators/dedup.py),
winnowing fingerprints (functions/text_analysis.py) and the crawl's
politeness/priority attributes (operators/frontier.host_attr_cols) —
each with an oracle or a pure-Python twin that must stay bit-equal.
Change it nowhere or everywhere; never in one copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_h60_col(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_h120_cols(md5_hex: Column | str) -> tuple[Column, Column]:
    """(hi, lo) 60-bit BIGINT halves of an ALREADY-MATERIALIZED md5
    hex column — a 120-bit grouping key for corpus-scale exact-dedup
    laws where 60 bits is not enough (at 10^10 distinct paragraphs a
    single h60 expects ~40 birthday collisions; at 2^120 the
    expectation is ~4e-17). Two fixed-width integers instead of the
    string itself keeps shuffle keys at 16 bytes.

    Takes the md5 HEX column, not the plaintext: two calls to F.md5
    inside one projection would hash the input twice (trees, not DAGs)
    — materialize `F.md5(x)` as a column first, then split it.
    DuckDB mirror: substring(md5(x), 1, 15) / substring(md5(x), 16,
    15), each through the '0x' BIGINT cast."""
    h = F.col(md5_hex) if isinstance(md5_hex, str) else md5_hex
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        F.conv(F.substring(h, 16, 15), 16, 10).cast("long"),
    )
