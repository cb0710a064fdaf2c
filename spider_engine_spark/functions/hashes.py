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
