"""JVM-vs-Python robots regex parity.

``rule_to_regex`` output is executed in TWO engines: Python ``re`` in
the pure crawl oracle (tests/oracle.py) and Java ``Pattern`` via
``regexp_like`` in the production ``politeness.robots_filter``. The
translation uses ``re.escape``, whose escapes (``\\?``, ``\\&``,
``\\~``, escaped space, …) must mean the same thing under both engines
— a divergence would silently split the oracle from the engine. This
test runs a dense matrix of adversarial rules (metachars, anchors,
nested/adjacent wildcards, unicode, backslashes) × paths through BOTH
engines in one Spark job and asserts bit-identical match outcomes,
including the plain-prefix (``re`` NULL → startswith) fast path.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import rule_to_regex

RULES = [
    "/",
    "/a",
    "/a*b",
    "/a*b$",
    "/*?*",
    "/search?q=",
    "/a.b",
    "/a.b$",
    "/*.php$",
    "/a$b",
    "/ab**c$",
    "$",
    "*",
    "*$",
    "/α*β$",
    "/a&b~c#d",
    "/a\\b",
    "/a b",
    "/(a)[b]{c}+d|e^f",
    "/a*",
    "/a**",
    "/*a*a$",
    "/%7E*",
]

PATHS = [
    "/",
    "/a",
    "/ab",
    "/aXb",
    "/a.b",
    "/axb",
    "/acb",
    "/abc",
    "/abcb",
    "/index.php",
    "/index.php?x=1",
    "/search?q=t",
    "/?",
    "/a$b",
    "/αβ",
    "/αxβ",
    "/a&b~c#d",
    "/a\\b",
    "/a b",
    "/(a)[b]{c}+d|e^f",
    "/aa",
    "/aaa",
    "/%7Ex",
    "/p7?page=2",
]


def test_regexp_like_agrees_with_python_re(spark):
    cases = [(r, p) for r in RULES for p in PATHS]
    df = spark.createDataFrame(cases, "rule string, path string")
    rx_map = {r: rule_to_regex(r) for r in RULES}
    rx_col = F.create_map(
        *[x for r in RULES for x in (F.lit(r), F.lit(rx_map[r]))]
    )[F.col("rule")]
    jvm = df.withColumn(
        "m",
        F.when(rx_col.isNull(), F.col("path").startswith(F.col("rule"))).otherwise(
            F.regexp_like("path", rx_col)
        ),
    )
    got = {(r.rule, r.path): r.m for r in jvm.collect()}
    for rule, path in cases:
        rx = rx_map[rule]
        want = path.startswith(rule) if rx is None else re.search(rx, path) is not None
        assert got[(rule, path)] == want, (rule, path, rx, got[(rule, path)], want)
