"""Seeded randomized differential for the robots rules engine: the Spark
filter (regex compile + rlike + array_max reduction, JVM regex) must agree
with the scalar engine (Python re) on every generated (body, path) pair —
including wildcard pile-ups, $ anchors, regex metacharacters, tie lengths,
junk lines and odd group layouts. One DataFrame, one job, 2000 verdicts."""

from __future__ import annotations

import random
import re

from pyspark.sql import Row

from frontier.robots import parse_robots_body, parse_robots_rules, robots_filter

PATTERN_CHARS = list("abc123/*.$?+()[]-_%~ ")
PATH_CHARS = list("abc123/.$?&=+()%~")


def _rand_pattern(rng: random.Random) -> str:
    n = rng.randint(1, 10)
    body = "".join(rng.choice(PATTERN_CHARS) for _ in range(n))
    prefix = "/" if rng.random() < 0.8 else ""
    suffix = "$" if rng.random() < 0.25 else ""
    return prefix + body + suffix


def _rand_body(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(1, 4)):  # groups
        for _ in range(rng.randint(1, 2)):
            lines.append(
                "User-agent: "
                + rng.choice(["*", "frontierbot", "frontier", "otherbot"])
            )
        for _ in range(rng.randint(0, 5)):
            kind = rng.choice(["Allow", "Disallow", "Crawl-delay", "junk"])
            if kind == "Crawl-delay":
                lines.append(f"Crawl-delay: {rng.choice(['2', '0.5', 'zz'])}")
            elif kind == "junk":
                lines.append(rng.choice(["# comment", "", "not a directive",
                                         "Sitemap: http://x/s.xml"]))
            else:
                value = "" if rng.random() < 0.1 else _rand_pattern(rng)
                lines.append(f"{kind}: {value}")
    return "\n".join(lines)


def _rand_path(rng: random.Random) -> str:
    n = rng.randint(0, 12)
    path = "/" + "".join(rng.choice(PATH_CHARS) for _ in range(n))
    # keep it a valid single-URL path: no spaces, '#' excluded from alphabet
    return path


def scalar_verdict(body: str, path: str) -> bool:
    _, rules = parse_robots_body(body, "frontierbot/1.0")
    best = None
    for (_, rx, plen, allow) in rules:
        if re.match(rx, path) and (best is None or (plen, allow) > best):
            best = (plen, allow)
    return best is None or best[1]


def test_spark_filter_equals_scalar_on_random_corpus(spark):
    rng = random.Random(20260818)
    n_hosts, paths_per_host = 100, 20
    bodies = {f"h{i}.test": _rand_body(rng) for i in range(n_hosts)}
    cases = [
        (host, _rand_path(rng)) for host in bodies for _ in range(paths_per_host)
    ]

    rules = parse_robots_rules(
        spark.createDataFrame(
            [Row(host=h, body=b) for h, b in bodies.items()]
        ),
        "frontierbot/1.0",
    )
    urls = spark.createDataFrame(
        [Row(url=f"http://{h}{p}", host=h, path=p) for h, p in cases]
    )
    out = robots_filter(urls, rules, keep_disallowed=True, broadcast_rules=True)
    mismatches = []
    for r in out.collect():
        want = scalar_verdict(bodies[r["host"]], r["path"])
        if bool(r["robots_allowed"]) is not want:
            mismatches.append((r["host"], r["path"], want, r["robots_allowed"]))
    assert not mismatches, mismatches[:10]
    assert out.count() == n_hosts * paths_per_host
