"""R8 — URL-seen set at 10^10 scale (SURVEY.md §2.4, north rule).

The reference keeps no global visited set (only per-sitemap first-wins dedup
and ancestor sets); at web scale re-fetching already-seen sitemap/page URLs
across seeds and crawl rounds dominates cost. Design:

- an exactness-safe two-stage filter: a Bloom filter broadcast to every
  partition cheaply rejects definitely-new URLs, and only Bloom-positive
  candidates are confirmed against the seen-set table with an anti-join —
  Bloom false positives therefore never drop URLs, so the surviving set
  equals the reference's semantics exactly;
- the Bloom is built distributed (one partial bitmap per partition via
  ``mapInPandas``, OR-reduced) using Kirsch-Mitzenmacher double hashing over
  blake2b digests — salted-hash per north rule; at 10^10 keys shard the
  bitmap by URL-hash range and broadcast per-shard;
- the seen table is a compacted parquet/Iceberg table of distinct URLs,
  appended per crawl round (``record_seen``).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _bloom_params(expected: int, fpp: float) -> tuple[int, int]:
    m_bits = max(64, int(math.ceil(-expected * math.log(fpp) / (math.log(2) ** 2))))
    m_bits = (m_bits + 7) // 8 * 8
    k = max(1, round(m_bits / max(1, expected) * math.log(2)))
    return m_bits, min(k, 16)


def _positions(url: str, m_bits: int, k: int, salt: bytes) -> np.ndarray:
    digest = hashlib.blake2b(url.encode("utf-8"), digest_size=16, salt=salt).digest()
    h1 = int.from_bytes(digest[:8], "little")
    h2 = int.from_bytes(digest[8:], "little") | 1
    return (h1 + np.arange(k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(m_bits)


class BloomFilter:
    """Minimal broadcastable Bloom over URL strings."""

    __slots__ = ("m_bits", "k", "salt", "bits")

    def __init__(self, m_bits: int, k: int, salt: bytes, bits: np.ndarray) -> None:
        self.m_bits = m_bits
        self.k = k
        self.salt = salt
        self.bits = bits  # uint8 bitmap of length m_bits // 8

    def might_contain(self, url: str) -> bool:
        pos = _positions(url, self.m_bits, self.k, self.salt)
        return bool(np.all(self.bits[pos // 8] & (1 << (pos % 8).astype(np.uint8))))


def build_bloom(
    df: DataFrame, url_col: str, expected: int, fpp: float, salt: bytes = b"frontier"
) -> BloomFilter:
    """Distributed Bloom build: per-partition partial bitmaps OR-reduced.
    Driver holds only one bitmap per partition transiently."""
    m_bits, k = _bloom_params(expected, fpp)
    n_bytes = m_bits // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for batch in batches:
            for url in batch[url_col]:
                pos = _positions(url, m_bits, k, salt)
                np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(url_col).mapInPandas(partial, "bits binary").collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return BloomFilter(m_bits, k, salt, merged)


def filter_unseen_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    expected_urls: int = 1_000_000,
    fpp: float = 0.03,
) -> DataFrame:
    """Rows of ``candidates`` whose URL is NOT in ``seen`` — the exactness-safe
    two-stage filter (Bloom prefilter, anti-join confirmation of Bloom
    positives). Result is provably identical to a plain anti-join: Bloom
    negatives are definitely-new (no false negatives), positives are
    confirmed exactly. Only the ~fpp x |candidates| + true-duplicate slice
    ever touches the seen table."""
    spark = candidates.sparkSession
    bloom = build_bloom(seen, url_col, expected_urls, fpp)
    bloom_bc = spark.sparkContext.broadcast(bloom)
    out_schema = candidates.schema

    def flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = bloom_bc.value
        for batch in batches:
            out = batch.copy()
            out["_maybe_seen"] = (
                batch[url_col].map(bf.might_contain).astype(bool)
            )
            yield out

    from pyspark.sql.types import BooleanType, StructField, StructType

    flagged_schema = StructType(
        list(out_schema.fields) + [StructField("_maybe_seen", BooleanType())]
    )
    flagged = candidates.mapInPandas(flag, flagged_schema)
    fresh = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    suspects = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = suspects.join(
        seen.select(F.col(url_col)), url_col, "left_anti"
    )
    return fresh.unionByName(confirmed_new)


class UrlSeenSet:
    """Persistent URL-seen set with Bloom prefilter + exact anti-join."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        expected_urls: int = 1_000_000,
        fpp: float = 0.03,
    ) -> None:
        self.spark = spark
        self.path = path
        self.expected_urls = expected_urls
        self.fpp = fpp

    def _seen_table(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return None  # no rounds recorded yet

    def filter_unseen(self, candidates: DataFrame, url_col: str = "url") -> DataFrame:
        """Rows of ``candidates`` whose URL is NOT in the seen set.

        Bloom-negative rows pass through without touching the seen table;
        only the (small) Bloom-positive slice pays the anti-join — at cluster
        scale that slice is ~fpp x |candidates| + true duplicates, shuffled
        against a bucketed seen table.
        """
        seen = self._seen_table()
        if seen is None:
            return candidates
        return filter_unseen_with_bloom(
            candidates,
            seen.select(F.col("url").alias(url_col)),
            url_col,
            self.expected_urls,
            self.fpp,
        )

    def record_seen(self, urls: DataFrame, url_col: str = "url") -> None:
        """Append this round's URLs (compacted to distinct) to the table."""
        (
            urls.select(F.col(url_col).alias("url"))
            .distinct()
            .write.mode("append")
            .parquet(self.path)
        )

    def compact(self) -> None:
        """Rewrite the table as a single distinct snapshot (periodic
        compaction per the north rule)."""
        seen = self._seen_table()
        if seen is None:
            return
        tmp = self.path.rstrip("/") + "__compact"
        seen.select("url").distinct().write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
