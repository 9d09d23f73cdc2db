"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl (reference ``sitemap_tree_for_homepage``,
usp/tree.py:42-130, re-expressed as DataFrame waves). ``queries`` exposes each
implemented operator from SURVEY.md §2 plus the training-data pipeline ops;
``oracle_sql`` carries the DuckDB-equivalent SQL for everything
SQL-expressible (the crawl itself is rows-only-checked: its input is a fetch
store built inside the query, not a testdata view).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frontier.datapipe import REGISTRY
from frontier.synth import (
    TEST_BASE_URL,
    reference_site_fetches,
    synth_crawl_corpus,
)
from frontier.waves import sitemap_tree_for_homepages

_PAGE_COLS = [
    "seed",
    "sitemap_url",
    "page_url",
    "priority",
    "last_modified",
    "change_frequency",
]


def _flagship(spark: SparkSession) -> DataFrame:
    forest = sitemap_tree_for_homepages(
        spark, [TEST_BASE_URL], reference_site_fetches(spark)
    )
    return forest.all_pages().select(*_PAGE_COLS)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the reference golden mini-site end-to-end (6 pages)."""
    return _flagship(spark)


def _frontier_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-host crawl over the deterministic synthetic corpus; rows-only
    check (the fetch store is synthesized, not a DuckDB view)."""
    n_hosts = 8
    corpus = synth_crawl_corpus(spark, n_hosts, leaves_per_host=2, pages_per_leaf=25)
    seeds = [f"http://host{i}.example.com/" for i in range(n_hosts)]
    forest = sitemap_tree_for_homepages(
        spark, seeds, corpus, use_known_paths=False
    )
    return forest.all_pages().select(*_PAGE_COLS)


def _media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over documents-as-binary (decode stubbed;
    rows-only check — hashing/dims are not DuckDB-expressible)."""
    from pyspark.sql import functions as F

    from frontier.multimodal import extract_media_metadata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id"), F.encode("text", "utf-8").alias("payload")
    )
    return extract_media_metadata(media).orderBy("doc_id")


def _media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.col("doc_id"), F.encode("text", "utf-8").alias("payload"))


def _media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (stub transform; rows-only check)."""
    from pyspark.sql import functions as F

    from frontier.multimodal import resize_images

    out = resize_images(_media_payloads(spark, sf_dir), 224, 224)
    return out.select(
        "doc_id", "width", "height", F.sha2("payload", 256).alias("payload_sha")
    ).orderBy("doc_id")


def _media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing (stub sampler; rows-only check)."""
    from frontier.multimodal import sample_video_frames

    out = sample_video_frames(_media_payloads(spark, sf_dir), every_n=2)
    return out.select("doc_id", "frame_idx", "frame_sha256").orderBy(
        "doc_id", "frame_idx"
    )


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction into the ANN embedding contract
    (stub embedder; rows-only check)."""
    from pyspark.sql import functions as F

    from frontier.multimodal import extract_media_features

    out = extract_media_features(_media_payloads(spark, sf_dir), dim=16)
    return out.select(
        "doc_id", F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x), 4).alias("sq_norm")
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: qd.build for name, qd in REGISTRY.items()
    }
    out["frontier_crawl"] = _frontier_crawl
    out["flagship_tree"] = lambda spark, sf_dir: _flagship(spark)
    out["media_metadata"] = _media_metadata
    out["media_resize"] = _media_resize
    out["media_frames"] = _media_frames
    out["media_features"] = _media_features
    return out


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}
