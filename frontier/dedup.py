"""R8 — URL-seen set at 10^10 scale (SURVEY.md §2.4, north rule).

The reference keeps no global visited set (only per-sitemap first-wins dedup
and ancestor sets); at web scale re-fetching already-seen sitemap/page URLs
across seeds and crawl rounds dominates cost. Design:

- an exactness-safe two-stage filter: a Bloom filter cheaply rejects
  definitely-new URLs, and only Bloom-positive candidates are confirmed
  against the seen-set table with an anti-join — Bloom false positives
  therefore never drop URLs, so the surviving set equals the reference's
  semantics exactly;
- membership and build are fully VECTORIZED (pandas ``hash_array`` double
  hashing + numpy bit ops over whole Arrow batches — no per-row Python);
- two physical strategies, auto-selected by bitmap size:
  * broadcast: one bitmap built distributed (per-partition partials,
    OR-reduced) and broadcast — right while the bitmap fits comfortably
    in executor memory;
  * sharded: the bitmap is split by URL-hash range into ``n_shards``
    independent bitmaps that live in a DataFrame and meet their candidate
    rows through a co-grouped shuffle — NO driver collect, NO broadcast,
    per-task memory = one shard. At 10^10 keys / 3% fpp (~9 GB of bitmap)
    this is the only feasible layout;
- the seen table is a compacted parquet/Iceberg table of distinct URLs,
  appended per crawl round (``record_seen``).
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

#: Above this bitmap size the broadcast strategy yields to sharding.
BROADCAST_BITMAP_BYTES = 64 * 1024 * 1024

#: Default per-shard bitmap target in the sharded strategy.
SHARD_BITMAP_BYTES = 32 * 1024 * 1024


def _bloom_params(expected: int, fpp: float) -> tuple[int, int]:
    m_bits = max(64, int(math.ceil(-expected * math.log(fpp) / (math.log(2) ** 2))))
    m_bits = (m_bits + 7) // 8 * 8
    k = max(1, round(m_bits / max(1, expected) * math.log(2)))
    return m_bits, min(k, 16)


def _hash_keys(salt: bytes) -> tuple[str, str]:
    """Two independent 16-char keys for pandas' SipHash-based hash_array."""
    return (
        hashlib.blake2b(salt + b"#1", digest_size=8).hexdigest(),
        hashlib.blake2b(salt + b"#2", digest_size=8).hexdigest(),
    )


def _hash2(urls, salt: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized double hash of a url array: two uint64 lanes from pandas'
    C hash kernel (no per-row Python)."""
    arr = np.asarray(urls, dtype=object)
    k1, k2 = _hash_keys(salt)
    h1 = pd.util.hash_array(arr, hash_key=k1, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=k2, categorize=False) | np.uint64(1)
    return h1, h2


def _positions_many(
    h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """(n, k) Kirsch-Mitzenmacher bit positions."""
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m_bits)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat // 8, (1 << (flat % 8)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n,) bool: all k bits set per row."""
    hit = (bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
    return hit.all(axis=1)


class BloomFilter:
    """Minimal broadcastable Bloom over URL strings (vectorized probes)."""

    __slots__ = ("m_bits", "k", "salt", "bits")

    def __init__(self, m_bits: int, k: int, salt: bytes, bits: np.ndarray) -> None:
        self.m_bits = m_bits
        self.k = k
        self.salt = salt
        self.bits = bits  # uint8 bitmap of length m_bits // 8

    def might_contain_many(self, urls) -> np.ndarray:
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash2(urls, self.salt)
        return _test_bits(self.bits, _positions_many(h1, h2, self.m_bits, self.k))

    def might_contain(self, url: str) -> bool:
        return bool(self.might_contain_many([url])[0])


def build_bloom(
    df: DataFrame, url_col: str, expected: int, fpp: float, salt: bytes = b"frontier"
) -> BloomFilter:
    """Distributed Bloom build: per-partition partial bitmaps OR-reduced.
    Driver holds one bitmap per partition transiently — use the sharded
    strategy instead once the bitmap outgrows broadcast size."""
    m_bits, k = _bloom_params(expected, fpp)
    n_bytes = m_bits // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for batch in batches:
            if len(batch):
                h1, h2 = _hash2(batch[url_col].to_numpy(), salt)
                _set_bits(bits, _positions_many(h1, h2, m_bits, k))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(url_col).mapInPandas(partial, "bits binary").collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return BloomFilter(m_bits, k, salt, merged)


def _shard_col(url_col: str, n_shards: int):
    """JVM-side shard assignment (codegen xxhash64) — decoupled from the
    Python-side in-shard bit hashing, which is fine for a Bloom."""
    return F.pmod(F.xxhash64(F.col(url_col), F.lit(1337)), F.lit(n_shards)).cast(
        "int"
    )


def build_bloom_shards(
    seen: DataFrame,
    url_col: str,
    expected: int,
    fpp: float,
    n_shards: int,
    salt: bytes = b"frontier",
) -> DataFrame:
    """Sharded build → DataFrame ``(shard int, bits binary)``: each shard's
    bitmap is built by the tasks owning that hash range. Nothing is
    collected; per-task memory is one shard bitmap."""
    m_bits, k = _bloom_params(max(1, expected // n_shards), fpp)
    n_bytes = m_bits // 8

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        if len(pdf):
            h1, h2 = _hash2(pdf[url_col].to_numpy(), salt)
            _set_bits(bits, _positions_many(h1, h2, m_bits, k))
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]}
        )

    return (
        seen.select(url_col, _shard_col(url_col, n_shards).alias("shard"))
        .groupBy("shard")
        .applyInPandas(build_group, "shard int, bits binary")
    )


def _make_bloom_flagger(
    seen: DataFrame,
    url_col: str,
    expected_urls: int,
    fpp: float,
    n_shards: int | None,
    salt: bytes,
):
    """Shared core of make_unseen_filter / make_member_filter: build the
    Bloom side once and return a ``candidates → candidates + _maybe_seen``
    flagging closure (broadcast bitmap, or sharded co-group above the
    broadcast budget). ``_maybe_seen`` has no false negatives — a key
    present in ``seen`` always flags True — so either exact confirmation
    direction (anti-join the positives, or semi-join them) stays exact."""
    m_bits, k = _bloom_params(expected_urls, fpp)
    if n_shards is None and m_bits // 8 > BROADCAST_BITMAP_BYTES:
        n_shards = max(1, math.ceil((m_bits // 8) / SHARD_BITMAP_BYTES))

    from pyspark.sql.types import BooleanType, StructField, StructType

    if n_shards is not None:
        # cache the shard bitmaps: built once on first application, reused
        # by every later one. persist (not localCheckpoint) keeps lineage,
        # so a lost executor recomputes its shards instead of failing the
        # query, and a one-shot caller pays nothing until consumption.
        from pyspark import StorageLevel

        shards = build_bloom_shards(
            seen, url_col, expected_urls, fpp, n_shards, salt
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sm_bits, sk = _bloom_params(max(1, expected_urls // n_shards), fpp)
        bloom_bc = None
    else:
        bloom = build_bloom(seen, url_col, expected_urls, fpp, salt)
        bloom_bc = seen.sparkSession.sparkContext.broadcast(bloom)
        shards = None

    def flag_df(candidates: DataFrame) -> DataFrame:
        flagged_schema = StructType(
            list(candidates.schema.fields)
            + [StructField("_maybe_seen", BooleanType())]
        )

        if shards is not None:

            def probe_group(
                cand: pd.DataFrame, bits_pdf: pd.DataFrame
            ) -> pd.DataFrame:
                cand = cand.drop(columns=["shard"])
                if not len(cand):
                    return cand.assign(_maybe_seen=np.zeros(0, dtype=bool))
                if not len(bits_pdf):  # shard holds no seen urls at all
                    return cand.assign(_maybe_seen=False)
                bits = np.frombuffer(bits_pdf["bits"].iloc[0], dtype=np.uint8)
                h1, h2 = _hash2(cand[url_col].to_numpy(), salt)
                flags = _test_bits(bits, _positions_many(h1, h2, sm_bits, sk))
                return cand.assign(_maybe_seen=flags)

            flagged = (
                candidates.withColumn("shard", _shard_col(url_col, n_shards))
                .groupBy("shard")
                .cogroup(shards.groupBy("shard"))
                .applyInPandas(probe_group, flagged_schema)
            )
        else:

            def flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                bf = bloom_bc.value
                for batch in batches:
                    yield batch.assign(
                        _maybe_seen=bf.might_contain_many(
                            batch[url_col].to_numpy()
                        )
                    )

            flagged = candidates.mapInPandas(flag, flagged_schema)

        return flagged

    return flag_df


def make_unseen_filter(
    seen: DataFrame,
    url_col: str = "url",
    expected_urls: int = 1_000_000,
    fpp: float = 0.03,
    n_shards: int | None = None,
    salt: bytes = b"frontier",
):
    """Build the Bloom side ONCE and return a reusable
    ``candidates → unseen-candidates`` closure.

    A crawl applies the seen filter to every wave's pending frontier;
    rebuilding the bitmap per wave would re-scan the seen table ≤13 times.
    The broadcast bitmap (or the materialized shard DataFrame) is computed
    here and reused by every application — the seen table itself is only
    re-touched by the (small) Bloom-positive anti-join slice."""
    flag_df = _make_bloom_flagger(
        seen, url_col, expected_urls, fpp, n_shards, salt
    )

    def apply(candidates: DataFrame) -> DataFrame:
        flagged = flag_df(candidates)
        fresh = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        suspects = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        confirmed_new = suspects.join(
            seen.select(F.col(url_col)), url_col, "left_anti"
        )
        return fresh.unionByName(confirmed_new)

    return apply


def make_member_filter(
    members: DataFrame,
    key_col: str = "url",
    expected_keys: int = 1_000_000,
    fpp: float = 0.03,
    n_shards: int | None = None,
    salt: bytes = b"frontier",
):
    """Positive-side twin of :func:`make_unseen_filter`: a reusable
    ``candidates → candidates whose key IS in members`` closure, exact.

    The Bloom bitmap stands in for a broadcast hash table when the member
    set is too big to broadcast (a 10^9-gram benchmark-decontamination
    blocklist, a 10^10-URL seen set used positively): bloom-negatives are
    discarded map-side without any join (no false negatives — a member key
    always flags True), and only the positive slice (~fpp of the stream +
    true hits) meets the member table in an exact semi-join. The candidate
    stream is never shuffled on the full key space."""
    flag_df = _make_bloom_flagger(
        members, key_col, expected_keys, fpp, n_shards, salt
    )

    def apply(candidates: DataFrame) -> DataFrame:
        suspects = (
            flag_df(candidates)
            .filter(F.col("_maybe_seen"))
            .drop("_maybe_seen")
        )
        return suspects.join(
            members.select(F.col(key_col)), key_col, "left_semi"
        )

    return apply


def filter_unseen_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    expected_urls: int = 1_000_000,
    fpp: float = 0.03,
    n_shards: int | None = None,
    salt: bytes = b"frontier",
) -> DataFrame:
    """Rows of ``candidates`` whose URL is NOT in ``seen`` — the exactness-safe
    two-stage filter (Bloom prefilter, anti-join confirmation of Bloom
    positives). Result is provably identical to a plain anti-join: Bloom
    negatives are definitely-new (no false negatives), positives are
    confirmed exactly. Only the ~fpp x |candidates| + true-duplicate slice
    ever touches the seen table.

    Strategy: with ``n_shards`` (or when the bitmap exceeds
    BROADCAST_BITMAP_BYTES) the sharded co-group path runs — candidates
    shuffle once on the url-hash shard to meet their shard's bitmap; no
    bitmap ever reaches the driver or a broadcast. Otherwise one bitmap is
    built and broadcast, and candidates stay in place.

    One-shot form of :func:`make_unseen_filter` (which a wave loop uses to
    build the Bloom side once and apply it per wave)."""
    return make_unseen_filter(
        seen, url_col, expected_urls, fpp, n_shards, salt
    )(candidates)


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
        if not os.path.exists(self.path.rstrip("/")):
            self._recover()  # a crashed compaction may hold the live copy
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

    def prepare_filter(self, url_col: str = "url"):
        """Reusable ``candidates → unseen`` closure over the CURRENT seen
        table, with the Bloom side built exactly once
        (:func:`make_unseen_filter`) — what a wave loop applies to every
        pending frontier. Identity while no rounds are recorded yet."""
        seen = self._seen_table()
        if seen is None:
            return lambda candidates: candidates
        return make_unseen_filter(
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

    def _recover(self) -> None:
        """Finish a compaction that crashed between its two renames.

        Invariant: outside the rename window the live table is at ``path``.
        A crash between rename(base→trash) and rename(tmp→base) leaves NO
        base but a ``__trash-*`` sibling holding the complete old table —
        restoring it loses nothing (the crashed compaction's ``__compact-*``
        snapshot holds the same distinct URL set)."""
        base = self.path.rstrip("/")
        if os.path.exists(base):
            return
        parent, name = os.path.split(base)
        trash = sorted(
            entry
            for entry in (os.listdir(parent) if os.path.isdir(parent) else [])
            if entry.startswith(name + "__trash-")
        )
        if trash:
            os.rename(os.path.join(parent, trash[0]), base)

    def compact(self) -> None:
        """Rewrite the table as a single distinct snapshot (periodic
        compaction per the north rule).

        Crash-safe on a rename-atomic filesystem: the snapshot is written
        to a temp sibling, the live table is swapped out via two renames
        (old → trash, tmp → live), and the trash + leftover temp dirs are
        removed last. A crash between the renames leaves no live dir but a
        complete ``__trash-*`` copy; :meth:`_recover` (run at the start of
        every compact and ``_seen_table`` read) renames it back, so the
        table is never lost and the sweep below can only run when a live
        base exists. On object stores without atomic rename, compact into
        an Iceberg/Delta table instead — this class models that dedup
        table locally."""
        self._recover()
        seen = self._seen_table()
        if seen is None:
            return
        import shutil
        import uuid

        base = self.path.rstrip("/")
        tmp = f"{base}__compact-{uuid.uuid4().hex[:8]}"
        trash = f"{base}__trash-{uuid.uuid4().hex[:8]}"
        seen.select("url").distinct().write.mode("overwrite").parquet(tmp)
        os.rename(base, trash)
        os.rename(tmp, base)
        shutil.rmtree(trash, ignore_errors=True)
        # sweep leftovers of compactions that crashed before their cleanup —
        # safe because _recover() guaranteed the live base exists
        parent, name = os.path.split(base)
        for entry in os.listdir(parent or "."):
            if entry.startswith(name + "__compact-") or entry.startswith(
                name + "__trash-"
            ):
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge list: every node mapped
    to the MINIMUM node id reachable from it — the cluster-resolution step a
    dedup pipeline runs after LSH candidate generation (A~B, B~C must land
    A, B, C in ONE cluster even when A!~C directly).

    Min-label propagation with POINTER JUMPING: each round first takes
    ``l(v) <- min(l(v), min over neighbors u of l(u))`` (one join + one
    aggregation on compact (id, label) pairs), then follows the label one
    hop ``l(v) <- l(l(v))`` (labels are node ids, so the hop is defined and,
    by monotonicity, never increases). The jump halves the remaining
    component diameter every round, so a 10^10-node chain converges in
    ~log2(d) rounds instead of d — the difference between ~34 and 10^10
    shuffles. Each round's output is ``localCheckpoint``-ed: the self-join
    otherwise doubles the LOGICAL plan per round and the analyzer OOMs the
    driver long before the data does (on a cluster prefer
    ``setCheckpointDir`` + ``.checkpoint()`` for executor-loss tolerance).
    Checkpoints use DISK_ONLY blocks, and superseded rounds' blocks are
    released by Spark's ContextCleaner once their RDD is unreferenced
    (``DataFrame.unpersist`` does NOT free localCheckpoint blocks — they go
    through weak-ref GC), so peak on-heap state is O(1) rounds regardless of
    how many rounds run. ``sym`` is checkpointed once up front: the loop
    runs two actions per round and would otherwise re-execute the caller's
    full upstream lineage (e.g. LSH candidate generation) each time.

    Returns (node, component) — component = min reachable node id.
    """
    from pyspark import StorageLevel

    edges = edges.select(
        F.col(src).cast("bigint").alias("src"), F.col(dst).cast("bigint").alias("dst")
    )
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    for _ in range(max_rounds):
        neigh = (
            sym.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src_label").alias("nlabel"))
        )
        stepped = labels.join(neigh, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        jump = stepped.select(
            F.col("node").alias("j_id"), F.col("label").alias("j_label")
        )
        new_labels = (
            stepped.join(jump, stepped.label == jump.j_id, "left")
            .select("node", F.coalesce("j_label", "label").alias("label"))
            .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # dropping the reference is what releases the superseded round's
        # checkpoint blocks (ContextCleaner) — see docstring
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
