"""Semantic tests for the training-set assembly operators — beyond the
bit-for-bit DuckDB oracle replica (test_datapipe_oracle.py), these assert
the *meaning*: planted contamination is caught, packing bins follow the
running token budget, sampling is deterministic and respects the bucket
rule, mixing weights reweight to the uniform target."""

import hashlib
import math
import os

import pandas as pd
import pytest

from frontier.datapipe import REGISTRY, _DECON_EVAL_MOD

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _write_docs(tmp_path, rows) -> str:
    """Materialize a documents.parquet with the driver's exact schema."""
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["text"].str.len().astype("int64")
    out = str(tmp_path / "docs")
    os.makedirs(out, exist_ok=True)
    df.to_parquet(os.path.join(out, "documents.parquet"), index=False)
    return out


EVAL_SENTENCE = "the quick brown fox jumps over the lazy dog tonight"


def test_decontam_catches_planted_overlap(spark, tmp_path):
    """A train doc embedding a 5-gram from an eval doc is flagged; an
    unrelated train doc and the eval docs themselves are not."""
    rows = [
        # doc 0: eval (0 % 29 == 0)
        (0, EVAL_SENTENCE, "en", "web"),
        # doc 1: train, copies a 5-gram span from the eval doc
        (1, "intro words then " + EVAL_SENTENCE + " closing words", "en", "web"),
        # doc 2: train, disjoint vocabulary
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web"),
        # doc 29: eval again (29 % 29 == 0), shares grams with doc 0 — eval
        # docs must never appear in the output even when contaminated
        (29, EVAL_SENTENCE, "en", "web"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        REGISTRY["decontam_ngram_overlap"].build(spark, sf).toPandas()
    )
    assert got["doc_id"].tolist() == [1]
    # the planted sentence has 10 words → 6 distinct 5-grams
    assert int(got["n_contaminated_grams"].iloc[0]) == 6


def test_decontam_short_docs_produce_no_grams(spark, tmp_path):
    """Docs under 5 words generate no 5-grams and can never contaminate."""
    rows = [
        (0, "one two three four", "en", "web"),
        (1, "one two three four", "en", "web"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = REGISTRY["decontam_ngram_overlap"].build(spark, sf).toPandas()
    assert len(got) == 0


def _words(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def test_pack_bins_follow_running_budget(spark):
    """Recompute the per-lang running sum in pandas and assert the operator's
    bin assignment is exactly floor(tokens_before / 512)."""
    got = REGISTRY["pack_context_windows"].build(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs["n_tokens"] = docs["text"].map(lambda t: len(_words(t)))
    docs = docs.sort_values(["lang", "doc_id"], ignore_index=True)
    docs["tokens_before"] = (
        docs.groupby("lang")["n_tokens"].cumsum() - docs["n_tokens"]
    )
    docs["pack_bin"] = (docs["tokens_before"] // 512).astype("int64")
    merged = got.merge(
        docs[["doc_id", "lang", "n_tokens", "tokens_before", "pack_bin"]],
        on=["doc_id", "lang"],
        suffixes=("", "_want"),
    )
    assert len(merged) == len(got) == len(docs)
    assert (merged["n_tokens"] == merged["n_tokens_want"]).all()
    assert (merged["tokens_before"] == merged["tokens_before_want"]).all()
    assert (merged["pack_bin"] == merged["pack_bin_want"]).all()
    # bins are dense per lang: 0..max with no gaps
    for _, grp in merged.groupby("lang"):
        bins = sorted(grp["pack_bin"].unique())
        assert bins == list(range(len(bins)))


def test_sample_is_deterministic_and_respects_buckets(spark):
    """Two runs agree row-for-row, and every kept row's md5 bucket is under
    its lang threshold (and every dropped row's is over)."""
    thresholds = {"en": 128, "de": 64, "fr": 64}
    qd = REGISTRY["sample_stratified_deterministic"]
    a = qd.build(spark, SF_DIR).toPandas()
    b = qd.build(spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(a, b)

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 256

    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    kept = set(a["doc_id"])
    for _, row in docs.iterrows():
        thr = thresholds.get(row["lang"], 26)
        assert (bucket(int(row["doc_id"])) < thr) == (int(row["doc_id"]) in kept)


def test_mix_weights_reweight_to_uniform(spark):
    """token_share sums to 1; weight × share is the same (uniform) value for
    every source; weighted token mass per source is total/n_sources."""
    got = REGISTRY["mix_domain_weights"].build(spark, SF_DIR).toPandas()
    n = len(got)
    assert n >= 2
    assert math.isclose(got["token_share"].sum(), 1.0, rel_tol=1e-12)
    uniform = 1.0 / n
    for _, row in got.iterrows():
        assert math.isclose(
            row["mix_weight"] * row["token_share"], uniform, rel_tol=1e-9
        )


def test_mix_resample_is_exact_deterministic_bernoulli(spark, tmp_path):
    """mix_resample_corpus realizes mix_domain_weights: every doc of an
    underrepresented source survives (p >= 1), the overrepresented source
    is actually thinned, the run is deterministic, and the kept set equals
    the closed-form hash predicate u*tokens_src*n_sources < 2^32*total."""
    words10 = " ".join(f"w{i}" for i in range(10))
    rows = [(d, words10, "en", "big") for d in range(60)]
    rows += [(d, words10, "en", "small") for d in range(60, 63)]
    sf = _write_docs(tmp_path, rows)
    got = REGISTRY["mix_resample_corpus"].build(spark, sf).toPandas()
    again = REGISTRY["mix_resample_corpus"].build(spark, sf).toPandas()
    assert got["doc_id"].tolist() == again["doc_id"].tolist()
    kept = set(got["doc_id"])
    assert {60, 61, 62} <= kept  # p >= 1: the small source keeps every doc
    big_kept = sum(1 for d in kept if d < 60)
    assert 0 < big_kept < 60  # the big source is genuinely thinned
    # exact replica of the acceptance predicate, doc by doc
    tokens = {"big": 600, "small": 30}
    total, n_sources = 630, 2
    expect = {
        d
        for d, _, _, src in rows
        if int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
        * tokens[src]
        * n_sources
        < (1 << 32) * total
    }
    assert kept == expect


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_trainset_plan_shapes(spark):
    """The plans the 100-TB scale story claims, asserted in plan form:
    sampling is a stateless scan-side filter (zero Exchange), packing pays
    exactly one shuffle (the per-lang window sort), decontamination
    broadcast-joins the tiny eval-gram side (never shuffles the train-side
    gram stream on the join key)."""
    sample = REGISTRY["sample_stratified_deterministic"].build(spark, SF_DIR)
    plan = _plan_of(sample)
    # scan-side filter; the only exchange is the final ORDER BY's
    # rangepartitioning — no hash shuffle, no aggregation
    assert "Arguments: hashpartitioning" not in plan
    assert "HashAggregate" not in plan and "Join" not in plan

    pack = REGISTRY["pack_context_windows"].build(spark, SF_DIR)
    plan = _plan_of(pack)
    # one hashpartitioning exchange for the per-lang window; the final
    # ORDER BY adds a rangepartitioning — no other shuffles may appear
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "Window" in plan

    decon = REGISTRY["decontam_ngram_overlap"].build(spark, SF_DIR)
    plan = _plan_of(decon)
    assert "BroadcastHashJoin" in plan
    # the probe (train grams) side must not be exchanged on the join key:
    # only the aggregation exchanges remain
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_shard_assign_is_complete_permutation(spark):
    """Every doc appears exactly once; positions are a dense 1..n_k per
    shard; a rebuild is bit-identical (no rand() anywhere)."""
    out = REGISTRY["shard_assign_deterministic"].build(spark, SF_DIR)
    rows = out.collect()
    docs = sorted(r.doc_id for r in rows)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert docs == sorted(set(docs)) and len(docs) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = REGISTRY["shard_assign_deterministic"].build(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pipe_sql_fragments_stay_in_sync():
    """corpus_pipeline_e2e mirrors the standalone ops' thresholds textually
    (the SQL is duplicated by design — one Catalyst plan); this pins the
    mirrored fragments so a tweak to either copy fails loudly."""
    from frontier.datapipe import _PACK_SQL, _PIPE_SQL, _SAMPLE_SQL

    quota = "WHEN 'en' THEN 128 WHEN 'de' THEN 64 WHEN 'fr' THEN 64 ELSE 26 END"
    assert quota in _PIPE_SQL and quota in _SAMPLE_SQL
    window = (
        "PARTITION BY lang ORDER BY doc_id\n"
        "               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    assert window in _PIPE_SQL and window in _PACK_SQL
    assert "tokens_before / 512.0" in _PIPE_SQL
    assert "tokens_before / 512.0" in _PACK_SQL


def test_round3_widening_plan_shapes(spark):
    """Scale-critical plan properties of the round-3 widening queries,
    pinned so regressions surface in plan form:

    - crawl_snapshot_diff: the md5 collapse happens in the scan-side
      Project BELOW the join exchange — the text column never crosses it;
    - webtext_pipeline_e2e: the dedup's first-wins rank is partially
      evaluated map-side (WindowGroupLimit below the exchange) and the
      token gate adds no extra shuffle;
    - paragraph_dedup: exactly two hash exchanges (first-wins window on
      fp, reassembly groupBy on url) — never an all-pairs join;
    - mirror_detect_hosts: aggregation-only (collect_set pair fan-out),
      no join operator of any kind.
    """
    diff = REGISTRY["crawl_snapshot_diff"].build(spark, SF_DIR)
    plan = _plan_of(diff)
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line:
            assert "text" not in line
    # md5 must appear in a Project, and the join is on url
    assert "md5" in plan and "FullOuter" in plan

    webtext = REGISTRY["webtext_pipeline_e2e"].build(spark, SF_DIR)
    plan = _plan_of(webtext)
    assert "WindowGroupLimit" in plan
    # shuffles: dedup window + final ORDER BY range partitioning only
    assert plan.count("Arguments: hashpartitioning") == 1

    para = REGISTRY["paragraph_dedup"].build(spark, SF_DIR)
    plan = _plan_of(para)
    assert plan.count("Arguments: hashpartitioning") == 2
    assert "Join" not in plan

    mirror = REGISTRY["mirror_detect_hosts"].build(spark, SF_DIR)
    plan = _plan_of(mirror)
    assert "Join" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_winnowing_plan_shape(spark):
    """Pin the window-function winnowing plan (two earlier forms were
    orders of magnitude slower: nested HOFs re-ran tokenize→shingle→md5
    per window; a shingle-ARRAY posexplode made InferFiltersFromGenerate
    inline an O(words²) re-tokenizing filter above the scan):

    - exactly one hash exchange, on doc_id, carrying only
      (doc_id, pos, word token) — never full text or shingle arrays;
    - the Generate explodes the flat WORDS array (the inferred size()>0
      filter costs one tokenization, not O(words²));
    - lead-shingle, frame-min and per-doc-count windows share the one
      exchange (exactly one Sort besides the final ORDER BY);
    - the final DISTINCT reuses the doc_id partitioning (back-to-back
      HashAggregates, no second hash exchange); never a join.
    """
    plan = _plan_of(REGISTRY["text_winnow_fingerprints"].build(spark, SF_DIR))
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "hashpartitioning(doc_id" in plan
    assert "Generate" in plan and "posexplode" in plan
    assert "Join" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 3
    assert len(re.findall(r"\(\d+\) Sort\n", plan)) == 2
    assert re.search(
        r"Exchange\nInput \[3\]: \[doc_id#\d+L, pos#\d+, w#\d+\]\n"
        r"Arguments: hashpartitioning",
        plan,
    ), "hash exchange must carry only (doc_id, pos, word)"


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """The winnowing invariant: two documents sharing a run of W+2 = 6
    words must share at least one selected fingerprint, while documents
    with no shared shingle share none."""
    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (0, f"unique preamble one {shared} unique tail one", "en", "s"),
        (1, f"other opening text {shared} different ending here", "en", "s"),
        (2, "completely disjoint vocabulary nothing matches at all ever",
         "en", "s"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = REGISTRY["text_winnow_fingerprints"].build(spark, sf).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared 6-word run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_budget_allocation_sums_exactly(spark):
    rows = REGISTRY["host_budget_allocation"].build(spark, SF_DIR).collect()
    assert sum(r["budget"] for r in rows) == 1000
    # proportionality: every host's budget is floor or floor+1 of its share
    total_w = sum(r["weight"] for r in rows)
    for r in rows:
        lo = (1000 * r["weight"]) // total_w
        assert r["budget"] in (lo, lo + 1)


def test_crawl_trap_detect_flags_only_boilerplate_template(spark):
    """The planted /product/ template (few content variants over many
    paths) must trap; /blog/ (distinct text per path) and /static/
    (single path) must not."""
    rows = REGISTRY["crawl_trap_detect"].build(spark, SF_DIR).collect()
    by_template = {}
    for r in rows:
        by_template.setdefault(r["template"], []).append(r)
    for r in by_template["/product/{n}/view"]:
        assert r["is_trap"] and r["n_paths"] >= 2 * r["n_contents"]
    for t in ("/blog/{n}/{n}/post-{n}", "/static/about.html"):
        assert all(not r["is_trap"] for r in by_template[t])


def test_index_postings_head_and_df(spark, tmp_path):
    """df counts EVERY posting; the head is the K smallest doc_ids; and
    the plan caps per-token rows map-side (WindowGroupLimit) instead of
    congregating a stopword's full posting list before the limit."""
    from frontier.datapipe import _POSTINGS_K

    n = _POSTINGS_K + 9
    rows = [(i, f"common word{i}", "en", "s") for i in range(n)]
    sf = _write_docs(tmp_path, rows)
    got = {r["token"]: r for r in REGISTRY["index_postings"].build(spark, sf).collect()}
    assert got["common"]["df"] == n
    assert got["common"]["postings_head"] == ",".join(
        str(i) for i in range(_POSTINGS_K)
    )
    assert got["word3"]["df"] == 1 and got["word3"]["postings_head"] == "3"

    plan = _plan_of(REGISTRY["index_postings"].build(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert plan.count("Arguments: hashpartitioning") == 2


def test_conditional_fetch_plan_semantics(spark):
    """RFC 9110 precedence (ETag over Last-Modified), rendered header
    formats, and the savings arithmetic."""
    import re as _re

    rows = REGISTRY["conditional_fetch_plan"].build(spark, SF_DIR).collect()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    assert len(rows) == len(docs)
    for r in rows:
        doc_id = int(r["url"].rsplit("/", 1)[1])
        if doc_id % 3 != 0:
            assert r["strategy"] == "if-none-match"
            assert _re.fullmatch(r'If-None-Match: "[0-9a-f]{32}"', r["cond_header"])
        else:
            assert r["strategy"] == "if-modified-since"
            assert _re.fullmatch(
                r"If-Modified-Since: (Mon|Tue|Wed|Thu|Fri|Sat|Sun), "
                r"\d{2} (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
                r"2025 \d{2}:\d{2}:\d{2} GMT",
                r["cond_header"],
            )
        assert r["predicted_304"] == (doc_id % 4 != 0)
        assert (r["bytes_saved"] > 0) == r["predicted_304"]


def test_gopher_gates_rule_by_rule(spark, tmp_path):
    """Each gate trips on a doc engineered to fail exactly that rule."""
    base = ("the and " + "sensible words flow here nicely ") * 12  # ~62 words
    rows = [
        (0, base, "en", "s"),                                   # passes all
        (1, "too short really", "en", "s"),                     # word count
        (2, "the and " + "extraordinarily " * 60, "en", "s"),   # mean word len
        (3, base + " " + "# " * 30, "en", "s"),                 # symbol ratio
        (4, "\n".join(["- the and bullet item here"] * 60), "en", "s"),  # bullets
        (5, "\n".join(["the and trailing thought..."] * 60), "en", "s"), # ellipsis
        (6, "the and " + "12345 67890 " * 40, "en", "s"),       # alpha fraction
        (7, base.replace("the and ", "zz yy "), "en", "s"),     # stopwords
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r for r in REGISTRY["text_gopher_gates"].build(spark, sf).collect()}
    assert got[0]["gopher_pass"]
    failing_gate = {
        1: "pass_word_count",
        2: "pass_mean_word_len",
        3: "pass_symbol_ratio",
        4: "pass_bullets",
        5: "pass_ellipsis",
        6: "pass_alpha_ratio",
        7: "pass_stopwords",
    }
    for doc_id, gate in failing_gate.items():
        assert not got[doc_id][gate], (doc_id, gate)
        assert not got[doc_id]["gopher_pass"]

    plan = _plan_of(REGISTRY["text_gopher_gates"].build(spark, SF_DIR))
    assert "Arguments: hashpartitioning" not in plan  # pure scan-side codegen
    assert "Join" not in plan and "HashAggregate" not in plan


def test_rarity_buckets_order_and_plan(spark, tmp_path):
    """Docs made of corpus-common tokens bucket 'head'; docs of hapax
    tokens bucket 'tail'; token-less docs are absent. The vocab join is a
    broadcast — the token stream is never exchanged on the join key."""
    common = "alpha beta gamma " * 20
    rows = (
        [(i, common, "en", "s") for i in range(6)]
        + [(10 + i, f"hapax{i}a hapax{i}b hapax{i}c", "en", "s") for i in range(6)]
        + [(99, "...", "en", "s")]  # tokenizes to nothing
    )
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r for r in REGISTRY["text_rarity_buckets"].build(spark, sf).collect()}
    assert 99 not in got
    # ntile(3) over 12 docs = 4/4/4 in (rarity, doc_id) order: the common
    # docs fill head (+2 spill to middle), the hapax docs fill tail
    assert all(got[i]["bucket"] == "head" for i in range(4))
    assert all(got[i]["bucket"] == "middle" for i in (4, 5, 10, 11))
    assert all(got[10 + i]["bucket"] == "tail" for i in range(2, 6))
    assert all(got[i]["rarity"] < got[10]["rarity"] for i in range(6))

    plan = _plan_of(REGISTRY["text_rarity_buckets"].build(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


# --- round-3 tail 2: classifier scoring, dup-span signal, k-means ----------


def _write_embeddings(tmp_path, vecs) -> str:
    """Materialize an embeddings.parquet with the driver's exact schema
    (vec_id int64, embedding list<float32>, label int32)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], type=pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), type=pa.int32()),
        }
    )
    out = str(tmp_path / "emb")
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, os.path.join(out, "embeddings.parquet"))
    return out


def test_hashngram_classifier_linear_and_order_independent(spark, tmp_path):
    """The score is a SUM of per-token weights: n copies of one token score
    n times the single-token doc; permuting a document's tokens leaves the
    score unchanged; keep is exactly the score's sign bit."""
    rows = [
        (0, "apple", "en", "s"),
        (1, "apple apple apple", "en", "s"),
        (2, "red fish blue fish old fish", "en", "s"),
        (3, "fish old fish blue red fish", "en", "s"),  # permutation of 2
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        REGISTRY["text_hashngram_classifier"].build(spark, sf)
        .toPandas().set_index("doc_id")
    )
    assert int(got.loc[1, "score"]) == 3 * int(got.loc[0, "score"])
    assert int(got.loc[1, "n_tokens"]) == 3
    assert int(got.loc[2, "score"]) == int(got.loc[3, "score"])
    for d in got.index:
        assert int(got.loc[d, "keep"]) == (1 if int(got.loc[d, "score"]) >= 0 else 0)


def test_dup_span_fraction_planted(spark, tmp_path):
    """A 10-token span shared between two documents yields exactly the
    10-8+1 = 3 fully-contained duplicated 8-grams in each; an identical
    document pair is 1000 permille duplicated; a unique-vocabulary doc is
    0; a 7-token doc has no grams and is absent."""
    span = "one two three four five six seven eight nine ten"
    twin = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu")
    rows = [
        (0, f"preamble aaa bbb {span} ccc ddd tailing", "en", "s"),
        (1, f"different eee fff {span} ggg hhh closing", "en", "s"),
        (2, "unique vocabulary pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8",
         "en", "s"),
        (3, twin, "en", "s"),
        (4, twin, "en", "s"),
        (5, "short doc of only seven whitespace tokens", "en", "s"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        REGISTRY["text_dup_span_fraction"].build(spark, sf)
        .toPandas().set_index("doc_id")
    )
    assert int(got.loc[0, "n_dup_grams"]) == 3
    assert int(got.loc[1, "n_dup_grams"]) == 3
    assert int(got.loc[2, "n_dup_grams"]) == 0
    assert int(got.loc[2, "dup_permille"]) == 0
    # twins: 12 tokens -> 5 grams, all duplicated
    assert int(got.loc[3, "n_grams"]) == 5
    assert int(got.loc[3, "dup_permille"]) == 1000
    assert int(got.loc[4, "dup_permille"]) == 1000
    assert 5 not in got.index  # 7 tokens < gram width -> no output row


def test_kmeans_refine_partition_properties(spark, tmp_path):
    """k-means refinement invariants on a synthetic set: every vector is
    assigned to exactly one of the k=8 clusters, byte-identical embeddings
    land in the same cluster with the same dist2, and a vector equal to a
    final centroid's tight blob has dist2 strictly below a vector placed
    far from every blob."""
    import random

    rng = random.Random(7)
    vecs = []
    # 8 seed vectors (vec_id < 8 are the Lloyd init) spread on two blobs
    for i in range(8):
        base = 0.4 if i % 2 == 0 else -0.4
        vecs.append((i, [base + rng.uniform(-0.01, 0.01) for _ in range(4)]))
    # two byte-identical twins
    twin = [0.401, 0.402, 0.399, 0.4]
    vecs.append((8, twin))
    vecs.append((9, twin))
    # an outlier far from both blobs
    vecs.append((10, [0.0, -0.9, 0.9, 0.0]))
    sf = _write_embeddings(tmp_path, vecs)
    got = (
        REGISTRY["embedding_kmeans_refine"].build(spark, sf)
        .toPandas().set_index("vec_id")
    )
    assert sorted(got.index) == list(range(11))
    assert got["cluster"].between(0, 7).all()
    assert int(got.loc[8, "cluster"]) == int(got.loc[9, "cluster"])
    assert int(got.loc[8, "dist2"]) == int(got.loc[9, "dist2"])
    assert int(got.loc[10, "dist2"]) > int(got.loc[8, "dist2"])


def test_round3_tail2_plan_shapes(spark):
    """Scale pins for the tail-2 operators:

    - text_hashngram_classifier: no join (weights are derived, not a
      table), exactly one hash exchange — the (doc_id, partial-sum)
      groupBy; exchanges never carry document text;
    - text_dup_span_fraction: gram text never crosses an exchange — every
      hash exchange carries int64 hashes / doc ids only; grams are built
      from the flat-words posexplode (no shingle-array Generate);
    - embedding_kmeans_refine: both centroid-distance joins are broadcast
      (the k*dims side), never a sort-merge join or cartesian product.
    """
    plan = _plan_of(REGISTRY["text_hashngram_classifier"].build(spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 1
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line:
            assert "text" not in line

    plan = _plan_of(REGISTRY["text_dup_span_fraction"].build(spark, SF_DIR))
    assert "posexplode" in plan
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line:
            assert "text" not in line and "gram" not in line

    plan = _plan_of(REGISTRY["embedding_kmeans_refine"].build(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_bm25_more_like_this_ranking(spark, tmp_path):
    """BM25 more-like-this orders hits by query-term overlap: for query
    doc 0, an exact copy outranks a 2-term overlap, which outranks a
    1-term overlap; a disjoint doc never appears among doc 0's hits."""
    rows = [
        (0, "zebra apple banana cherry", "en", "s"),
        (1, "zebra apple banana cherry", "en", "s"),      # exact copy
        (2, "zebra apple walnut pecan", "en", "s"),       # 2 shared terms
        (3, "zebra walnut pecan almond", "en", "s"),      # 1 shared term
        (4, "walnut pecan almond cashew", "en", "s"),     # disjoint
    ]
    sf = _write_docs(tmp_path, rows)
    got = REGISTRY["bm25_more_like_this"].build(spark, sf).toPandas()
    q0 = got[got["q_id"] == 0].sort_values("rk")
    assert q0["hit_id"].tolist()[:3] == [1, 2, 3]
    assert 4 not in q0["hit_id"].tolist()
    scores = q0["score"].tolist()
    assert scores == sorted(scores, reverse=True)


def test_bm25_plan_shape(spark):
    """BM25 scale pins: the per-query top-5 is rank-in-partition with a
    map-side WindowGroupLimit (never a global sort of the scored pairs),
    and no exchange carries document text."""
    plan = _plan_of(REGISTRY["bm25_more_like_this"].build(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line:
            assert "text" not in line


def test_warc_trainset_e2e_gate_by_gate(spark, tmp_path):
    """Every stage of the WARC-to-trainset capstone is exercised by one
    planted doc: 404s (doc_id%13=0), text/plain (%5=0) and noindex (%11=0)
    rows drop at their gates; a banner-embedding body (%7=0) survives
    framing AND block extraction with its text intact; a too-short text
    drops at the token gate; identical texts collapse to the min URL."""
    long_a = "this paragraph is comfortably longer than thirty characters of text"
    long_b = "another paragraph that is also comfortably past the block minimum"
    rows = [
        (1, long_a + " one", "en", "s"),     # kept
        (2, long_b, "en", "s"),              # kept (dedup winner vs 3)
        (3, long_b, "en", "s"),              # dropped: duplicate of 2
        (4, "short text", "en", "s"),        # dropped: block < 30 chars
        (5, long_a + " five", "en", "s"),    # dropped: text/plain
        (7, long_a + " seven", "en", "s"),   # kept: banner body survives
        (11, long_a + " eleven", "en", "s"), # dropped: X-Robots noindex
        (13, long_a + " thirteen", "en", "s"),  # dropped: HTTP 404
    ]
    sf = _write_docs(tmp_path, rows)
    got = REGISTRY["warc_trainset_e2e"].build(spark, sf).toPandas()
    urls = got["url"].tolist()
    assert urls == [
        "http://host1.example.com/doc/1",
        "http://host2.example.com/doc/2",
        "http://host7.example.com/doc/7",
    ]
    # the banner doc's tokens are the text's own (banner never leaks in)
    n7 = int(got[got["url"].str.endswith("/doc/7")]["n_tokens"].iloc[0])
    assert n7 == len((long_a + " seven").split())


def test_warc_trainset_e2e_plan_shape(spark):
    """Capstone scale pins: three shuffle-free Arrow kernels (record walk,
    noindex scan, main-text extraction) stacked over the scan side, and
    exactly ONE hash exchange — the dedup window on fingerprints."""
    plan = _plan_of(REGISTRY["warc_trainset_e2e"].build(spark, SF_DIR))
    assert plan.count("MapInPandas") >= 3
    # two hash exchanges TOTAL: the first materializes the synthetic WARC
    # segments (groupBy segment id — input construction, absent when
    # reading real .warc files); the pipeline itself contributes exactly
    # one — the dedup window on fingerprints
    assert plan.count("Arguments: hashpartitioning") == 2


def test_fuzzy_dedup_transitive_collapse(spark, tmp_path):
    """A~B and B~C clear the Jaccard>=0.7 verify but A~C alone does not
    (J(A,C)=0.583): connected components must still collapse the chain to
    ONE survivor (min doc_id) absorbing both near-dups, while an unrelated
    doc stays a singleton."""
    base = [f"tok{i}" for i in range(40)]
    a = base[:]
    b = base[:35] + [f"altb{i}" for i in range(5)]          # J(A,B)=33/43≈0.767
    c = [f"altc{i}" for i in range(5)] + b[5:]              # J(B,C)=33/43≈0.767
    rows = [
        (1, " ".join(a), "en", "web"),
        (2, " ".join(b), "en", "web"),
        (3, " ".join(c), "en", "web"),
        (4, " ".join(f"other{i}" for i in range(40)), "en", "web"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = REGISTRY["dedup_fuzzy_e2e"].build(spark, sf).toPandas()
    out = out.sort_values("doc_id", ignore_index=True)
    assert list(out.doc_id) == [1, 4]
    chain = out[out.doc_id == 1].iloc[0]
    assert chain.cluster_id == 1 and chain.n_dups_removed == 2
    single = out[out.doc_id == 4].iloc[0]
    assert single.cluster_id == 4 and single.n_dups_removed == 0


def test_dup_span_removal_excises_exactly_the_shared_run(spark, tmp_path):
    """Two docs share a 12-token run inside unique context: exactly those
    12 tokens are removed from BOTH (grams crossing the run boundary carry
    unique context, so coverage stops at the run edge), and an unrelated
    doc is untouched. kept_fp must equal md5 of the expected survivor
    text."""
    run = [f"shared{i}" for i in range(12)]
    a_pre, a_post = [f"ua{i}" for i in range(10)], [f"va{i}" for i in range(10)]
    b_pre, b_post = [f"ub{i}" for i in range(10)], [f"vb{i}" for i in range(10)]
    c = [f"uc{i}" for i in range(30)]
    rows = [
        (1, " ".join(a_pre + run + a_post), "en", "web"),
        (2, " ".join(b_pre + run + b_post), "en", "web"),
        (3, " ".join(c), "en", "web"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = (
        REGISTRY["text_dup_span_removal"].build(spark, sf)
        .toPandas().set_index("doc_id")
    )
    assert out.loc[1].n_removed == 12 and out.loc[2].n_removed == 12
    assert out.loc[3].n_removed == 0
    exp_a = hashlib.md5(" ".join(a_pre + a_post).encode()).hexdigest()
    exp_b = hashlib.md5(" ".join(b_pre + b_post).encode()).hexdigest()
    exp_c = hashlib.md5(" ".join(c).encode()).hexdigest()
    assert out.loc[1].kept_fp == exp_a
    assert out.loc[2].kept_fp == exp_b
    assert out.loc[3].kept_fp == exp_c


def test_dup_span_removal_plan_shape(spark):
    """Scale pins for the dup-span family: the dup set joins back as a
    BROADCAST (never a shuffled join on the full token stream), no
    hash exchange ever carries token/gram text, and the coverage max +
    final agg reuse the window's doc_id clustering (no third doc_id
    exchange beyond the two diamond branches)."""
    df = REGISTRY["text_dup_span_removal"].build(spark, SF_DIR)
    plan = _plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line:
            assert " w#" not in line and "text" not in line
    assert plan.count("Arguments: hashpartitioning") <= 3


def test_fuzzy_e2e_survivors_cover_corpus(spark):
    """dedup_fuzzy_e2e output must partition the corpus: survivors +
    absorbed dups == total documents, and every cluster's survivor is its
    own cluster_id (min-label CC invariant)."""
    out = REGISTRY["dedup_fuzzy_e2e"].build(spark, SF_DIR).toPandas()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(out) + int(out.n_dups_removed.sum()) == n_docs
    assert (out.doc_id == out.cluster_id).all()


def test_pagerank_fetch_plan_respects_budgets(spark):
    """Admitted pages never exceed their host's allocated budget, the
    host budgets come from a largest-remainder split of the GLOBAL budget
    over PageRank weights (so they sum to exactly the global budget), and
    fetch ranks are dense from 1 per host."""
    from frontier.datapipe import _PRPLAN_BUDGET

    out = REGISTRY["pagerank_fetch_plan"].build(spark, SF_DIR).toPandas()
    assert (out.fetch_rank <= out.host_budget).all()
    budgets = out.groupby("host_id").host_budget.first()
    # hosts present in the plan all carry a slice of the global budget;
    # the full allocation (incl. hosts whose budget exceeded their page
    # count, or with zero admitted pages) sums to the global budget, so
    # the observed per-host budgets can never exceed it in total
    assert budgets.sum() <= _PRPLAN_BUDGET
    for _, g in out.groupby("host_id"):
        got = sorted(g.fetch_rank)
        assert got == list(range(1, len(got) + 1))


def test_bpe_greedy_merge_islands(spark):
    """The gaps-and-islands merge must implement greedy left-to-right BPE
    semantics exactly: overlapping matches alternate within a run, kept
    matches absorb their right neighbor, non-matching words pass through."""
    from frontier.datapipe import (
        _BPE_EXPL_SPARK,
        _BPE_MERGE,
        _BPE_REASM_SPARK,
    )

    tok = spark.createDataFrame(
        [
            ("aaa", 3, ["a", "a", "a"]),
            ("aaaa", 2, ["a", "a", "a", "a"]),
            ("abab", 1, ["a", "b", "a", "b"]),
            ("xyz", 1, ["x", "y", "z"]),
            ("a", 1, ["a"]),
        ],
        "word string, cnt long, toks array<string>",
    )
    tok.createOrReplaceTempView("t_bpe_tok")
    spark.sql(_BPE_EXPL_SPARK.format(tok="t_bpe_tok")).createOrReplaceTempView(
        "t_bpe_expl"
    )
    spark.createDataFrame(
        [("a", "a", 5)], "a string, b string, total long"
    ).createOrReplaceTempView("t_bpe_best")
    out = {
        r.word: r.toks
        for r in spark.sql(
            _BPE_MERGE.format(
                expl="t_bpe_expl", best="t_bpe_best", reasm=_BPE_REASM_SPARK
            )
        ).collect()
    }
    assert out["aaa"] == ["aa", "a"]        # greedy: first pair wins
    assert out["aaaa"] == ["aa", "aa"]      # alternating within the run
    assert out["abab"] == ["a", "b", "a", "b"]  # no (a,a) pair present
    assert out["xyz"] == ["x", "y", "z"]
    assert out["a"] == ["a"]                # 1-token word untouched


def test_bpe_train_merges_contract(spark):
    """Full training run: one merge per step, merged = lhs||rhs, pair
    counts positive, deterministic across rebuilds, and step-1 merge is
    the true argmax adjacent character pair of the corpus word table."""
    from frontier.datapipe import _BPE_ROUNDS

    rows = REGISTRY["bpe_train_merges"].build(spark, SF_DIR).collect()
    assert [r.step for r in rows] == list(range(1, _BPE_ROUNDS + 1))
    assert all(r.merged == r.lhs + r.rhs for r in rows)
    assert all(r.pair_count > 0 for r in rows)

    # recompute the step-1 argmax pair in plain Python from the documents
    import re
    from collections import Counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    words = Counter()
    for d in docs:
        for w in re.split(r"[^a-z0-9]+", d.text.lower()):
            if w:
                words[w] += 1
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += c
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (rows[0].lhs, rows[0].rhs) == best[0]
    assert rows[0].pair_count == best[1]

    again = REGISTRY["bpe_train_merges"].build(spark, SF_DIR).collect()
    assert rows == again


def test_bpe_encode_matches_python_reapply(spark):
    """Per-doc BPE token counts must equal a plain-Python re-application
    of the learned merge list (greedy left-to-right, one pair per step)."""
    import re

    merges = [
        (r.lhs, r.rhs)
        for r in REGISTRY["bpe_train_merges"].build(spark, SF_DIR).collect()
    ]
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in REGISTRY["bpe_encode_corpus"].build(spark, SF_DIR).collect()
    }

    def encode(word: str) -> int:
        toks = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert len(counts) == len(docs)
    for d in docs:
        words = [w for w in re.split(r"[^a-z0-9]+", d.text.lower()) if w]
        assert counts[d.doc_id] == sum(encode(w) for w in words), d.doc_id


def test_bpe_merge_exhaustive_two_letter_words(spark):
    """Exhaustive adversarial check of the gaps-and-islands merge SQL:
    every word over {a,b} up to length 6 (126 words — every overlap/run
    pattern that can exist), merged against all four pairs, must equal a
    plain-Python greedy left-to-right merge."""
    from itertools import product

    from frontier.datapipe import (
        _BPE_EXPL_SPARK,
        _BPE_MERGE,
        _BPE_REASM_SPARK,
    )

    words = [
        "".join(t)
        for n in range(1, 7)
        for t in product("ab", repeat=n)
    ]
    tok = spark.createDataFrame(
        [(w, 1, list(w)) for w in words],
        "word string, cnt long, toks array<string>",
    )
    tok.createOrReplaceTempView("x_bpe_tok")
    spark.sql(_BPE_EXPL_SPARK.format(tok="x_bpe_tok")).createOrReplaceTempView(
        "x_bpe_expl"
    )

    def py_merge(toks, a, b):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    for a, b in product("ab", repeat=2):
        spark.createDataFrame(
            [(a, b, 1)], "a string, b string, total long"
        ).createOrReplaceTempView("x_bpe_best")
        got = {
            r.word: r.toks
            for r in spark.sql(
                _BPE_MERGE.format(
                    expl="x_bpe_expl", best="x_bpe_best",
                    reasm=_BPE_REASM_SPARK,
                )
            ).collect()
        }
        for w in words:
            assert got[w] == py_merge(list(w), a, b), (w, a, b)
