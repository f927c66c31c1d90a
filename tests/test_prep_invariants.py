"""Structural invariants of the training-data-prep operators — properties
that must hold regardless of corpus content (conservation laws the oracle
comparison can't express by itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_job_spark.queries import all_queries
from flink_job_spark.queries.prep import MIX_BUDGET_FRAC, PACK_BUDGET, WSAMPLE_K
from flink_job_spark.sources.tables import load_table


def test_sequence_pack_conserves_docs_and_tokens(spark, sf_dir):
    """Packing is a partition of the corpus: every doc lands in exactly one
    sequence, token totals are conserved, and no sequence is assigned beyond
    the final token offset."""
    d = load_table(spark, sf_dir, "documents")
    packed = all_queries()["q_sequence_pack"].fn(spark, sf_dir)
    agg = packed.agg(F.sum("n_docs").alias("docs"), F.sum("seq_tokens").alias("tok")
                     ).collect()[0]
    assert agg["docs"] == d.count()
    total_tok = d.select(
        F.sum(F.regexp_count("text", F.lit(r"\S+")))).collect()[0][0]
    assert agg["tok"] == total_tok
    # sequences within a source are dense from 0 (offset packing leaves no holes)
    bad = packed.groupBy("source").agg(
        F.min("seq_id").alias("mn"), F.max("seq_id").alias("mx"),
        F.count(F.lit(1)).alias("n")).filter(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0


def test_mixture_resample_respects_budget_and_bounds(spark, sf_dir):
    """Kept counts never exceed the stratum size, and the overall kept total
    is within sampling noise of the configured budget fraction."""
    r = all_queries()["q_mixture_resample"].fn(spark, sf_dir).collect()
    assert all(row["n_kept"] <= row["n_docs"] for row in r)
    total = sum(row["n_docs"] for row in r)
    kept = sum(row["n_kept"] for row in r)
    assert 0.5 * MIX_BUDGET_FRAC * total < kept < 1.5 * MIX_BUDGET_FRAC * total


def test_weighted_sample_is_exactly_k_and_deterministic(spark, sf_dir):
    q = all_queries()["q_weighted_sample"]
    a = [r["doc_id"] for r in q.fn(spark, sf_dir).collect()]
    b = [r["doc_id"] for r in q.fn(spark, sf_dir).collect()]
    assert len(a) == WSAMPLE_K
    assert a == b  # md5-keyed: identical across reruns


def test_train_shuffle_is_a_permutation(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    r = all_queries()["q_train_shuffle"].fn(spark, sf_dir)
    n = d.count()
    assert r.count() == n
    assert r.select("pos").distinct().count() == n       # bijective positions
    assert r.agg(F.max("pos")).collect()[0][0] == n - 1  # dense 0..n-1


def test_block_dedup_bounds(spark, sf_dir):
    """No doc can have more duplicate blocks than blocks, and the lowest
    doc_id can never have a duplicate block (min-id ownership)."""
    r = all_queries()["q_block_dedup"].fn(spark, sf_dir)
    assert r.filter(F.col("n_dup_blocks") > F.col("n_blocks")).count() == 0
    first = r.orderBy("doc_id").limit(1).collect()[0]
    assert first["n_dup_blocks"] == 0


def test_pack_budget_sanity():
    assert PACK_BUDGET > 0


def test_k_anonymity_invariants(spark, sf_dir):
    """Every published equivalence class holds >= k rows; the suppressed
    bucket absorbs exactly the rest (mass conservation)."""
    from flink_job_spark.queries import all_queries
    from flink_job_spark.queries.prep import KANON_K

    rows = all_queries()["q_k_anonymity"].fn(spark, sf_dir).collect()
    total = sum(r["n_rows"] for r in rows)
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n_customers
    for r in rows:
        if r["nation_qi"] != "*":
            assert r["n_cells"] == 1
            assert r["n_rows"] >= KANON_K, r
        else:
            assert r["segment_qi"] == "*" and r["band_qi"] == "*"
    assert sum(1 for r in rows if r["nation_qi"] == "*") <= 1


def test_exact_substr_matches_python_interval_twin(spark, sf_dir):
    """Span merging re-derived by a brute-force Python twin: recompute every
    doc's duplicated windows from scratch (dict-of-hashes ownership), merge
    intervals imperatively, and demand identical span counts and covered-word
    totals — the window-function prefix-max trick vs the obvious algorithm."""
    import hashlib
    import re

    from flink_job_spark.queries.prep import EXSUB_K

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    docs = {}
    for r in d:
        t = re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip()
        docs[r["doc_id"]] = t.split(" ")

    owner: dict[str, int] = {}
    wins: dict[int, list[tuple[int, str]]] = {}
    for doc_id in sorted(docs):
        w = docs[doc_id]
        n = max(len(w) - EXSUB_K + 1, 1)
        lst = []
        for s in range(1, n + 1):
            h = hashlib.md5(" ".join(w[s - 1:s - 1 + EXSUB_K]).encode()).hexdigest()
            lst.append((s, h))
            if h not in owner:
                owner[h] = doc_id
        wins[doc_id] = lst

    expected = {}
    for doc_id, lst in wins.items():
        wd = min(EXSUB_K, len(docs[doc_id]))
        dup = [(s, s + wd - 1) for s, h in lst if owner[h] < doc_id]
        merged: list[list[int]] = []
        for s, e in dup:  # already sorted by s
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expected[doc_id] = (
            len(lst), len(dup), len(merged),
            sum(e - s + 1 for s, e in merged),
        )

    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["n_spans"],
                      r["n_dup_words"])
        for r in all_queries()["q_exact_substr"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # non-vacuous on the shipped corpus: some doc actually carries a dup span
    assert any(v[2] > 0 for v in got.values())


def test_shard_snake_balances_and_conserves(spark, sf_dir):
    """Snake sharding re-derived in Python per source, plus the balance
    guarantee the doc string claims: every shard's token total within one
    max-document of any other shard's (round-robin does NOT satisfy this
    on sorted input — its first shard gets every N-th largest doc)."""
    import re

    from flink_job_spark.queries.prep import SNAKE_SHARDS

    docs = load_table(spark, sf_dir, "documents") \
        .select("source", "doc_id", "text").collect()
    per_source: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        tok = len(re.findall(r"\S+", r["text"]))
        per_source.setdefault(r["source"], []).append((tok, r["doc_id"]))

    expected: dict[tuple[str, int], tuple[int, int, int]] = {}
    for src, lst in per_source.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        shards: dict[int, list[int]] = {}
        for i, (tok, _) in enumerate(lst):
            k, pos = divmod(i, SNAKE_SHARDS)
            sh = pos if k % 2 == 0 else SNAKE_SHARDS - 1 - pos
            shards.setdefault(sh, []).append(tok)
        for sh, toks in shards.items():
            expected[(src, sh)] = (len(toks), sum(toks), max(toks))

    rows = all_queries()["q_shard_snake"].fn(spark, sf_dir).collect()
    got = {(r["source"], r["shard"]): (r["n_docs"], r["sum_tokens"],
                                       r["max_tokens"]) for r in rows}
    assert got == expected
    # balance: within each source, spread <= that source's max doc tokens
    for src, lst in per_source.items():
        sums = [got[(src, sh)][1] for sh in range(SNAKE_SHARDS)
                if (src, sh) in got]
        max_doc = max(t for t, _ in lst)
        assert max(sums) - min(sums) <= max_doc, (src, sums, max_doc)


def test_mix_temperature_flattens_toward_uniform(spark, sf_dir):
    """The temperature property itself: a below-average source's share is
    LARGER than its raw token proportion, an above-average source's is
    smaller (alpha<1 flattens), shares sum to ~1 and allocations never
    exceed the budget."""
    from flink_job_spark.queries.prep import MIX_TEMP_BUDGET

    rows = all_queries()["q_mix_temperature"].fn(spark, sf_dir).collect()
    total_tok = sum(r["n_tokens"] for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["alloc_tokens"] for r in rows) <= MIX_TEMP_BUDGET
    lo = min(rows, key=lambda r: r["n_tokens"])
    hi = max(rows, key=lambda r: r["n_tokens"])
    assert lo["n_tokens"] < hi["n_tokens"]  # corpus really is non-uniform
    assert lo["share"] > lo["n_tokens"] / total_tok
    assert hi["share"] < hi["n_tokens"] / total_tok


def test_exact_substr_catches_unaligned_copy_block_grid_misses(spark):
    """The any-alignment property, pinned: a 20-word run copied to an
    offset that straddles the 16-word block grid is invisible to
    q_block_dedup's aligned blocks but yields exactly one span of 20
    covered words in exact_substr_spans."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from flink_job_spark.queries.prep import (
        _doc_block_hashes,
        exact_substr_spans,
    )

    a = [f"a{j}" for j in range(40)]
    b = [f"b{j}" for j in range(40)]
    # copy a[5:25] into b[9:29]: source offset 5, dest offset 9 — neither
    # run covers any aligned [0,16) or [16,32) block completely
    b[9:29] = a[5:25]
    d = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string")

    rows = {r["doc_id"]: r for r in exact_substr_spans(d).collect()}
    assert rows[0]["n_spans"] == 0
    assert rows[1]["n_spans"] == 1
    assert rows[1]["n_dup_windows"] == 5   # 20 - 16 + 1 sliding windows
    assert rows[1]["n_dup_words"] == 20    # the exact copied run

    blocks = _doc_block_hashes(d)
    first = F.min("doc_id").over(Window.partitionBy("block_hash"))
    missed = (blocks.withColumn("f", first)
                    .filter((F.col("f") < F.col("doc_id"))).count())
    assert missed == 0  # the aligned grid sees nothing
