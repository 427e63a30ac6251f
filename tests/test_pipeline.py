"""Corpus-assembly invariants: decontamination never flags eval docs,
cross-source dedup keeps exactly one survivor per key and picks the
precedence-minimal one."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
    q_decontaminate,
    q_dedup_cross_source,
)
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load


def test_decontaminate_excludes_eval_docs(spark, sf_dir):
    rows = q_decontaminate(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["doc_id"] % 50 != 0 for r in rows)
    assert all(r["n_hit_shingles"] >= 1 for r in rows)


def test_cross_source_one_survivor_per_key(spark, sf_dir):
    out = q_dedup_cross_source(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    keyed = d.select(
        "doc_id", "source", F.md5(F.lower(F.array_join(toks, " "))).alias("k")
    )
    n_keys = keyed.select("k").distinct().count()
    assert out.count() == n_keys
    assert out.select("k").distinct().count() == n_keys
    # the survivor is the (source, doc_id)-minimal row of its key group
    best = {
        r["k"]: (r["source"], r["doc_id"])
        for r in keyed.groupBy("k")
        .agg(F.min(F.struct("source", "doc_id")).alias("m"))
        .select("k", "m.source", "m.doc_id")
        .collect()
    }
    for r in out.collect():
        assert (r["source"], r["doc_id"]) == best[r["k"]]


def test_cross_source_shared_prefix_not_collapsed(spark, tmp_path):
    """Regression (VERDICT r4 task 5): two docs sharing their 3 leading
    tokens but with different bodies must BOTH survive — the old 3-token
    prefix key collapsed them; identical-modulo-spacing/case docs still
    dedup."""
    rows = [
        (1, "cc", "the quick brown fox jumps"),
        (2, "aa", "the quick brown cat sleeps"),  # same 3-token prefix, distinct body
        (3, "bb", "THE  QUICK   brown fox JUMPS"),  # doc 1 modulo case/spacing
    ]
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in q_dedup_cross_source(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 3}  # doc 3 ('bb') beats doc 1 ('cc') on source precedence
    assert out[2]["source"] == "aa"
    assert out[3]["source"] == "bb"


def test_range_join_strategies_agree_at_high_rate(spark, sf_dir):
    """The sum-product decomposition must equal the event-level join on a
    high-rate frame (timestamps compressed into a 3-hour band, where every
    window boundary case occurs)."""
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import (
        _range_join_event_level,
        _range_join_sum_product,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    e = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            (F.unix_micros("ts") % (3 * 3_600_000_000)).alias("us"),
        )
        .cache()
    )
    a = {tuple(r) for r in _range_join_event_level(e).collect()}
    b = {tuple(r) for r in _range_join_sum_product(e).collect()}
    assert a == b


def test_sequence_pack_offsets_are_contiguous(spark, sf_dir):
    """Packed layout invariants: offsets strictly in [0, capacity); global
    token positions (seq_id*cap + seq_offset) are the exclusive cumsum of
    n_tokens in doc_id order — i.e. the stream has no gaps or overlaps."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        _PACK_CAPACITY,
        q_sequence_pack,
    )

    rows = sorted(q_sequence_pack(spark, sf_dir).collect(), key=lambda r: r["doc_id"])
    pos = 0
    for r in rows:
        assert 0 <= r["seq_offset"] < _PACK_CAPACITY
        assert r["seq_id"] * _PACK_CAPACITY + r["seq_offset"] == pos
        pos += r["n_tokens"]


def test_domain_cap_limits_each_lang(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        _DOMAIN_CAP,
        q_domain_cap,
    )

    df = q_domain_cap(spark, sf_dir)
    for r in df.groupBy("lang").count().collect():
        assert r["count"] <= _DOMAIN_CAP
    # deterministic: same selection on rerun
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in q_domain_cap(spark, sf_dir).collect()}
    assert a == b


def test_corpus_clean_strict_composes_all_three_stages(spark, tmp_path):
    """q_corpus_clean_strict: low-quality docs filtered, exact dups
    collapsed, and an offset-duplicated passage span-deduped — in one
    composed result."""
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        q_corpus_clean_strict,
    )

    P = " ".join(f"p{i}" for i in range(30))
    good_tail = "the a of and to " * 6  # stopword-rich → passes quality
    rows = [
        (0, f"{P} {good_tail.strip()}", "en", "s", 0),
        (1, f"{P} {good_tail.strip()}", "en", "s", 0),  # exact dup of 0 → dropped
        (2, f"x0 x1 x2 x3 x4 x5 x6 {P} {good_tail.strip()}", "en", "s", 0),  # P at offset 7
        (3, "zzz@@@!!!", "de", "s", 9),  # low quality → filtered
    ]
    rows = [(i, t, lang, s_, len(t)) for (i, t, lang, s_, _) in rows]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["lang"]: r for r in q_corpus_clean_strict(spark, str(tmp_path)).collect()}
    assert "de" not in out  # quality-filtered
    en = out["en"]
    assert en["n_docs"] == 2  # doc 1 exact-dup-collapsed
    # doc 2's 30-token passage P (offset 7) is span-deduped against doc 0
    assert en["tokens_dropped"] >= 30


# --- snapshot diff / CDC -----------------------------------------------


def test_snapshot_diff_classification(spark, sf_dir):
    """Op classes must match the seeded snapshot derivation: inserts are
    exactly the keys only in the new slice (key%10==9), deletes exactly
    the old-only keys (key%10==0), updates only mutated keys (%7 or %13
    seeds), and NO unchanged row leaks through."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import q_snapshot_diff

    rows = q_snapshot_diff(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["o_orderkey"]
        if r["op"] == "insert":
            assert k % 10 == 9 and r["old_status"] is None and r["new_price"] is not None
        elif r["op"] == "delete":
            assert k % 10 == 0 and r["new_status"] is None and r["old_price"] is not None
        else:
            assert r["op"] == "update"
            assert k % 7 == 0 or k % 13 == 0
            assert (r["old_status"] != r["new_status"]) or (r["old_price"] != r["new_price"])


def test_strict2_ledger_invariants(spark, sf_dir):
    """The per-stage kept/dropped ledger must CHAIN: stage i+1's docs_in
    equals stage i's docs_kept, drops are non-negative everywhere, every
    gate stage drops docs on the fixtures, and the span stage conserves
    tokens (kept + dropped = stage-4 survivor tokens)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        q_corpus_clean_strict2,
    )

    rows = sorted(q_corpus_clean_strict2(spark, sf_dir).collect(), key=lambda r: r["stage_ord"])
    assert [r["stage"] for r in rows] == [
        "quality", "domain", "toxicity", "exact_dedup", "span_dedup"
    ]
    for a, b in zip(rows, rows[1:]):
        assert b["docs_in"] == a["docs_kept"]
    for r in rows:
        assert r["docs_dropped"] >= 0 and r["tokens_dropped"] >= 0
        assert r["docs_in"] == r["docs_kept"] + r["docs_dropped"]
    s4, sp = rows[3], rows[4]
    assert sp["tokens_kept"] + sp["tokens_dropped"] == s4["tokens_kept"]
    # the fixtures exercise every gate: each of the first three stages drops
    assert all(r["docs_dropped"] > 0 for r in rows[:3])


def test_domain_gate_blocks_expected_hosts(spark, sf_dir):
    """Exact rules block only the full host; suffix rules block the whole
    registrable domain (here: its www. subdomain in the matching tld)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import (
        q_domain_filter,
    )

    rows = {r["host"]: r["blocked"] for r in q_domain_filter(spark, sf_dir).collect()}
    assert rows["www.src3.example.com"] is True  # exact
    assert rows["www.src7.example.org"] is True  # exact
    assert rows["www.src11.example.com"] is True  # suffix
    assert rows["www.src15.example.net"] is True  # suffix
    assert rows["www.src3.example.org"] is False  # exact rule ≠ other tld
    assert rows["www.src11.example.net"] is False  # suffix rule pins the tld
    assert sum(rows.values()) == 4


def test_token_budget_select_semantics(spark, sf_dir):
    """Selected set = the maximal quality-ordered prefix within budget:
    every selected cum_tokens <= budget, totals consistent, and every
    EXCLUDED doc has (quality, -doc_id) strictly below the worst
    selected one (prefix property)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        _TOKEN_BUDGET,
        q_token_budget_select,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import (
        quality_expr_6dp,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    sel = q_token_budget_select(spark, sf_dir).collect()
    assert sel and max(r["cum_tokens"] for r in sel) <= _TOKEN_BUDGET
    assert sum(r["n_tokens"] for r in sel) == max(r["cum_tokens"] for r in sel)
    worst = min((r["quality"], -r["doc_id"]) for r in sel)
    picked = {r["doc_id"] for r in sel}
    alld = load(spark, sf_dir, "documents").select(
        "doc_id", quality_expr_6dp().alias("q")
    ).collect()
    for r in alld:
        if r["doc_id"] not in picked:
            assert (r["q"], -r["doc_id"]) < worst


def test_semantic_decontamination_matches_exact_cosine(spark, sf_dir):
    """Every flagged (train, hit-count) must agree with a brute-force
    driver-side recomputation at the same 6-dp threshold."""
    import numpy as np

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        _SEMDECON_TAU,
        q_decontaminate_semantic,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.sqrt((M * M).sum(axis=1))
    ev = ids % 50 == 0
    cos = (M[~ev] @ M[ev].T) / np.outer(nrm[~ev], nrm[ev])
    cos6 = np.floor(cos * 1e6 + 0.5) / 1e6
    expected = {
        int(i): int(n) for i, n in zip(ids[~ev], (cos6 >= _SEMDECON_TAU).sum(axis=1)) if n
    }
    got = {
        r["vec_id"]: r["n_hits"] for r in q_decontaminate_semantic(spark, sf_dir).collect()
    }
    assert got == expected


def test_length_batches_bounded_waste(spark, sf_dir):
    """Dynamic batching contract: batches never exceed _LB_BATCH
    sequences, every doc lands in exactly one batch, and because a batch
    never crosses its 64-token length bucket, per-batch padding waste is
    strictly under n_seqs * bucket_width."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import pipeline as P
    from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import load

    rows = P.q_length_batches(spark, sf_dir).collect()
    assert rows
    ndocs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_seqs"] for r in rows) == ndocs
    for r in rows:
        assert 1 <= r["n_seqs"] <= P._LB_BATCH
        assert 0 <= r["pad_waste"] < r["n_seqs"] * P._LB_BUCKET
        assert r["total_tokens"] + r["pad_waste"] == r["n_seqs"] * r["max_len"]
