"""Distributed BPE training vs a sequential pure-Python reference
(Sennrich et al.'s algorithm): identical merge tables and token counts."""

from collections import Counter

from matrix_multiplication_bigdata_ind_assignments_spark.operators import tokenizer as T


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sequential reference: the textbook BPE training loop."""
    seqs = {w: list(w) + [T._END] for w in word_freqs}
    rules = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max count, lexicographic tie-break — must match the Spark orderBy
        (left, right), n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if n < 2:
            break
        rules.append((rank, left, right, n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return rules, seqs


def test_bpe_train_matches_sequential_reference(spark, monkeypatch):
    """Both the local and the distributed training paths must produce the
    reference merge table exactly."""
    freqs = {
        "scan": 50, "scans": 20, "span": 30, "plan": 45, "plans": 15,
        "join": 60, "joins": 25, "jab": 3, "nap": 7,
    }
    words = spark.createDataFrame(list(freqs.items()), "w string, freq long")
    expected, _ = _ref_bpe(freqs, 12)
    assert T.bpe_train(words, n_merges=12) == expected  # local path
    monkeypatch.setenv("MMBD_BPE_LOCAL_VOCAB", "0")  # force distributed path
    assert T.bpe_train(words, n_merges=12) == expected
    # checkpointed distributed path: 12 merges over a 3-round checkpoint
    # cadence crosses 3 re-materialization boundaries and must still be
    # rule-for-rule identical (the delta-replay fix, VERDICT r3 item 3)
    monkeypatch.setenv("MMBD_BPE_CKPT_EVERY", "3")
    assert T.bpe_train(words, n_merges=12) == expected


def test_bpe_queries_run_on_fixture(spark, sf_dir):
    rules = {(r["rank"], r["left"], r["right"]) for r in T.q_bpe_train(spark, sf_dir).collect()}
    assert len(rules) == T._BPE_MERGES  # fixture vocab is rich enough
    enc = T.q_bpe_encode(spark, sf_dir).collect()
    assert len(enc) == 500
    # merges only ever shrink the naive char+marker tokenization
    for r in enc:
        assert 0 < r["bpe_tokens"]
        assert r["bpe_tokens"] >= r["n_words"]  # at least one token per word
