"""BPE trainer vs an independent canonical Python reference."""

from collections import Counter


def _ref_bpe(texts, iters, top_k):
    """Canonical BPE (Sennrich'16): word-freq dict, per-iteration pair
    counts, merge the (count DESC, pair ASC)-best pair leftmost-greedy."""
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(w): f for w, f in wf.items()}
    out = []
    for it in range(iters):
        pc = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, ((a, b), c) in enumerate(ranked[:top_k], start=1):
            out.append((it, rank, a, b, c, rank == 1))
        (x, y), _ = ranked[0]
        merged = {}
        for syms, f in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            key = tuple(ns)
            merged[key] = merged.get(key, 0) + f
        vocab = merged
    return out


def _spark_bpe(spark, texts, iters, top_k):
    from crawler_spark.textops.tokenizer import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r.iter, r.rank, r.lhs, r.rhs, r.pair_count, r.merged)
        for r in bpe_train(df, iters=iters, top_k=top_k).orderBy(
            "iter", "rank"
        ).collect()
    ]


def test_bpe_matches_reference_basic(spark):
    texts = [
        "the theme of the thesis",
        "then the weather thinned",
        "other lather bother",
    ]
    assert _spark_bpe(spark, texts, 4, 5) == _ref_bpe(texts, 4, 5)


def test_bpe_consecutive_runs_merge_canonically(spark):
    """Runs of the winning pair ('ababab...') must merge leftmost-greedy
    in ONE iteration — the double-replace trick: a single string replace
    only takes alternating occurrences because neighbors share their
    delimiter space."""
    texts = ["abababab abab ab", "ababab ab ab", "abababab abababab"]
    got = _spark_bpe(spark, texts, 3, 5)
    assert got == _ref_bpe(texts, 3, 5)
    # iteration 0 must merge (a, b)
    it0 = [r for r in got if r[0] == 0 and r[5]]
    assert it0 and (it0[0][2], it0[0][3]) == ("a", "b")
    # after a canonical merge, iteration 1 sees 'abab' pairs, never a
    # stranded ('b', 'a') count exceeding them
    it1 = {(r[2], r[3]): r[4] for r in got if r[0] == 1}
    assert ("ab", "ab") in it1


def test_bpe_multichar_merges_chain(spark):
    """Later iterations merge multi-char symbols (the 'e s' -> 'es',
    'es t' -> 'est' chain) identically to the reference."""
    texts = ["test tests testing", "rest rests resting", "best bests"]
    assert _spark_bpe(spark, texts, 5, 5) == _ref_bpe(texts, 5, 5)


def test_bpe_vocab_counts_match_reference_encoding(spark):
    """Train-then-tokenize: corpus token counts under the trained merges
    equal an independent reference encoder (merges applied in training
    order, each leftmost-greedy)."""
    from crawler_spark.textops.tokenizer import bpe_vocab_counts

    texts = [
        "the theme of the thesis hahahaha",
        "then the weather thinned haha",
        "other lather bother hahaha",
    ]
    iters = 4
    merges = [(r[2], r[3]) for r in _ref_bpe(texts, iters, 1) if r[5]]

    def encode(word):
        syms = list(word)
        for x, y in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        return syms

    ref = Counter(
        tok for t in texts for w in t.split(" ") if w for tok in encode(w)
    )
    ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = [
        (tok, c, rank) for rank, (tok, c) in enumerate(ranked[:50], start=1)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.token, r.n, r.rank)
        for r in bpe_vocab_counts(df, iters=iters, top_k=50)
        .orderBy("rank").collect()
    ]
    assert got == expect


def test_bpe_identical_symbol_runs_merge_canonically(spark):
    """lhs == rhs: a run of n identical symbols must merge leftmost-greedy
    to floor(n/2) merged tokens then the odd remainder ('aaaaa' -> aa aa a,
    NOT aa a aa). No non-overlapping string replace can express this —
    the fold path (_apply_merge x == y branch) exists for exactly this
    case; 'aaaaaa'/'!!!!!' style inputs are the ADVICE r3 counterexample."""
    texts = ["aaaaaa aaaaa aaa", "!!!!! !!!!!!! aa", "aaaa !! aaaaaaa"]
    for iters in (1, 2, 3):
        assert _spark_bpe(spark, texts, iters, 5) == _ref_bpe(
            texts, iters, 5
        )


def test_bpe_identical_runs_of_merged_symbols(spark):
    """Runs of an already-merged symbol ('abababab...' after (a,b) then
    (ab,ab)) hit the lhs == rhs case with a multi-char symbol in later
    iterations — both the trained merges and the encoded vocab counts
    must stay canonical."""
    from collections import Counter as _C

    from crawler_spark.textops.tokenizer import bpe_vocab_counts

    texts = ["ababababab abababab", "abababababab ab", "abab abababab"]
    iters = 3
    assert _spark_bpe(spark, texts, iters, 5) == _ref_bpe(texts, iters, 5)

    merges = [(r[2], r[3]) for r in _ref_bpe(texts, iters, 1) if r[5]]

    def encode(word):
        syms = list(word)
        for x, y in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        return syms

    ref = _C(tok for t in texts for w in t.split(" ") if w
             for tok in encode(w))
    ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = [(tok, c, r) for r, (tok, c) in enumerate(ranked[:50], 1)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.token, r.n, r.rank)
           for r in bpe_vocab_counts(df, iters=iters, top_k=50)
           .orderBy("rank").collect()]
    assert got == expect
