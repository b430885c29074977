"""Suffix-array construction (prefix doubling) + ExactSubstr spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_mailing_automation_spark.datapipe.suffix import (
    exact_substr_spans,
    suffix_ranks,
)


def _ranks(spark, rows, depth, path="auto"):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = suffix_ranks(df, depth=depth, path=path).collect()
    return {(r["doc_id"], r["pos"]): r["rank"] for r in out}


def _brute_ranks(rows, depth):
    """Reference dense rank: depth-clipped token tuples, Python tuple
    order (shorter-prefix-first) — the contract the doubling must hit."""
    keys = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        for i in range(len(toks)):
            keys[(doc_id, i + 1)] = tuple(toks[i : i + depth])
    ordered = sorted(set(keys.values()))
    rank_of = {k: i + 1 for i, k in enumerate(ordered)}
    return {pos: rank_of[k] for pos, k in keys.items()}


def test_suffix_ranks_matches_brute_tuple_order(spark):
    rows = [
        (1, "b a b a b c"),
        (2, "a b a b c d"),
        (3, "c"),
    ]
    # Both the direct window-array path and the prefix-doubling path
    # must hit the same brute contract (round-10 dispatch).
    for path in ("direct", "doubling"):
        for depth in (1, 2, 3, 4, 8):
            assert _ranks(spark, rows, depth, path) == _brute_ranks(
                rows, depth
            ), f"path={path} depth={depth}"


def test_suffix_ranks_non_power_of_two_depth(spark):
    # depth=6 exercises the binary-decomposition compose (4 + 2): the
    # repeated 'x y' tail makes depth-4 ranks collide where depth-6
    # ranks must not.
    rows = [(1, "x y x y x y z"), (2, "x y x y x y q")]
    for path in ("direct", "doubling"):
        for depth in (3, 5, 6, 7):
            assert _ranks(spark, rows, depth, path) == _brute_ranks(
                rows, depth
            ), f"path={path} depth={depth}"


def test_suffix_ranks_shorter_prefix_sorts_first(spark):
    # Suffix "a" (doc end) must rank BELOW "a a": rank 1 goes to the
    # 1-token tail.
    got = _ranks(spark, [(1, "a a")], 4)
    assert got[(1, 2)] == 1 and got[(1, 1)] == 2


def test_exact_substr_spans_merges_overlaps(spark):
    # Two docs share the 10-token run 't0..t9'; with min_len=8 the
    # duplicated window starts are pos 1,2,3 (per doc) and must merge
    # into ONE maximal span [1, 10] of 10 tokens.
    run = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, run + " u1 u2"), (2, run + " v1 v2")],
        "doc_id long, text string",
    )
    for path in ("direct", "doubling"):
        out = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
            for r in exact_substr_spans(df, min_len=8, path=path).collect()
        }
        assert out == {1: (1, 10, 10), 2: (1, 10, 10)}, f"path={path}"


def test_exact_substr_spans_within_one_doc_counts(spark):
    # Self-duplication (the same 8-gram twice in ONE doc) is duplicated
    # text under the corpus-global count >= 2.
    run = " ".join(f"w{i}" for i in range(8))
    df = spark.createDataFrame(
        [(7, run + " mid " + run)], "doc_id long, text string"
    )
    for path in ("direct", "doubling"):
        got = exact_substr_spans(df, min_len=8, path=path).collect()
        spans = sorted((r["span_start"], r["span_end"]) for r in got)
        assert spans == [(1, 8), (10, 17)], f"path={path}"


def test_exact_substr_spans_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert exact_substr_spans(df, min_len=8).count() == 0


def test_suffix_ranks_partition_invariant(spark):
    # Same ranks regardless of input partitioning (the bucketed prefix
    # must be content-derived, never order-derived).
    rows = [(i, f"p{i % 3} q r s t u v w x") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = suffix_ranks(df.repartition(1), depth=8).collect()
    b = suffix_ranks(df.repartition(13), depth=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _brute_longest(rows, max_len):
    """Reference: count full windows of every length, per-doc max."""
    from collections import Counter

    wins = Counter()
    per_pos = {}
    toks = {d: t.strip().split() for d, t in rows}
    for d, ts in toks.items():
        for i in range(len(ts)):
            for L in range(1, max_len + 1):
                if i + L <= len(ts):
                    wins[(L, tuple(ts[i : i + L]))] += 1
    out = {}
    for d, ts in toks.items():
        best, n_best = 0, 0
        lens = []
        for i in range(len(ts)):
            li = 0
            for L in range(1, max_len + 1):
                if i + L <= len(ts) and wins[(L, tuple(ts[i : i + L]))] >= 2:
                    li = L
            lens.append(li)
        best = max(lens) if lens else 0
        n_best = sum(1 for x in lens if x == best) if best > 0 else 0
        out[d] = (best, n_best)
    return out


def test_longest_dup_run_matches_brute(spark):
    from python_etl_mailing_automation_spark.datapipe.suffix import (
        longest_dup_run,
    )

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "x a b c d y a b c d"),   # self-dup of 'a b c d'
        (3, "a b c d e q r s"),       # shares 'a b c d e' prefix w/ doc 1
        (4, "unique tokens only here"),
        (5, "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for path in ("direct", "doubling"):
        for max_len in (1, 3, 4, 8):
            got = {
                r["doc_id"]: (r["longest_dup_len"], r["n_at_max"])
                for r in longest_dup_run(
                    df, max_len=max_len, path=path
                ).collect()
            }
            assert got == _brute_longest(
                rows, max_len
            ), f"path={path} max_len={max_len}"


def test_cross_corpus_substr_flags_only_test_overlap(spark):
    from python_etl_mailing_automation_spark.datapipe.suffix import (
        cross_corpus_substr,
    )

    leak = " ".join(f"q{i}" for i in range(9))       # 9-token leaked run
    selfdup = " ".join(f"s{i}" for i in range(8))    # train-only dup
    train = spark.createDataFrame(
        [
            (1, leak + " filler one two"),
            (2, selfdup + " pad " + selfdup),        # self-dup, no leak
            (3, "totally unrelated text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(7, "prefix " + leak + " suffix")], "doc_id long, text string"
    )
    for path in ("direct", "doubling"):
        out = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in cross_corpus_substr(
                train, test, min_len=8, path=path
            ).collect()
        }
        # Doc 1: windows at pos 1 and 2 both occur in test -> one span
        # 1..9. Doc 2's self-duplication must NOT appear (not in test).
        assert out == {(1, 1, 9, 9)}, f"path={path}"


def test_rrf_fuse_matches_manual(spark):
    from python_etl_mailing_automation_spark.datapipe.text import rrf_fuse

    rows = [(1, 10.0, 1.0), (2, 20.0, 2.0), (3, 20.0, 3.0), (4, 5.0, 9.0)]
    df = spark.createDataFrame(rows, "doc_id long, s1 double, s2 double")
    out = rrf_fuse(df, ["s1", "s2"], id_col="doc_id", k=60, top=4).collect()
    # Dense ranks desc: s1: 20->1 (docs 2,3), 10->2, 5->3;
    #                   s2: 9->1, 3->2, 2->3, 1->4.
    expect = {
        1: (2, 4), 2: (1, 3), 3: (1, 2), 4: (3, 1),
    }
    got = {r["doc_id"]: (r["rank_s1"], r["rank_s2"]) for r in out}
    assert got == expect
    for r in out:
        assert abs(
            r["rrf_score"]
            - (1.0 / (60 + r["rank_s1"]) + 1.0 / (60 + r["rank_s2"]))
        ) < 1e-15
    # Order: fused desc with id tiebreak.
    scores = [(r["rrf_score"], r["doc_id"]) for r in out]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_suffix_path_dispatch_and_equality(spark):
    import pytest

    from python_etl_mailing_automation_spark.datapipe.suffix import (
        _DIRECT_DEPTH_MAX,
        _pick_path,
        longest_dup_run,
    )

    # auto routes by the byte-math threshold; bad names fail loudly.
    assert _pick_path("auto", _DIRECT_DEPTH_MAX) == "direct"
    assert _pick_path("auto", _DIRECT_DEPTH_MAX + 1) == "doubling"
    with pytest.raises(ValueError):
        _pick_path("fast", 8)

    # The two paths are bit-identical on a mixed corpus (varied doc
    # lengths, heavy token reuse, some docs shorter than the depth).
    rows = [
        (i, " ".join(f"t{(i * 7 + j) % 11}" for j in range(3 + i % 9)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, suffix_ranks(df, depth=5, path="direct").collect())
    )
    b = sorted(
        map(tuple, suffix_ranks(df, depth=5, path="doubling").collect())
    )
    assert a == b
    la = sorted(
        map(tuple, longest_dup_run(df, max_len=6, path="direct").collect())
    )
    lb = sorted(
        map(tuple, longest_dup_run(df, max_len=6, path="doubling").collect())
    )
    assert la == lb
