"""preference_pairs + semantic_decontaminate unit semantics."""

from __future__ import annotations

from json_ld_spark.operators.corpus import preference_pairs
from json_ld_spark.operators.decontaminate import semantic_decontaminate


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, score int"
    )


def test_preference_pairs_pick_extremes_with_margin(spark):
    rows = [
        ("c1", 0, "user", 5),
        ("c1", 1, "assistant", 10),
        ("c1", 2, "assistant", 40),
        ("c1", 3, "assistant", 25),
        ("c2", 0, "assistant", 9),   # single response -> no pair
        ("c3", 0, "assistant", 20),  # margin 2 < 5 -> filtered
        ("c3", 1, "assistant", 22),
    ]
    got = preference_pairs(
        _turns(spark, rows), "score", min_margin=5
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.conv_id, r.chosen_turn, r.rejected_turn) == ("c1", 2, 1)
    assert (r.chosen_score, r.rejected_score, r.margin) == (40, 10, 30)


def test_preference_pairs_tie_breaks_deterministic(spark):
    rows = [
        ("c1", 0, "assistant", 30),
        ("c1", 1, "assistant", 30),  # tied best -> lowest turn chosen
        ("c1", 2, "assistant", 10),
        ("c1", 3, "assistant", 10),  # tied worst -> lowest turn rejected
    ]
    r = preference_pairs(_turns(spark, rows), "score", min_margin=1).collect()
    assert [(x.chosen_turn, x.rejected_turn) for x in r] == [(0, 2)]


def test_preference_pairs_all_tied_yields_nothing(spark):
    rows = [("c1", i, "assistant", 7) for i in range(3)]
    assert preference_pairs(_turns(spark, rows), "score").count() == 0


def test_semantic_decontaminate_flags_planted(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.7071, 0.7071, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "eval_id long, embedding array<float>"
    )
    got = {
        r.vec_id: (r.max_cos, r.top_eval_id, r.contaminated)
        for r in semantic_decontaminate(corpus, ev, threshold=0.9).collect()
    }
    assert got[1] == (1.0, 100, True)        # identical -> flagged
    assert got[2] == (0.0, 100, False)       # orthogonal -> clean
    assert got[3][2] is False                # 45 degrees < 0.9
    assert abs(got[3][0] - 0.7071) < 1e-3


def test_semantic_decontaminate_argmax_min_id_tie(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    ev = spark.createDataFrame(
        [(200, [2.0, 0.0]), (100, [3.0, 0.0])],
        "eval_id long, embedding array<float>",
    )
    r = semantic_decontaminate(corpus, ev, threshold=0.5).collect()[0]
    # both eval vectors have cosine 1.0 -> lowest eval_id wins
    assert (r.max_cos, r.top_eval_id, r.contaminated) == (1.0, 100, True)


def test_rrf_fusion_arithmetic(spark):
    from json_ld_spark.operators.textstats import rrf_fuse

    run1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id int, doc_id long, rank int",
    )
    run2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id int, doc_id long, rank int",
    )
    got = {r.doc_id: (r.rrf_ppm, r.n_runs, r.rank)
           for r in rrf_fuse([run1, run2], k_const=60, out_k=10).collect()}
    # doc 11: 10^6 div 62 + 10^6 div 61 = 16129 + 16393
    assert got[11] == (16129 + 16393, 2, 1)
    assert got[10] == (1000000 // 61, 1, 2)
    assert got[13] == (1000000 // 62, 1, 3)
    assert got[12] == (1000000 // 63, 1, 4)


def test_char_entropy_known_values(spark):
    import math

    from json_ld_spark.operators.textstats import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars, r.n_distinct_chars, r.entropy_ppm)
           for r in char_entropy(docs).collect()}
    assert got[1] == (4, 1, 0)                      # constant -> 0
    # uniform over 2 symbols: 2 terms of 0.5*ln 2 ppm each
    half = round(0.5 * math.log(2) * 1e6)
    assert got[2] == (4, 2, 2 * half)
    quarter = round(0.25 * math.log(4) * 1e6)
    assert got[3] == (4, 4, 4 * quarter)
    assert 4 not in got                             # NULL text dropped
