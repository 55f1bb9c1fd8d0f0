"""Gopher rule battery (operators/text.py gopher_signals): each rule
exercised both ways on a hand fixture; integer cross-multiplication
semantics pinned at the boundaries."""

from __future__ import annotations

from feasibility_etl_spark.operators.text import gopher_signals

GOOD = (
    "the quick brown fox jumps over with many good plain words and "
    "that is fine because all of these words have healthy shape to be "
    "kept by the battery since they look like natural prose and the "
    "sentence just keeps going with more regular words until the word "
    "count clears fifty tokens easily as required here today friends"
)


def _rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in gopher_signals(df).collect()}


def test_good_doc_passes_all(spark):
    r = _rows(spark, [(1, GOOD)])[1]
    assert r["n_words"] >= 50
    for rule in ("r_wordcount", "r_meanlen", "r_symbol", "r_bullet",
                 "r_ellipsis", "r_alpha", "r_stops"):
        assert r[rule], rule
    assert r["gopher_pass"]


def test_each_rule_fails_for_its_own_reason(spark):
    rows = _rows(spark, [
        (1, "too few words to pass the count rule"),          # wordcount
        (2, " ".join(["a"] * 60) + " the of"),                # meanlen (short words)
        (3, " ".join(f"w{i}#tag" for i in range(60)) + " the of"),  # symbol
        (4, "\n".join(f"- bullet line {i} the of" for i in range(10))),  # bullet
        (5, "\n".join(f"line {i} trails off the of..." for i in range(10))),  # ellipsis
        (6, " ".join(["123456"] * 60) + " the of"),           # alpha
        (7, " ".join(f"word{i}" for i in range(60))),         # stops
    ])
    assert not rows[1]["r_wordcount"]
    assert not rows[2]["r_meanlen"]
    assert not rows[3]["r_symbol"]
    assert not rows[4]["r_bullet"]
    assert not rows[5]["r_ellipsis"]
    assert not rows[6]["r_alpha"]
    assert not rows[7]["r_stops"]
    assert not any(rows[i]["gopher_pass"] for i in rows)


def test_boundary_integer_semantics(spark):
    # exactly 50 words of length 3 with two required stopwords: word
    # count sits ON the lower bound (inclusive -> passes), mean length
    # exactly 3 (inclusive -> passes)
    text = " ".join(["cat"] * 48 + ["the", "and"])
    r = _rows(spark, [(1, text)])[1]
    assert r["n_words"] == 50 and r["r_wordcount"]
    assert r["n_chars"] == 150 and r["r_meanlen"]
    assert r["gopher_pass"]
    # 49 words -> below the bound
    r2 = _rows(spark, [(2, " ".join(["cat"] * 47 + ["the", "and"]))])[2]
    assert r2["n_words"] == 49 and not r2["r_wordcount"]


def test_empty_and_whitespace_docs(spark):
    rows = _rows(spark, [(1, ""), (2, "   ")])
    for i in (1, 2):
        assert rows[i]["n_words"] == 0
        assert not rows[i]["r_wordcount"]
        assert not rows[i]["gopher_pass"]
