"""BPE trainer/applier semantics (operators/bpe.py)."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.operators import bpe


def _reference_train(texts, n_merges, max_words=None):
    """Independent textbook Sennrich trainer (word-freq table based)."""
    wf = collections.Counter()
    for t in texts:
        for w in re.findall(bpe.PRETOKEN_RE, t.lower()):
            wf[w] += 1
    items = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))
    if max_words is not None:
        items = items[:max_words]
    wf = dict(items)
    syms = {w: list(w) + [bpe.EOW] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, f_ in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f_
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < 2:
            break
        merges.append((a, b))
        for w in wf:
            out = []
            for x in syms[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def _reference_encode(text, merges):
    """Apply merges in rank order, each globally left-to-right."""
    out = []
    for w in re.findall(bpe.PRETOKEN_RE, text.lower()):
        syms = list(w) + [bpe.EOW]
        for a, b in merges:
            i, nxt = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        out.extend(syms)
    return out


TEXTS = [
    "the low lower lowest newer new news",
    "window windowing widest widget the then there",
    "a ab abc 1234 12 low-er low_er the the the",
]


def test_trainer_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = [(m.left, m.right) for m in bpe.bpe_train(df, n_merges=10)]
    assert got == _reference_train(TEXTS, 10, max_words=10000)


def test_codegen_apply_matches_reference_encoder(spark):
    merges = _reference_train(TEXTS, 8)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    rows = df.select(
        "doc_id", bpe.tokenize_expr("text", merges).alias("toks")
    ).collect()
    for r in rows:
        assert r["toks"] == _reference_encode(TEXTS[r["doc_id"]], merges)


def test_doc_level_chain_equals_per_word_apply(spark):
    """No merge crosses a word boundary (EOW is never a left symbol),
    so the single doc-level replace chain == per-word flatten."""
    merges = _reference_train(TEXTS, 10)
    assert all(bpe.EOW not in a for a, _ in merges)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    a = df.select("doc_id", bpe.tokenize_expr("text", merges).alias("t"))
    b = df.select("doc_id", bpe.tokenize_doc_expr("text", merges).alias("t"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_arrow_encoder_equals_codegen(spark):
    merges = [
        bpe.Merge(i, a, b)
        for i, (a, b) in enumerate(_reference_train(TEXTS, 10))
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    slow = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", bpe.tokenize_doc_expr("text", merges).alias("t")
        ).collect()
    }
    fast = {
        r["doc_id"]: r["tokens"] for r in bpe.bpe_encode_batches(df, merges).collect()
    }
    assert slow == fast


def test_apply_plan_is_shuffle_free(spark):
    merges = _reference_train(TEXTS, 6)
    df = spark.createDataFrame([(1, "the lowest")], ["doc_id", "text"])
    plan = (
        df.select(bpe.tokenize_doc_expr("text", merges))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sql_lit_roundtrips_control_chars():
    import duckdb

    expr = bpe.sql_lit("\x01a'b\x02")
    got = duckdb.connect().execute(f"SELECT {expr}").fetchone()[0]
    assert got == "\x01a'b\x02"


def test_adjacent_identical_merges_all_fire(spark):
    """Regression: with single separators, non-overlapping replace
    skipped every other occurrence ("the the the" left the middle word
    unmerged; "ababab" merged only the first pair).  Double separators
    leave one sep on each side so adjacent matches still fire."""
    merges = [("t", "h"), ("th", "e"), ("the", bpe.EOW), ("a", "b")]
    df = spark.createDataFrame(
        [(0, "the the the"), (1, "ababab")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", bpe.tokenize_doc_expr("text", merges).alias("t")
        ).collect()
    }
    assert rows[0] == ["the\x02"] * 3
    assert rows[1] == ["ab", "ab", "ab", "\x02"]
    per_word = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", bpe.tokenize_expr("text", merges).alias("t")
        ).collect()
    }
    assert per_word == rows
