"""Round-5 pipeline operators: PII scrub, C4/Gopher heuristic rules,
duplicated-span mass, and top-terms ranking — behavioral ground truth on
hand-built corpora (the contract queries value-check them against DuckDB
at driver time; these pin the SEMANTICS)."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_stats_counts_and_redacts(spark):
    from scrapy_spark.datapipe.pii import pii_stats

    rows = [
        (1, "mail bob.smith+x@sub.example.org and carol@ex.io bye"),
        (2, "server at 192.168.0.1 and 10.0.200.25 up"),
        (3, "call +1 (415) 555-0123 today"),
        (4, "nothing personal here"),
    ]
    out = {r.doc_id: r for r in pii_stats(_docs(spark, rows)).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (2, 0, 0)
    assert out[1].redacted == "mail <EMAIL> and <EMAIL> bye"
    assert (out[2].n_email, out[2].n_ipv4) == (0, 2)
    assert out[2].redacted == "server at <IP> and <IP> up"
    assert out[3].n_phone == 1
    assert out[3].redacted == "call <PHONE> today"
    assert out[4].redacted == "nothing personal here"
    assert (out[4].n_email, out[4].n_phone, out[4].n_ipv4) == (0, 0, 0)


def test_heuristic_rules_each_rule_fires(spark):
    from scrapy_spark.datapipe.quality import heuristic_rules

    good = " ".join(f"word{i}" for i in range(60)) + "."
    rows = [
        (1, good),                                  # passes everything
        (2, "too few words."),                      # n_words < 50
        (3, " ".join("ab" for _ in range(60))),     # mean_word_len < 3
        (4, good + " " + "#{}|" * 40),              # symbol ratio > 0.1
        (5, good + " powered by JavaScript"),       # blocklist
        (6, "line one.\nline two\nline three!"),    # punct fraction 2/3
    ]
    out = {r.doc_id: r for r in heuristic_rules(_docs(spark, rows)).collect()}
    assert out[1].keep is True
    assert out[2].keep is False and out[2].n_words == 3
    assert out[3].keep is False and out[3].mean_word_len < 3
    assert out[4].keep is False and out[4].symbol_word_ratio > 0.1
    assert out[5].keep is False and out[5].has_blocklist
    assert abs(out[6].frac_lines_end_punct - round(2 / 3, 4)) < 1e-9


def test_dup_span_stats_counts_cross_doc_spans(spark):
    from scrapy_spark.datapipe.dedup import dup_span_stats

    shared = "a b c d e f g h"  # one 8-gram, present in docs 1 and 2
    rows = [
        (1, shared + " unique1 tail1"),
        (2, "head2 " + shared),
        (3, "p q r s t u v w entirely other text here"),
        (4, "short doc"),  # < 8 tokens → no spans
    ]
    out = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in dup_span_stats(_docs(spark, rows), n=8).collect()
    }
    # doc 1: tokens a..h,unique1,tail1 → 3 distinct 8-grams, 1 shared
    assert out[1] == (3, 1)
    assert out[2] == (2, 1)
    assert out[3][1] == 0  # nothing shared
    assert out[4] == (0, 0)


def test_top_terms_integer_rarity_ranking(spark):
    from scrapy_spark.datapipe.text import top_terms

    # 'common' in all 3 docs (df=3 → rarity 0); doc-unique terms win
    rows = [
        (1, "common rare1 rare1 rare1 shared shared"),
        (2, "common shared rare2"),
        (3, "common common other3"),
    ]
    out = top_terms(_docs(spark, rows), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    r1 = sorted(by_doc[1], key=lambda r: r.rank)
    # doc 1: rare1 tf=3 df=1 score=3*(3-1)=6; shared tf=2 df=2 score=2
    assert (r1[0].term, r1[0].score, r1[0].rank) == ("rare1", 6, 1)
    assert (r1[1].term, r1[1].score) == ("shared", 2)
    # 'common' (df=3 → score 0) never outranks a doc-unique term
    r3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert r3[0].term == "other3" and r3[0].score == 2  # 1 × (3 − 1)
    # ties break by term ascending: doc 2 has rare2(1*(3-1)=2) vs
    # shared(1*(3-2)=1) vs common(0) → rare2 first
    r2 = sorted(by_doc[2], key=lambda r: r.rank)
    assert [r.term for r in r2] == ["rare2", "shared"]
    assert all(len(v) == 2 for v in by_doc.values())


def test_corpus_mix_ground_truth(spark):
    from scrapy_spark.datapipe.text import corpus_mix

    rows = [
        (1, "a b c", "s1"),
        (2, "d e", "s1"),
        (3, "f g h i", "s2"),
        (4, "j", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.bucket: r for r in corpus_mix(df).collect()}
    # tokens: s1=5, s2=4, s3=1, total=10
    assert (out["s1"].n_docs, out["s1"].n_tokens) == (2, 5)
    assert out["s1"].tok_ppm == 500000 and out["s1"].rank == 1
    assert out["s2"].tok_ppm == 400000 and out["s2"].rank == 2
    assert out["s3"].tok_ppm == 100000 and out["s3"].rank == 3
    assert (out["s1"].cum_tokens, out["s2"].cum_tokens, out["s3"].cum_tokens) == (5, 9, 10)


def test_script_mix_multilingual_and_cross_engine(spark):
    """script_mix on real non-ASCII text (the sf fixtures are ASCII, so
    the driver oracle alone never exercises the ranges): counts, the
    dominant pick, and — the load-bearing half — DuckDB replaying the
    generated oracle SQL over the SAME multilingual rows must agree
    value-for-value, proving the \\x{..} range classes mean the same
    thing under Java regex and RE2."""
    import duckdb

    from scrapy_spark.datapipe.text import script_mix
    from __spark_entry__ import _script_mix_oracle_sql

    rows = [
        (1, "Hello world 123"),
        (2, "Привет мир hello"),
        (3, "日本語のテキストです"),
        (4, "مرحبا بالعالم"),
        (5, "Ελληνικά και λατινικά mixed"),
        (6, "한국어 텍스트 and देवनागरी"),
        (7, ""),
    ]
    out = {r.doc_id: r for r in script_mix(_docs(spark, rows)).collect()}
    assert out[1].dominant_script == "latin" and out[1].digit == 3
    assert out[2].dominant_script == "cyrillic" and out[2].latin == 5
    assert out[3].dominant_script == "kana" and out[3].cjk == 3
    assert out[4].dominant_script == "arabic"
    assert out[5].dominant_script == "greek"
    assert out[6].hangul > 0 and out[6].devanagari > 0
    assert out[7].n_chars == 0  # all-zero tie → alphabetically first
    assert out[7].dominant_script == "arabic"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS v(doc_id, text)"
    )
    oracle = {
        r[0]: r
        for r in con.execute(_script_mix_oracle_sql()).fetchall()
    }
    cols = script_mix(_docs(spark, rows)).columns
    for i, _ in rows:
        spark_row = tuple(out[i][c] for c in cols)
        assert spark_row == oracle[i], (i, spark_row, oracle[i])
