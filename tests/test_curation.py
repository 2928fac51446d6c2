"""Curation operators: repetition stats, PII scrub, decontamination."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from quality_spark.llm.decontam import contamination_flags
from quality_spark.llm.pii import DEFAULT_PATTERNS, redact_pii, with_pii_stats
from quality_spark.llm.repetition import (
    repetition_sqls,
    top_ngram_coverage,
    with_repetition_stats,
)


def test_repetition_stats_match_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (
            r["word_count"],
            round(r["dup_word_fraction"], 9),
            round(r["dup_word_char_fraction"], 9),
        )
        for r in with_repetition_stats(docs).collect()
    }
    cols = ", ".join(
        f"{sql} AS {name}" for name, sql in repetition_sqls("text", "duckdb").items()
    )
    want = {
        r[0]: (r[1], round(r[2], 9), round(r[3], 9))
        for r in duckdb.connect()
        .execute(
            f"""SELECT doc_id, word_count, dup_word_fraction, dup_word_char_fraction
                FROM (SELECT doc_id, {cols}
                      FROM read_parquet('{sf_dir}/documents.parquet'))"""
        )
        .fetchall()
    }
    assert got == want and len(got) > 0
    # non-vacuous: the synthetic corpus genuinely repeats words
    assert any(v[1] > 0 for v in got.values())


def test_repetition_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z"), (3, "")], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert rows[1]["word_count"] == 5
    assert abs(rows[1]["dup_word_fraction"] - 2 / 5) < 1e-12
    assert rows[2]["dup_word_fraction"] == 0.0
    assert rows[3]["dup_word_fraction"] is None  # empty doc -> NULL, not /0


def test_top_ngram_known_values(spark):
    df = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "all same all same all same")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in top_ngram_coverage(df, n=2).collect()}
    assert rows[1]["top_gram"] == "to be" and rows[1]["top_count"] == 2
    assert rows[2]["top_gram"] == "all same" and rows[2]["top_count"] == 3
    # "all same" covers 3*8 chars of the 26-char doc
    assert abs(rows[2]["top_coverage"] - 24 / 26) < 1e-12


def test_pii_detect_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.001.25 port 80"),
            (3, "call +1-555-0199 today"),
            (4, "clean text, nothing here"),
            (5, "a@b.io and 10.0.0.1 and +44-555-1234"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(with_pii_stats(df)).collect()}
    assert out[1]["email_count"] == 1 and "<EMAIL>" in out[1]["text_redacted"]
    assert out[2]["ipv4_count"] == 1 and "<IPV4>" in out[2]["text_redacted"]
    assert out[3]["phone_count"] == 1 and "<PHONE>" in out[3]["text_redacted"]
    assert out[4]["pii_total"] == 0 and out[4]["text_redacted"] == out[4]["text"]
    assert out[5]["pii_total"] == 3
    for tok in ("<EMAIL>", "<IPV4>", "<PHONE>"):
        assert tok in out[5]["text_redacted"]


def test_pii_phone_recall_and_precision(spark):
    """The broadened phone pattern must catch the common national
    formats (VERDICT r03 #5) and must NOT fire on decimals, dates,
    IPs, or digit runs."""
    positives = [
        "+1-555-0100",          # +cc with 3-4 tail (the old pattern's only hit)
        "555-123-4567",         # national 3-3-4
        "(555) 123-4567",       # parenthesized area code
        "555 123 4567",         # space separators
        "call 555-0100 now",    # 7-digit local
        "+12 555-123-4567",     # 2-digit country code
    ]
    negatives = [
        "pi is 3.1415926535",   # decimal
        "on 2023-01-01 at 10",  # ISO date
        "host 10.1.2.3 up",     # ip only (counted by ipv4, not phone)
        "id 123456789012",      # unbroken digit run
        "v1.2.3 and 4.5",       # versions
    ]
    rows = [(i, t) for i, t in enumerate(positives + negatives)]
    df = spark.createDataFrame(rows, "i int, text string")
    got = {r["i"]: r["phone_count"] for r in with_pii_stats(df).collect()}
    for i, t in enumerate(positives):
        assert got[i] >= 1, f"missed phone in {t!r}"
    for j, t in enumerate(negatives):
        assert got[len(positives) + j] == 0, f"false phone in {t!r}"


def test_pii_patterns_match_duckdb_dialect(spark):
    """The shipped patterns must behave identically under Java regex
    (Spark) and RE2 (DuckDB) — the premise of the oracle."""
    texts = [
        "x a.b-c_d%e+f@sub.domain.co y",
        "edge 1.2.3.4 and 255.255.255.255 and 999.1.1.1",
        "+1-555-0000 +12-123-4567 1-555-0000 +123-555-0000",
        "not-an-email @ nope.com 1.2.3 4.5",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: (r["email_count"], r["ipv4_count"], r["phone_count"])
        for r in with_pii_stats(df).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = tuple(
            con.execute(
                f"SELECT len(regexp_extract_all(?, '{p}'))", [t]
            ).fetchall()[0][0]
            for p in DEFAULT_PATTERNS.values()
        )
        assert got[i] == want, (i, t, got[i], want)


def test_contamination_flags(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta epsilon suffix"),  # contains the 5-gram
            (2, "alpha beta gamma but differs afterwards here"),
            (3, "completely unrelated words in this document"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in contamination_flags(corpus, bench, n=5).collect()}
    assert out[1]["contaminated"] and out[1]["contaminated_grams"] == 1
    assert not out[2]["contaminated"]
    assert not out[3]["contaminated"]
    assert len(out) == 3  # uncontaminated docs still present (left join)


def test_contamination_broadcast_plan(spark, sf_dir):
    """The benchmark gram set must broadcast — the corpus side may not
    shuffle for the join itself."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = contamination_flags(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=13,
    )
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_known_values(spark):
    from quality_spark.llm.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id int, text string")
    rows = chunk_documents(df, max_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 6: chunk0 = w0..w7, chunk1 = w6..w9
    assert [r["chunk_tokens"] for r in c1] == [8, 4]
    assert c1[0]["chunk_text"].startswith("w0") and c1[0]["chunk_text"].endswith("w7")
    assert c1[1]["chunk_text"] == "w6 w7 w8 w9"
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-2:] == c1[1]["chunk_text"].split()[:2]
    # empty doc -> one empty chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_tokens"] == 0


def test_pack_sequences_known_values(spark):
    from quality_spark.llm.packing import pack_sequences

    # one shard (n_shards=1): sequential fill with budget 100
    rows = [(i, n) for i, n in enumerate([60, 60, 30, 80, 100, 10])]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=100, n_shards=1).collect()}
    # cumsums: 60,120,150,230,330,340 -> pre-sums 0,60,120,150,230,330
    # bins:     0,  0,  1,  1,  2,  3
    assert [out[i]["bin_id"] for i in range(6)] == [0, 0, 1, 1, 2, 3]
    assert [out[i]["bin_pos"] for i in range(6)] == [0, 1, 0, 1, 0, 0]


def test_pack_sequences_shard_uniqueness(spark, sf_dir):
    from quality_spark.llm.dedup import tokens_sql
    from quality_spark.llm.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(f"size({tokens_sql('text', 'spark')})").cast("int").alias("n_tokens"),
    )
    out = pack_sequences(docs, budget=512, n_shards=8)
    # bin ids never collide across shards
    x = out.groupBy("bin_id").agg(F.count_distinct("shard").alias("ns"))
    assert x.filter(F.col("ns") > 1).count() == 0
    assert out.count() == docs.count()


def test_vocab_counts_and_df(spark):
    from quality_spark.llm.vocab import vocab_doc_frequency, vocab_topk

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "c c c")], "doc_id int, text string"
    )
    top = vocab_topk(df, k=2).collect()
    # a:3, c:4 -> top2 = c(4), a(3)
    assert [(r["token"], r["occurrences"]) for r in top] == [("c", 4), ("a", 3)]
    dfreq = {r["token"]: r["doc_frequency"] for r in vocab_doc_frequency(df).collect()}
    assert dfreq == {"a": 2, "b": 1, "c": 2}


def test_url_ops(spark):
    from quality_spark.llm.urls import (
        domain_histogram,
        flag_blocked_domains,
        with_url_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "go to https://a.example.com/x and http://b.org:8080/y?z=1"),
            (2, "no links here"),
            (3, "spam http://ads.tracker.net/p"),
            (4, "edge https://sub.ads.tracker.net ok"),
        ],
        "doc_id int, text string",
    )
    stats = {r["doc_id"]: r for r in with_url_stats(df).collect()}
    assert stats[1]["url_count"] == 2 and stats[1]["first_domain"] == "a.example.com"
    assert stats[2]["url_count"] == 0 and stats[2]["first_domain"] == ""

    hist = {r["domain"]: r["n_urls"] for r in domain_histogram(df).collect()}
    assert hist["a.example.com"] == 1 and hist["b.org"] == 1

    flags = {
        r["doc_id"]: r["blocked"]
        for r in flag_blocked_domains(df, ["tracker.net"]).collect()
    }
    assert flags == {1: False, 2: False, 3: True, 4: True}  # 4: subdomain match


def test_tfidf_known_values(spark):
    import math

    from quality_spark.llm.vocab import tfidf_scores, tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog fish"), (3, "fish fish bird")],
        "doc_id int, text string",
    )
    rows = {
        (r["doc_id"], r["token"]): r for r in tfidf_scores(df).collect()
    }
    # cat: tf=2 in doc1, df=1, n=3 -> 2*(ln(4/2)+1)
    want = 2.0 * (math.log(4.0 / 2.0) + 1.0)
    assert abs(rows[(1, "cat")]["tfidf"] - want) < 1e-12
    assert rows[(1, "cat")]["tf"] == 2 and rows[(1, "cat")]["doc_frequency"] == 1
    # dog appears in 2 of 3 docs -> lower idf than cat
    assert rows[(1, "cat")]["tfidf"] > rows[(1, "dog")]["tfidf"]

    top = {
        r["doc_id"]: r["token"]
        for r in tfidf_top_terms(df, k=1).collect()
    }
    assert top[1] == "cat" and top[3] == "fish"


def test_partitioned_corpus_prunes(spark, sf_dir, tmp_path):
    from quality_spark.sources.corpus import (
        read_partitioned_corpus,
        write_partitioned_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, path, ("lang",))

    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    one = langs[0]
    pruned = read_partitioned_corpus(spark, path, f"lang = '{one}'")
    # partition filter reaches the scan (directory pruning, not a data filter)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "simple"
    )
    import re

    # the filter must be INSIDE the scan's PartitionFilters list (an
    # empty list "PartitionFilters: []" means pruning regressed)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    assert pruned.count() == docs.filter(F.col("lang") == one).count()
    # round trip preserves every row
    assert read_partitioned_corpus(spark, path).count() == docs.count()


def test_filter_documents_round3_stages(spark):
    from quality_spark.llm.pipeline import filter_documents

    df = spark.createDataFrame(
        [
            (1, "en", " ".join(f"w{i}" for i in range(40))),          # kept
            (2, "en", " ".join(["rep rep"] * 20)),                    # repetition
            (3, "en", " ".join(f"x{i}" for i in range(40)) + " mail me bob@x.io"),  # pii
            (4, "en", " ".join(f"y{i}" for i in range(40)) + " see http://ads.bad.net/z"),  # blocked
        ],
        "doc_id int, lang string, text string",
    )
    out = {
        r["doc_id"]: r["drop_reason"]
        for r in filter_documents(
            df,
            min_tokens=10,
            max_dup_word_fraction=0.5,
            max_pii_total=0,
            blocked_domains=["bad.net"],
        ).collect()
    }
    assert out == {1: None, 2: "repetition", 3: "pii", 4: "blocked_domain"}


def test_pii_counts_match_redaction_semantics(spark):
    """One item matching two patterns counts ONCE: the phone-shaped
    digit run inside an email's local part must not be double-counted
    (code-review regression) — counts agree with what redact_pii
    actually redacts."""
    from quality_spark.llm.pii import redact_pii, with_pii_stats

    df = spark.createDataFrame(
        [(1, "contact 555-123-4567@example.com today")],
        "doc_id long, text string",
    )
    r = with_pii_stats(df).collect()[0]
    assert r["email_count"] == 1
    assert r["phone_count"] == 0  # consumed by the email redaction
    assert r["pii_total"] == 1
    red = redact_pii(df).collect()[0]["text_redacted"]
    assert red == "contact <EMAIL> today"


def test_textfix_mojibake_repair(spark):
    """ftfy-style re-decode repair (round 7, llm/textfix.py): single
    and double cp1252 mojibake unwind to the original; legitimate
    accented text is a FIXED POINT (its cp1252 bytes are invalid
    UTF-8, so no repair fires)."""
    from quality_spark.llm.textfix import (
        add_encoding_signals,
        fix_text_encoding,
    )

    def sloppy_decode(bs: bytes) -> str:
        # cp1252 with the 5 holes reading as latin-1 — the mis-decode
        # real-world mojibake generators effectively performed
        return "".join(
            chr(x) if x in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else bytes([x]).decode("cp1252")
            for x in bs
        )

    orig = "déjà vu — c’est l’été"
    single = sloppy_decode(orig.encode("utf-8"))
    double = sloppy_decode(single.encode("utf-8"))  # hits the 0x9D hole
    df = spark.createDataFrame(
        [("clean", orig), ("single", single), ("double", double),
         ("ascii", "plain ascii only"), ("none", None)],
        "kind string, text string",
    )
    out = {
        r["kind"]: r
        for r in fix_text_encoding(df, "text").collect()
    }
    assert out["single"]["text_fixed"] == orig
    assert out["single"]["text_fixed_passes"] == 1
    assert out["double"]["text_fixed"] == orig
    assert out["double"]["text_fixed_passes"] == 2
    assert out["clean"]["text_fixed"] == orig  # fixed point
    assert out["clean"]["text_fixed_passes"] == 0
    assert out["ascii"]["text_fixed_passes"] == 0
    assert out["none"]["text_fixed"] is None
    sig = {
        r["kind"]: r for r in add_encoding_signals(df, "text").collect()
    }
    assert sig["single"]["enc_mojibake_markers"] > 0
    assert sig["ascii"]["enc_mojibake_markers"] == 0
    assert sig["ascii"]["enc_non_ascii"] == 0
    assert sig["clean"]["enc_non_ascii"] == sum(ord(c) > 127 for c in orig)


def test_mojibake_marker_counts_at_boundaries(spark):
    """ADVICE r07: Java-regex '.' matches neither end-of-string nor a
    line terminator, so the marker's trailing char is optional — a
    marker as the LAST character of a doc, or immediately before a
    newline, must still count (such docs previously slipped past the
    suspicious-rows screen and skipped repair)."""
    from quality_spark.llm.textfix import mojibake_marker_count

    df = spark.createDataFrame(
        [
            ("tail", "text ends in Ã"),            # marker at EOS
            ("nl", "line oneÃ\nline two"),          # marker before \n
            ("mid", "clichÃ© again"),               # classic mid-string
            ("multi", "Ã\nÂ\nâ€\nend"),             # three, all pre-\n
            ("clean", "no markers here"),
        ],
        "kind string, text string",
    )
    got = {
        r["kind"]: r["n"]
        for r in df.select(
            "kind", mojibake_marker_count("text").alias("n")
        ).collect()
    }
    assert got["tail"] == 1
    assert got["nl"] == 1
    assert got["mid"] == 1
    assert got["multi"] == 3
    assert got["clean"] == 0


def test_textfix_normalize_and_control_chars(spark):
    """NFC normalization composes e+combining-acute; control chars
    drop Column-natively except the kept ones."""
    from pyspark.sql import functions as F

    from quality_spark.llm.textfix import (
        normalize_unicode,
        strip_control_chars,
    )

    decomposed = "Café"  # e + U+0301
    df = spark.createDataFrame([(decomposed,)], "text string")
    row = normalize_unicode(df, "text", form="NFC").collect()[0]
    assert row["text_nfc"] == "Café"
    df2 = spark.createDataFrame(
        [("a\x00b\tc\nd\x1fe\x7ff",)], "text string"
    )
    got = df2.select(
        strip_control_chars("text").alias("s")
    ).collect()[0]["s"]
    assert got == "ab\tc\ndef"


def test_bpe_training_classic_example(spark):
    """train_bpe end-to-end through Spark on the classic
    Sennrich-style corpus {low:5, lower:2, newest:6, widest:3} — the
    first 6 merges are HAND-DERIVED from the published algorithm
    (highest weighted pair count, ties to the lexicographically
    smallest pair):
      round 1: (e,s),(s,t),(t,</w>) all 9 -> (e,s)
      round 2: (es,t),(t,</w>) 9 -> (es,t)
      round 3: (est,</w>) 9
      round 4: (l,o),(o,w) 7 -> (l,o)
      round 5: (lo,w) 7
      round 6: (e,w),(n,e),(w,est</w>) 6 -> (e,w)"""
    from quality_spark.llm.bpe import train_bpe

    text = " ".join(
        w
        for w, f in (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
        for _ in range(f)
    )
    df = spark.createDataFrame([(text,)], "text string")
    merges = train_bpe(df, "text", num_merges=6)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]


def test_bpe_apply_semantics(spark):
    """Rank-greedy apply: lowest-rank pair merges first, all
    occurrences left-to-right; unknown words fall back to characters;
    min_pair_count stops training when pairs get rare."""
    from quality_spark.llm.bpe import (
        apply_bpe,
        bpe_segment_word,
        bpe_token_count,
        train_bpe_from_frequencies,
    )

    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert bpe_segment_word("low", ranks) == ["low", "</w>"]
    assert bpe_segment_word("lower", ranks) == ["low", "er", "</w>"]
    assert bpe_segment_word("zzz", ranks) == ["z", "z", "z", "</w>"]
    # left-to-right non-overlap: 'aaa' under (a,a) -> [aa, a]
    assert bpe_segment_word("aaa", {("a", "a"): 0}) == ["aa", "a", "</w>"]
    # min_pair_count guard
    assert train_bpe_from_frequencies({"ab": 1}, 10, min_pair_count=2) == []

    df = spark.createDataFrame(
        [(1, "low lower"), (2, None)], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r
        for r in apply_bpe(df, "text", list(ranks)).select(
            "doc_id",
            "bpe_tokens",
            bpe_token_count("bpe_tokens").alias("n"),
        ).collect()
    }
    assert out[1]["bpe_tokens"] == ["low", "</w>", "low", "er", "</w>"]
    assert out[1]["n"] == 5
    assert out[2]["bpe_tokens"] is None


def test_bigram_lm_known_values(spark):
    """Add-k bigram LM: hand-computed probabilities on a tiny corpus;
    unseen pairs get finite probability; <2-word docs keep a row with
    NULL scores; perplexity = exp(-avg_logprob)."""
    import math

    from quality_spark.llm.lm import score_with_bigram_lm, train_bigram_lm

    train = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id int, text string"
    )
    pair_c, ctx_c, vocab = train_bigram_lm(train, "text")
    assert vocab == 4
    assert sorted(
        (r["w1"], r["w2"], r["pair_count"]) for r in pair_c.collect()
    ) == [("a", "b", 3), ("b", "a", 1), ("b", "c", 1), ("b", "x", 1)]
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "z z"), (12, "solo")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r
        for r in score_with_bigram_lm(docs, pair_c, ctx_c, vocab, k=0.5).collect()
    }
    r = out[10]  # (a,b): pc 3 cc 3; (b,c): pc 1 cc 3; denom = cc + 0.5*4
    want = (math.log(3.5 / 5.0) + math.log(1.5 / 5.0)) / 2
    assert (r["n_bigrams"], r["n_unseen"], r["sum_pair"], r["sum_ctx"]) == (
        2, 0, 4, 6
    )
    assert abs(r["avg_logprob"] - want) < 1e-12
    assert abs(r["perplexity"] - math.exp(-want)) < 1e-9
    assert out[11]["n_unseen"] == 1  # (z,z) unseen, still scored
    assert out[12]["n_bigrams"] == 0 and out[12]["avg_logprob"] is None


def test_orc_round_trip_pushdown_and_partitions(spark, sf_dir, tmp_path):
    """ORC store: byte-faithful round trip; a readback predicate
    reaches the ORC scan as PushedFilters; partitioned variant prunes
    directories (PartitionFilters non-empty)."""
    import re

    from quality_spark.sources.corpus import read_orc, write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "orc_plain")
    write_orc(docs, path)
    back = read_orc(spark, path, where="n_chars > 100")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "simple"
    )
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "n_chars" in m.group(1), plan
    assert back.count() == docs.filter(F.col("n_chars") > 100).count()
    assert read_orc(spark, path).count() == docs.count()

    ppath = str(tmp_path / "orc_part")
    write_orc(docs, ppath, partition_cols=("lang",))
    one = docs.select("lang").distinct().head()[0]
    pruned = read_orc(spark, ppath, where=f"lang = '{one}'")
    pplan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "simple"
    )
    pm = re.search(r"PartitionFilters: \[([^\]]*)\]", pplan)
    assert pm and "lang" in pm.group(1), pplan
    assert pruned.count() == docs.filter(F.col("lang") == one).count()


def test_csv_quarantine_routes_bad_rows(spark, tmp_path):
    """read_csv_quarantined: type-malformed rows land verbatim in the
    quarantine frame, good rows parse exactly, adversarial quoting
    round-trips through write_csv."""
    from quality_spark.sources.csvio import read_csv_quarantined, write_csv

    # adversarial round trip through our own writer
    df = spark.createDataFrame(
        [(1, 'a,"b"\nc', 10), (2, 'plain', 20)],
        "doc_id long, payload string, n bigint",
    )
    p1 = str(tmp_path / "rt")
    write_csv(df, p1, num_shards=1)
    good, bad = read_csv_quarantined(
        spark, p1, "doc_id bigint, payload string, n bigint", persist=True
    )
    assert bad.count() == 0
    got = {r["doc_id"]: r["payload"] for r in good.collect()}
    assert got[1] == 'a,"b"\nc' and got[2] == "plain"

    # hand-written file with a type-corrupt row
    p2 = tmp_path / "badfile"
    p2.mkdir()
    (p2 / "part.csv").write_text(
        "doc_id,payload,n\n1,ok,5\nnot_a_number,oops,xyz\n3,fine,7\n"
    )
    good2, bad2 = read_csv_quarantined(
        spark, str(p2), "doc_id bigint, payload string, n bigint",
        persist=True,
    )
    assert sorted(r["doc_id"] for r in good2.collect()) == [1, 3]
    quar = bad2.collect()
    assert len(quar) == 1
    assert quar[0]["raw_record"] == "not_a_number,oops,xyz"


def test_parquet_footer_stats_pushdown(spark, sf_dir):
    """parquet_footer_stats: the aggregate reaches the scan
    (PushedAggregation in the DSv2 plan) and values equal a normal
    scan's; the configs live only on a CLONED session — the caller's
    session conf is never touched, so a concurrent query cannot
    observe the flags mid-flip (VERDICT r07 #4)."""
    from quality_spark.sources.corpus import parquet_footer_stats

    path = f"{sf_dir}/lineitem.parquet"
    before_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", "defaultish")
    before_push = spark.conf.get(
        "spark.sql.parquet.aggregatePushdown", "false"
    )

    # pin the plan on a cloned session configured as the helper does
    scoped = spark.newSession()
    scoped.conf.set("spark.sql.sources.useV1SourceList", "")
    scoped.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    agg = scoped.read.parquet(path).agg(
        F.count("*").alias("n"), F.min("l_orderkey").alias("mn")
    )
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "PushedAggregation: [COUNT(*), MIN(l_orderkey)]" in plan, plan

    got = parquet_footer_stats(spark, path, "l_orderkey")
    df = spark.read.parquet(path)
    assert got["n_rows"] == df.count()
    row = df.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    assert got["min"] == row[0] and got["max"] == row[1]
    # caller session conf untouched (not restored — never set)
    assert spark.conf.get("spark.sql.sources.useV1SourceList", "defaultish") == before_v1
    assert spark.conf.get(
        "spark.sql.parquet.aggregatePushdown", "false"
    ) == before_push


def test_tsv_round_trip(spark, tmp_path):
    """sep='\\t': TSV round trip with embedded tabs/commas quoted."""
    from quality_spark.sources.csvio import read_csv_quarantined, write_csv

    df = spark.createDataFrame(
        [(1, "has\ttab, and comma", 5), (2, "plain", 6)],
        "doc_id long, payload string, n bigint",
    )
    p = str(tmp_path / "tsv")
    write_csv(df, p, num_shards=1, sep="\t")
    good, bad = read_csv_quarantined(
        spark, p, "doc_id bigint, payload string, n bigint",
        persist=True, sep="\t",
    )
    assert bad.count() == 0
    got = {r["doc_id"]: r["payload"] for r in good.collect()}
    assert got[1] == "has\ttab, and comma" and got[2] == "plain"


def test_script_profile_known_values(spark):
    """script_profile: counts per script class, dominant by priority
    tie-break, mix fraction 0 for pure docs and positive for mixed;
    no-script docs get 'none' + NULL mix."""
    from quality_spark.llm.textstats import with_script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "hello мир"),
            (4, "12345 !!!"),
            (5, "日本語とカタカナ"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in with_script_profile(df).collect()}
    assert out[1]["n_latin"] == 10 and out[1]["dominant_script"] == "latin"
    assert out[1]["script_mix"] == 0.0
    assert out[2]["n_cyrillic"] == 9 and out[2]["dominant_script"] == "cyrillic"
    assert out[3]["n_latin"] == 5 and out[3]["n_cyrillic"] == 3
    assert out[3]["dominant_script"] == "latin"
    assert abs(out[3]["script_mix"] - 3 / 8) < 1e-12
    assert out[4]["dominant_script"] == "none" and out[4]["script_mix"] is None
    assert out[5]["n_cjk"] == 8 and out[5]["dominant_script"] == "cjk"


def test_script_profile_matches_duckdb(spark, sf_dir):
    """The script histogram + derivations replay exactly in DuckDB
    over real documents (pattern strings are literal-char classes, so
    Java regex and RE2 agree)."""
    import duckdb

    from quality_spark.llm.textstats import (
        script_count_sqls,
        script_profile_sqls,
        with_script_profile,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in with_script_profile(docs.select("doc_id", "text"))
        .drop("text")
        .collect()
    )
    counts = script_count_sqls("text", "duckdb")
    cnt_cols = ", ".join(f"{s} AS {n}" for n, s in counts.items())
    derived = script_profile_sqls("duckdb")
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(f"""
WITH staged AS (SELECT doc_id, {cnt_cols}
                FROM read_parquet('{sf_dir}/documents.parquet')),
s2 AS (SELECT *, {derived['__max']} AS __qs_smx FROM staged)
SELECT doc_id, {', '.join(counts)},
       {derived['dominant_script']} AS dominant_script,
       {derived['script_mix']} AS script_mix
FROM s2
""")
        .fetchall()
    )
    assert got == want and len(got) > 100


def test_contamination_bloom_identical_to_exact(spark, sf_dir):
    """contamination_flags_bloom: the bloom prefilter changes data
    volume, never results — identical rows to the exact path on real
    documents, including at a coarse fpp where the bloom passes many
    false positives to the exact join."""
    from quality_spark.llm.decontam import (
        contamination_flags,
        contamination_flags_bloom,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    exact = sorted(map(tuple, contamination_flags(corpus, bench, n=13).collect()))
    for fpp in (0.001, 0.3):  # tight and FP-heavy blooms
        bloom = sorted(
            map(
                tuple,
                contamination_flags_bloom(
                    corpus, bench, n=13, fpp=fpp,
                    bloom_name=f"qs_test_dbloom_{str(fpp).replace('.', '_')}",
                ).collect(),
            )
        )
        assert bloom == exact, fpp
    assert len(exact) > 0 and any(r[2] for r in exact)  # non-vacuous


def test_kneser_ney_bigram_known_values(spark):
    """Interpolated KN bigram: hand-computed probabilities on a tiny
    corpus — seen pair with discount+backoff mass, unseen context
    falling back to the continuation distribution."""
    import math

    from quality_spark.llm.lm import (
        score_with_bigram_lm_kn,
        train_bigram_lm_kn,
    )

    train = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    pc, cc, nc, fo, nt = train_bigram_lm_kn(train)
    assert nt == 3
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z q"), (12, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in score_with_bigram_lm_kn(docs, pc, cc, nc, fo, nt).collect()
    }
    # (a,b): max(1-.75,0)/2 + .75*(fanout(a)=2)/2 * P_cont(b)=(1+1)/(3+1)
    #      = 0.125 + 0.75*1*0.5 = 0.5
    assert abs(out[10]["avg_logprob"] - math.log(0.5)) < 1e-12
    assert out[10]["n_bigrams"] == 1 and out[10]["n_unseen"] == 0
    assert out[10]["sum_cont"] == 1 and out[10]["sum_fanout"] == 2
    # unseen context 'z': P = P_cont(q) = (0+1)/(3+1) = 0.25
    assert abs(out[11]["avg_logprob"] - math.log(0.25)) < 1e-12
    assert out[11]["n_unseen"] == 1
    # empty doc: row kept, zero bigrams, NULL scores
    assert out[12]["n_bigrams"] == 0 and out[12]["avg_logprob"] is None


def test_kneser_ney_min_count_pruned_context_backs_off(spark):
    """ADVICE r08: with min_count > 1 a SEEN context can lose all its
    pairs to pruning (cc > 0, fc = 0) — both interpolation terms are
    then 0 and ln(0) would be NULL in non-ANSI Spark, silently
    shrinking avg_logprob's denominator below n_bigrams. Such bigrams
    must back off to P_cont like an unseen context."""
    import math

    from quality_spark.llm.lm import (
        score_with_bigram_lm_kn,
        train_bigram_lm_kn,
    )

    # 'a b' twice -> pair (a,b) survives min_count=2; 'x y' once ->
    # ALL of context x's pairs pruned, but ctx_count(x)=1 remains.
    train = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "x y")], "doc_id long, text string"
    )
    pc, cc, nc, fo, nt = train_bigram_lm_kn(train, min_count=2)
    assert nt == 1  # only (a,b) survives
    docs = spark.createDataFrame([(10, "x y a b")], "doc_id long, text string")
    out = score_with_bigram_lm_kn(docs, pc, cc, nc, fo, nt).collect()[0]
    assert out["n_bigrams"] == 3
    # (x,y): cc=1 fc=0 -> P_cont(y) = (0+1)/(1+1) = 0.5  [backoff]
    # (y,a): cc=0      -> P_cont(a) = (0+1)/(1+1) = 0.5
    # (a,b): max(2-.75,0)/2 + .75*(1/2)*P_cont(b)=(1+1)/2=1.0
    #      = 0.625 + 0.375 = 1.0
    expect = (math.log(0.5) + math.log(0.5) + math.log(1.0)) / 3
    assert out["avg_logprob"] is not None
    assert abs(out["avg_logprob"] - expect) < 1e-12


def test_winnow_guarantee_and_duckdb_parity(spark, sf_dir):
    """Winnowing (Schleimer 2003): any two docs sharing a run of
    w+k-1 tokens MUST share a fingerprint (the algorithm's whole
    guarantee), fingerprint sets replay identically in DuckDB over
    real testdata text, and NULL/empty/short docs behave (empty set /
    single window)."""
    import duckdb
    from pyspark.sql import functions as F

    from quality_spark.llm.textstats import (
        winnow_overlap_pairs,
        winnow_sql,
        with_winnow_fingerprints,
    )

    k, w = 3, 5
    run = "zeta theta omega alpha kappa sigma delta"  # w+k-1 = 7 tokens
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 9 == 0, F.lit(None).cast("string"))
            .when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.substring("text", 1, 30), F.lit(" " + run)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    got = {
        r["doc_id"]: sorted(r["fps"])
        for r in with_winnow_fingerprints(docs, k=k, w=w, out="fps")
        .select("doc_id", "fps")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d0 AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = winnow_sql("text", k, w, "duckdb")
    want = {
        int(i): sorted(v)
        for i, v in con.execute(
            f"""SELECT doc_id, {sql} FROM (
                SELECT doc_id, CASE
                  WHEN doc_id % 9 = 0 THEN NULL
                  WHEN doc_id % 4 = 0 THEN substr(text, 1, 30) || ' {run}'
                  ELSE text END AS text
                FROM d0 WHERE doc_id < 60)"""
        ).fetchall()
    }
    assert got == want
    # guarantee: every pair of run-carrying docs shares >= 1 fp
    carriers = [d for d in got if d % 4 == 0 and d % 9 != 0]
    assert len(carriers) >= 2
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(docs, k=k, w=w).collect()
    }
    for i, a in enumerate(carriers):
        for b in carriers[i + 1 :]:
            key = (min(a, b), max(a, b))
            assert key in pairs, f"guarantee violated for {key}"
    # null docs emit empty sets
    assert all(got[d] == [] for d in got if d % 9 == 0)
