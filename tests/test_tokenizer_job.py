"""BPE tokenizer training job (jobs/train_tokenizer.py): the exported
merge table matches a direct bpe_train run, the vocab rollup adds up,
min-freq pruning drops hapaxes from the type table, and the segment
CLI reproduces bpe_segment from the prebuilt table."""

from __future__ import annotations

import json

import pytest

DOCS = [
    (0, "low low low low low lower lower newest newest newest"),
    (1, "newest newest newest widest widest widest new new"),
    (2, "low lower widest Mixed-Case dropped123 keep keep"),
]


@pytest.fixture(scope="module")
def trained(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bpe")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.parquet(str(base / "docs"))
    from jobs.train_tokenizer import main

    main(["--documents", str(base / "docs"),
          "--out", str(base / "tok"), "--merges", "6"])
    return base


def test_merge_table_matches_direct_train(spark, trained):
    from pyspark.sql import functions as F

    from barkingowl_spark.functions.bpe import bpe_train, word_counts

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    words = word_counts(docs).filter(F.col("word").rlike("^[a-z]+$"))
    want = sorted(
        (r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
        for r in bpe_train(words, 6).collect())
    got = sorted(
        (r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
        for r in spark.read.parquet(
            str(trained / "tok" / "merges")).collect())
    assert got == want
    # pattern gate: no piece of 'Mixed-Case'/'dropped123' ever trained
    assert all("-" not in l and "1" not in l for _, l, _, _ in got)


def test_vocab_rolls_up(spark, trained):
    vocab = {r["piece"]: (r["n_words"], r["total_freq"])
             for r in spark.read.parquet(
                 str(trained / "tok" / "vocab")).collect()}
    from collections import Counter

    wf = Counter(
        w for _, t in DOCS for w in t.split()
        if w.isalpha() and w.islower())
    # every piece's weighted count sums to the corpus token mass
    # (each word contributes len(pieces(word)) pieces)
    assert sum(n for _, n in vocab.values()) >= sum(wf.values())
    # 'low' is a whole word after 6 merges on this corpus: the piece
    # appears in low/lower at least
    assert "low" in vocab and vocab["low"][0] >= 2


def test_segment_cli(spark, trained, capsys):
    from jobs.train_tokenizer import main

    main(["--merge-table", str(trained / "tok" / "merges"),
          "--segment", "lowest,newest"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"lowest", "newest"}
    assert "".join(out["lowest"]) == "lowest"
    assert "".join(out["newest"]) == "newest"
    # merges actually fired: fewer pieces than characters
    assert len(out["newest"]) < len("newest")


def test_min_freq_prunes_hapaxes(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "docs"))
    from jobs.train_tokenizer import main

    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "tok2"), "--merges", "2",
          "--min-freq", "3"])
    from pyspark.sql import functions as F

    from barkingowl_spark.functions.bpe import bpe_train, word_counts

    words = (
        word_counts(docs).filter(F.col("word").rlike("^[a-z]+$"))
        .filter(F.col("freq") >= 3)
    )
    want = sorted(
        (r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
        for r in bpe_train(words, 2).collect())
    got = sorted(
        (r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
        for r in spark.read.parquet(
            str(tmp_path / "tok2" / "merges")).collect())
    assert got == want


def test_unigram_mode_end_to_end(spark, tmp_path, capsys):
    from jobs.train_tokenizer import main

    from barkingowl_spark.functions.unigramlm import (
        unigram_em_vocab,
        unigram_segment,
        unigram_vocab,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "uni"), "--model", "unigram",
          "--unigram-v", "32"])
    head = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert head["model"] == "unigram"
    # exported tables match direct operator runs
    # the job threads --word-pattern/--min-freq into the unigram
    # path (it silently ignored them before) — direct calls must
    # pass the job's defaults to compare
    want_v = {(r["piece"], r["mass"], r["cost_bits"])
              for r in unigram_vocab(
                  docs, v=32, word_pattern="^[a-z]+$").collect()}
    got_v = {(r["piece"], r["mass"], r["cost_bits"])
             for r in spark.read.parquet(
                 str(tmp_path / "uni/vocab")).collect()}
    assert got_v == want_v
    want_s = {(r["word"], r["c"], r["cost_bits"], r["n_pieces"])
              for r in unigram_segment(
                  docs, v=32, word_pattern="^[a-z]+$").collect()}
    got_s = {(r["word"], r["c"], r["cost_bits"], r["n_pieces"])
             for r in spark.read.parquet(
                 str(tmp_path / "uni/segments")).collect()}
    assert got_s == want_s
    # the pattern actually bit: Mixed-Case / dropped123 never reach
    # the type table (previously they did — the flag was ignored)
    assert not {w for w, _, _, _ in got_s} & {"Mixed-Case",
                                              "dropped123"}
    assert head["word_types"] == len(want_s)
    assert head["chars_per_piece_milli"] >= 1000  # pieces <= chars

    # --em-rounds 1 exports the EM-rescored inventory instead
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "uni2"), "--model", "unigram",
          "--unigram-v", "32", "--em-rounds", "1"])
    capsys.readouterr()
    want_e = {(r["piece"], r["mass_em"], r["cost_bits_em"])
              for r in unigram_em_vocab(
                  docs, v=32, word_pattern="^[a-z]+$").collect()}
    got_e = {(r["piece"], r["mass_em"], r["cost_bits_em"])
             for r in spark.read.parquet(
                 str(tmp_path / "uni2/vocab")).collect()}
    assert got_e == want_e
    # EM prunes: the rescored inventory only keeps used pieces
    assert {p for p, _, _ in got_e} <= {p for p, _, _ in got_v}


def test_unigram_empty_corpus_stats_line(spark, tmp_path, capsys):
    """Empty corpus: sum aggregates are NULL — the stats line must
    coalesce to 0 instead of raising TypeError in max(None, 1)."""
    from jobs.train_tokenizer import main

    docs = spark.createDataFrame([], "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "uni"), "--model", "unigram",
          "--unigram-v", "8"])
    head = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert head["word_types"] == 0
    assert head["chars_per_piece_milli"] == 0
