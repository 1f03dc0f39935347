"""Semantic tests for the corpus-curation operators (decontamination,
sequence packing, TF-IDF, stratified sampling, unigram LM scoring) on
planted fixtures — the oracle gate (test_oracle.py) covers cross-engine
parity on the driver tables; these pin the *semantics* on data where the
right answer is known by construction."""

import hashlib
import os

import pytest

from river_spark.queries.curation import (
    decontam_ngram_overlap,
    pipeline_seq_pack,
    pipeline_stratified_sample,
    text_tfidf_top_terms,
    text_unigram_logprob,
)


def _write_documents(spark, tmp_path, rows):
    """rows: (doc_id, text, lang). Writes {tmp}/documents.parquet the way
    the driver lays out testdata, so query fns run on it unchanged."""
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("curation_docs")
    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # doc 0: eval (0 % 97 == 0)
        (0, "secret benchmark question about rare quasar physics today", "en"),
        # doc 1: contaminated train doc — copies a long span of doc 0
        (1, "intro words then secret benchmark question about rare quasar physics", "en"),
        # doc 2: clean train doc, no 3-gram overlap with doc 0
        (2, common, "en"),
        # doc 3: shares exactly ONE 3-gram with doc 0 -> below threshold
        (3, "noise secret benchmark question zzz yyy xxx www vvv uuu", "en"),
        # filler docs in other langs for the stratified strata
        (4, common + " extra", "zh"),
        (5, common + " more filler", "de"),
        (97, "another eval document entirely disjoint vocabulary set here", "en"),
    ]
    return _write_documents(spark, tmp, rows)


def test_decontam_flags_planted_contamination(spark, planted_dir):
    got = {r.doc_id: r for r in decontam_ngram_overlap(spark, planted_dir).collect()}
    # doc 1 shares many 3-grams with eval doc 0 -> flagged
    assert 1 in got and got[1].n_hit_shingles >= 2 and got[1].n_eval_docs == 1
    # one shared shingle (doc 3) is below the >=2 threshold; doc 2 is clean
    assert 3 not in got and 2 not in got
    # eval docs themselves never appear in the flagged set
    assert 0 not in got and 97 not in got


def test_decontam_short_docs_do_not_crash_or_match(spark, tmp_path_factory):
    """1-2-token (and empty) documents must produce zero shingles — an
    unguarded sequence(1, size-2) yields the descending [1, 0] and either
    crashes under ANSI or emits bogus short 'shingles' that spuriously
    match other short docs."""
    tmp = tmp_path_factory.mktemp("short_docs")
    sf = _write_documents(
        spark,
        tmp,
        [
            (0, "one two", "en"),        # eval (0 % 97 == 0), 2 tokens
            (1, "one", "en"),            # 1 token
            (2, "", "en"),               # empty
            (3, "one two", "en"),        # identical 2-token train doc
            (4, "alpha beta gamma delta", "en"),
        ],
    )
    assert decontam_ngram_overlap(spark, sf).collect() == []


def test_seq_pack_invariants(spark, sf_dir):
    rows = pipeline_seq_pack(spark, sf_dir).collect()
    import duckdb

    total_toks = duckdb.sql(
        f"SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    # conservation: every doc lands in exactly one pack
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.pack_tokens for r in rows) == total_toks
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, packs in by_shard.items():
        packs.sort(key=lambda r: r.pack_id)
        # packs tile the shard's doc-id order: contiguous, non-overlapping
        for a, b in zip(packs, packs[1:]):
            assert a.last_doc < b.first_doc
        # every pack crosses its 512 boundary except possibly the last
        for p in packs[:-1]:
            assert p.pack_tokens >= 512 - 100  # docs are <=100 tokens


def test_stratified_sample_matches_reference_hash(spark, planted_dir):
    got = {r.lang: r for r in pipeline_stratified_sample(spark, planted_dir).collect()}
    rates = {"en": 50, "de": 80, "es": 80, "fr": 80, "zh": 100}
    docs = {
        "en": [0, 1, 2, 3, 97],
        "zh": [4],
        "de": [5],
    }
    for lang, ids in docs.items():
        kept = [
            i
            for i in ids
            if int(hashlib.md5(str(i).encode()).hexdigest()[4:8], 16) % 100 < rates[lang]
        ]
        assert got[lang].n_docs == len(ids)
        assert got[lang].n_kept == len(kept)
        assert got[lang].kept_id_sum == sum(kept)
    # rate-100 stratum keeps everything
    assert got["zh"].n_kept == got["zh"].n_docs


def test_tfidf_unique_term_ranks_first(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tfidf_docs")
    sf = _write_documents(
        spark,
        tmp,
        [
            (1, "shared shared shared unicorn", "en"),
            (2, "shared shared shared", "en"),
            (3, "shared words words", "en"),
        ],
    )
    rows = text_tfidf_top_terms(spark, sf).collect()
    top = {r.doc_id: r.term for r in rows if r.rnk == 1}
    # 'unicorn' appears only in doc 1 -> highest idf there beats 'shared'
    assert top[1] == "unicorn"
    # 'shared' appears in every doc -> idf = ln(1) = 0 exactly
    zero = [r for r in rows if r.term == "shared"]
    assert zero and all(r.tfidf == 0.0 for r in zero)


def test_unigram_logprob_orders_common_before_rare(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lm_docs")
    sf = _write_documents(
        spark,
        tmp,
        [
            (1, "common common common common", "en"),
            (2, "common common common rare", "en"),
        ],
    )
    got = {r.doc_id: r for r in text_unigram_logprob(spark, sf).collect()}
    # all-common doc has strictly higher (less negative) mean logprob
    assert got[1].avg_logprob > got[2].avg_logprob
    assert got[1].n_tokens == 4 and got[2].n_tokens == 4
