"""C4 line-level cleanup + CCNet perplexity buckets + attrition funnel.

Round-5 additions beyond the reference surface: the intra-document
edit pass (C4 §2.2), the per-language head/middle/tail perplexity
split (CCNet §4), and the per-stage funnel over the gated pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from greatex_spark.functions.heuristics import c4_line_filter
from greatex_spark.functions.perplexity import ppl_buckets


GOOD = "this sentence definitely has enough words to pass the filter."
SHORT = "too short."
NO_PUNCT = "this line has plenty of words but no terminal punctuation mark"
JS = "please enable JavaScript to view this fine content properly."


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestC4LineFilter:
    def test_line_rules(self, spark):
        text = "\n".join([GOOD, SHORT, NO_PUNCT, JS, GOOD])
        row = c4_line_filter(_docs(spark, [text])).collect()[0]
        assert row.n_lines == 5
        assert row.n_kept_lines == 2
        assert row.text_clean == GOOD + "\n" + GOOD
        assert row.keep is False  # < 3 retained lines

    def test_keep_threshold(self, spark):
        text = "\n".join([GOOD] * 3)
        row = c4_line_filter(_docs(spark, [text])).collect()[0]
        assert row.n_kept_lines == 3 and row.keep is True

    def test_empty_text(self, spark):
        row = c4_line_filter(_docs(spark, [""])).collect()[0]
        assert row.n_lines == 1  # split('') -> ['']
        assert row.n_kept_lines == 0
        assert row.text_clean == ""
        assert row.keep is False

    def test_no_shuffle(self, spark):
        plan = c4_line_filter(_docs(spark, [GOOD]))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPplBuckets:
    @pytest.fixture(scope="class")
    def bucketed(self, spark):
        # 30 scoreable docs per language with 30 DISTINCT perplexities
        # (mix ratio of rare/common word pools varies per doc; the
        # per-doc suffix breaks residual ties), plus one unscoreable
        # stub per language
        def text(i: int) -> str:
            pools = ["the", "and", "of", "to", "value", "text"]
            words = [
                f"zq{j % 11}x" if (j * 31 + i * 7) % 30 < i else pools[j % 6]
                for j in range(40)
            ]
            return " ".join(words) + f" q{i}w{(i * i) % 13}."

        rows = []
        for li, lang in enumerate(("en", "de")):
            for i in range(30):
                rows.append((li * 100 + i, text(i), lang))
            rows.append((li * 100 + 99, "x", lang))
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        return ppl_buckets(df).collect()

    def test_unscored(self, bucketed):
        unscored = {r.doc_id for r in bucketed if r.ppl_bucket == "unscored"}
        assert unscored == {99, 199}
        assert all(r.log_ppl is None for r in bucketed if r.doc_id in unscored)

    def test_thirds_per_language(self, bucketed):
        for lang in ("en", "de"):
            counts = {"head": 0, "middle": 0, "tail": 0}
            for r in bucketed:
                if r.lang == lang and r.ppl_bucket in counts:
                    counts[r.ppl_bucket] += 1
            # exact interpolated percentiles at 1/3 and 2/3 over 30
            # distinct-ish values split 10/10/10 exactly
            assert sum(counts.values()) == 30
            assert counts["head"] == 10 and counts["middle"] == 10

    def test_bucket_order_matches_score(self, bucketed):
        for lang in ("en", "de"):
            scored = sorted(
                (r for r in bucketed if r.lang == lang and r.log_ppl is not None),
                key=lambda r: (r.log_ppl, r.doc_id),
            )
            labels = [r.ppl_bucket for r in scored]
            # head block precedes middle precedes tail in ppl order
            assert labels == sorted(
                labels, key=lambda b: {"head": 0, "middle": 1, "tail": 2}[b]
            )

    def test_approx_mode_runs(self, spark):
        df = _docs(spark, [GOOD * 3, GOOD * 5, GOOD * 7]).withColumn(
            "lang", F.lit("en")
        )
        out = ppl_buckets(df, approx=True).collect()
        assert len(out) == 3 and all(r.ppl_bucket != "unscored" for r in out)


class TestStageAttrition:
    def test_funnel_chains(self, spark):
        import __spark_entry__ as entry

        rows = {
            r.stage: r
            for r in entry.pipeline_stage_attrition(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert set(rows) == {"1_quality", "2_langid", "3_perplexity", "4_dedup"}
        order = ["1_quality", "2_langid", "3_perplexity", "4_dedup"]
        for prev, nxt in zip(order, order[1:]):
            assert rows[nxt].docs_in == rows[prev].docs_kept
        for r in rows.values():
            assert r.docs_dropped == r.docs_in - r.docs_kept >= 0
            if r.docs_in:
                assert r.drop_pct == pytest.approx(
                    100.0 * r.docs_dropped / r.docs_in
                )


class TestRepetitionSignals:
    def _row(self, spark, text):
        from greatex_spark.functions.heuristics import (
            REPETITION_SIGNAL_NAMES,
            repetition_struct,
        )

        df = _docs(spark, [text]).select(
            repetition_struct(F.col("text")).alias("r")
        ).select("r.*")
        assert list(df.columns) == list(REPETITION_SIGNAL_NAMES)
        return df.collect()[0]

    def test_duplicate_lines_and_paragraphs(self, spark):
        # 4 lines, "dup line." appears 3x -> dup_line_fraction 2/4;
        # dup chars = 2 extra copies of the 9-char line over 36+? chars
        text = "dup line.\nunique one here.\ndup line.\ndup line."
        r = self._row(spark, text)
        assert r.dup_line_fraction == pytest.approx(2 / 4)
        total = sum(len(x) for x in text.split("\n"))
        dup_chars = 2 * len("dup line.")
        assert r.dup_line_char_fraction == pytest.approx(dup_chars / total)
        assert r.dup_para_fraction == 0.0  # no blank-line-separated repeats

    def test_duplicate_paragraphs(self, spark):
        text = "para one.\n\npara one.\n\npara two."
        r = self._row(spark, text)
        assert r.dup_para_fraction == pytest.approx(1 / 3)
        total = sum(len(x) for x in text.split("\n\n"))
        assert r.dup_para_char_fraction == pytest.approx(len("para one.") / total)

    def test_top_ngram_char_fraction(self, spark):
        # "the cat" appears 3 times among 5 bigrams
        text = "the cat sat the cat ran the cat"
        r = self._row(spark, text)
        assert r.top_2gram_char_fraction == pytest.approx(3 * len("the cat") / len(text))
        assert 0.0 <= r.top_3gram_char_fraction <= 1.0
        assert 0.0 <= r.top_4gram_char_fraction <= 1.0

    def test_empty_text(self, spark):
        r = self._row(spark, "")
        assert all(v == 0.0 for v in r.asDict().values())


class TestPplBucketsScoreCol:
    def test_prescored_column_reused(self, spark):
        # a pre-scored column skips the UDF entirely: no ArrowEvalPython
        # / BatchEvalPython node may appear in the plan
        df = spark.createDataFrame(
            [(i, "irrelevant", "en", float(i)) for i in range(9)],
            "doc_id long, text string, lang string, my_ppl double",
        )
        out = ppl_buckets(df, score_col="my_ppl")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        rows = {r.doc_id: r.ppl_bucket for r in out.collect()}
        # 9 distinct scores 0..8: thresholds at values ~2.67/5.33
        assert [rows[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )


class TestSubstringDup:
    def test_planted_duplicate_substring(self, spark):
        from greatex_spark.operators.substringdedup import substring_dup_stats

        shared = " ".join(f"s{i}" for i in range(20))  # 20-token shared run
        uniq_a = " ".join(f"a{i}" for i in range(10))
        uniq_b = " ".join(f"b{i}" for i in range(10))
        solo = " ".join(f"c{i}" for i in range(30))
        df = _docs(spark, [f"{uniq_a} {shared}", f"{uniq_b} {shared}", solo])
        rows = {r.doc_id: r for r in substring_dup_stats(df, k=13).collect()}
        # docs 0/1 share a 20-token substring -> its 8 window starts
        # (20-13+1) cover exactly those 20 tokens in each
        for d in (0, 1):
            assert rows[d].n_tokens == 30
            assert rows[d].dup_tokens == 20
            assert rows[d].dup_token_fraction == pytest.approx(20 / 30)
        assert rows[2].dup_tokens == 0 and rows[2].dup_token_fraction == 0.0

    def test_within_doc_repeat_counts(self, spark):
        from greatex_spark.operators.substringdedup import substring_dup_stats

        run = " ".join(f"r{i}" for i in range(13))
        df = _docs(spark, [f"{run} {run}"])  # same 13-gram twice in ONE doc
        r = substring_dup_stats(df, k=13).collect()[0]
        assert r.n_tokens == 26
        assert r.dup_tokens == 26  # both occurrences marked

    def test_short_doc_no_windows(self, spark):
        from greatex_spark.operators.substringdedup import substring_dup_stats

        df = _docs(spark, ["only five words right here.", ""])
        rows = {r.doc_id: r for r in substring_dup_stats(df, k=13).collect()}
        assert rows[0].dup_tokens == 0 and rows[0].dup_token_fraction == 0.0
        assert rows[1].n_tokens == 0 and rows[1].dup_token_fraction == 0.0

    def test_xxhash_family_same_decisions(self, spark):
        from greatex_spark.operators.substringdedup import substring_dup_stats

        shared = " ".join(f"s{i}" for i in range(15))
        df = _docs(spark, [f"x1 {shared}", f"x2 {shared}", "nothing shared here at all."])
        spec = {r.doc_id: r.dup_tokens for r in substring_dup_stats(df).collect()}
        hot = {
            r.doc_id: r.dup_tokens
            for r in substring_dup_stats(df, family="xxhash64").collect()
        }
        assert spec == hot


class TestSubstringTrim:
    def test_canonical_doc_keeps_span(self, spark):
        from greatex_spark.operators.substringdedup import (
            trim_duplicate_substrings,
        )

        shared = " ".join(f"s{i}" for i in range(20))
        uniq_a = " ".join(f"a{i}" for i in range(10))
        uniq_b = " ".join(f"b{i}" for i in range(10))
        df = _docs(spark, [f"{uniq_a} {shared}", f"{uniq_b} {shared}"])
        rows = {
            r.doc_id: r for r in trim_duplicate_substrings(df, k=13).collect()
        }
        # doc 0 holds the canonical (lexicographic min (doc_id, pos)) occurrence of
        # every duplicated window -> untouched; doc 1 loses the 20-token
        # span and keeps only its unique prefix
        assert rows[0].removed_tokens == 0
        assert rows[0].clean_text == f"{uniq_a} {shared}"
        assert rows[1].removed_tokens == 20
        assert rows[1].clean_text == uniq_b

    def test_within_doc_repeat_keeps_first(self, spark):
        from greatex_spark.operators.substringdedup import (
            trim_duplicate_substrings,
        )

        run = " ".join(f"r{i}" for i in range(13))
        df = _docs(spark, [f"{run} {run}"])
        r = trim_duplicate_substrings(df, k=13).collect()[0]
        assert r.n_tokens == 26
        assert r.removed_tokens == 13  # second occurrence cut
        assert r.clean_text == run

    def test_clean_corpus_is_identity(self, spark):
        from greatex_spark.operators.substringdedup import (
            trim_duplicate_substrings,
        )

        texts = ["all tokens here are unique one.", "and so are these two."]
        df = _docs(spark, texts)
        rows = {
            r.doc_id: r for r in trim_duplicate_substrings(df, k=5).collect()
        }
        for i, t in enumerate(texts):
            assert rows[i].removed_tokens == 0
            assert rows[i].clean_text == t  # single-space input -> byte equal

    def test_overlapping_spans_merge(self, spark):
        from greatex_spark.operators.substringdedup import (
            trim_duplicate_substrings,
        )

        # doc 1 repeats doc 0's tokens 0..15 AND 10..25: overlapping
        # marked spans [0,23) and [10,25) must merge to [0,25)
        base_toks = [f"t{i}" for i in range(25)]
        df = _docs(
            spark,
            [
                " ".join(base_toks),
                " ".join(base_toks) + " tail0 tail1 tail2",
            ],
        )
        rows = {
            r.doc_id: r for r in trim_duplicate_substrings(df, k=13).collect()
        }
        assert rows[0].removed_tokens == 0
        assert rows[1].removed_tokens == 25
        assert rows[1].clean_text == "tail0 tail1 tail2"
