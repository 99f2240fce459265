"""Bounded-pair-cost caps, exercised where they actually BITE.

The oracle gate runs at sf0.01 where no posting list exceeds any cap, so
it proves cap == no-op there. These tests build a degenerate corpus — a
boilerplate cluster far above the caps plus a planted rare near-dup
pair — and pin the caps' two contractual properties:

 1. the boilerplate cluster generates ZERO candidate pairs (its cost is
    dropped, not paid);
 2. the planted pair, whose evidence is rare shingles, is still found.

Exact dedup (uncapped, hash-groupBy) still catches the clones, which is
the pipeline-order argument for why dropping them from near-dup
candidate generation loses nothing.
"""

from __future__ import annotations

import pytest

from op_etl_spark.suite import dedup


N_CLONES = 200  # > DF_CAP (64), > LSH_BUCKET_CAP (32)


def _mk_corpus(spark, tmp_path) -> str:
    """documents.parquet: N_CLONES identical docs + 2 near-dup docs with
    rare vocabulary + filler docs with disjoint vocabularies."""
    clone_text = "common boilerplate sentence repeated across every clone document here"
    near_a = "rare alpha beta gamma delta epsilon zeta eta theta iota kappa lambda shared"
    near_b = "rare alpha beta gamma delta epsilon zeta eta theta iota kappa lambda extra"
    rows = []
    for i in range(N_CLONES):
        rows.append((i, clone_text))
    rows.append((1000, near_a))
    rows.append((1001, near_b))
    for i in range(40):
        rows.append((2000 + i, f"filler{i} unique{i} words{i} only{i} appear{i} once{i} in{i} this{i} doc{i}"))
    df = spark.createDataFrame(
        [(d, t, "en", "synthetic", len(t)) for d, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "capcorpus")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    return _mk_corpus(spark, tmp_path_factory.mktemp("caps"))


class TestJaccardDFCap:
    def test_boilerplate_cluster_generates_no_pairs(self, spark, corpus):
        pairs = dedup.ngram_jaccard_pairs_capped(spark, corpus).collect()
        clone_pairs = [r for r in pairs if r.id1 < N_CLONES and r.id2 < N_CLONES]
        assert clone_pairs == []  # the 200-clone cluster's k^2 was dropped

    def test_planted_rare_pair_survives(self, spark, corpus):
        pairs = dedup.ngram_jaccard_pairs_capped(spark, corpus).collect()
        assert any({r.id1, r.id2} == {1000, 1001} for r in pairs)

    def test_uncapped_would_pay_the_quadratic_cost(self, spark, corpus):
        # the exact variant DOES emit the clone cluster's pairs — that's
        # the 200*199/2 cost the cap exists to avoid
        pairs = dedup.ngram_jaccard_pairs(spark, corpus).collect()
        clone_pairs = [r for r in pairs if r.id1 < N_CLONES and r.id2 < N_CLONES]
        assert len(clone_pairs) == N_CLONES * (N_CLONES - 1) // 2


class TestLshBucketCap:
    def test_clone_bucket_dropped_planted_pair_found(self, spark, corpus):
        pairs = dedup.minhash_lsh_candidates(spark, corpus).collect()
        clone_pairs = [r for r in pairs if r.id1 < N_CLONES and r.id2 < N_CLONES]
        assert clone_pairs == []
        assert any({r.id1, r.id2} == {1000, 1001} for r in pairs)


class TestExactDedupStillCatchesClones:
    def test_clones_collapse_via_exact_dedup(self, spark, corpus):
        groups = dedup.exact_dedup_groups(spark, corpus).collect()
        clone_group = [g for g in groups if g.n_copies == N_CLONES]
        assert len(clone_group) == 1
        assert clone_group[0].canonical_id == 0


# --- embedding-family caps (added after the 32x probe caught the
# label-only blocking at 1925x and uncapped sign-LSH at 26x) ---

N_EMB_CLONES = 1200  # > EMB_BLOCK_CAP (1024), > SIGNLSH_BUCKET_CAP (64)


def _mk_embeddings(spark, tmp_path) -> str:
    """embeddings.parquet: a mega-cluster of N_EMB_CLONES near-identical
    vectors in one (label, sign-bucket) block + a planted near-dup pair
    in its own sparse block."""
    rows = []
    for i in range(N_EMB_CLONES):
        # all-positive signs -> one block; tiny jitter via index
        v = [1.0 + (i % 7) * 1e-3] * 8
        rows.append((i, v, 1))
    # planted pair: distinct sign pattern, tiny block, cosine ~ 1
    rows.append((9000, [-1.0, 2.0, -3.0, 4.0, 1.0, 1.0, 1.0, 1.0], 2))
    rows.append((9001, [-1.0, 2.0, -3.0, 4.0, 1.0, 1.0, 1.0, 1.001], 2))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = str(tmp_path / "embcorpus")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


@pytest.fixture(scope="module")
def emb_corpus(spark, tmp_path_factory):
    return _mk_embeddings(spark, tmp_path_factory.mktemp("embcaps"))


class TestEmbeddingBlockCap:
    def test_sign_identical_mega_block_hits_terminal_backstop(self, spark, emb_corpus):
        # all N_EMB_CLONES vectors share EVERY sign bit, so no amount of
        # extra sign-prefix splitting separates them: the block is still
        # over cap at the deepest level and the terminal backstop drops it
        # (it's an exact/near-exact dup cluster, exact_dedup territory).
        from op_etl_spark.suite.similarity import embedding_neardup_pairs

        out = embedding_neardup_pairs(spark, emb_corpus)
        ids = {r.id1 for r in out.collect()} | {r.id2 for r in out.collect()}
        assert not any(i < N_EMB_CLONES for i in ids)

    def test_planted_pair_survives_block_cap(self, spark, emb_corpus):
        from op_etl_spark.suite.similarity import embedding_neardup_pairs

        rows = embedding_neardup_pairs(spark, emb_corpus).collect()
        assert any(r.id1 == 9000 and r.id2 == 9001 and r.cosine > 0.99 for r in rows)


# --- hierarchical split (round-4 rework: over-cap blocks SPLIT, not drop) ---


def _mk_splittable(spark, tmp_path) -> str:
    """One label whose level-4 sign block is over cap (1050 > 1024) but
    whose dims 5-8 signs split it into two under-cap level-8 sub-blocks
    (550 / 500). Under the old drop-the-block semantics EVERY pair here
    was lost; the split must recover the planted near-dup pair in the
    negative-sign sub-block while never pairing across sub-blocks."""
    eps = 1e-3
    rows = []
    for i in range(550):  # sub-block A: dims 5-8 positive
        v = [eps] * 8
        v[i % 4] = 1000.0
        for d in range(4, 8):
            v[d] = eps
        rows.append((i, v, 1))
    for i in range(500):  # sub-block B: dims 5-8 negative
        v = [eps] * 8
        v[i % 4] = 1000.0
        for d in range(4, 8):
            v[d] = -eps
        rows.append((5000 + i, v, 1))
    rows.append((9000, [1.0, 2.0, 3.0, 4.0, -1.0, -1.0, -1.0, -1.0], 1))
    rows.append((9001, [1.0, 2.0, 3.0, 4.001, -1.0, -1.0, -1.0, -1.0], 1))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = str(tmp_path / "splitcorpus")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


class TestEmbeddingBlockSplit:
    @pytest.fixture(scope="class")
    def split_corpus(self, spark, tmp_path_factory):
        return _mk_splittable(spark, tmp_path_factory.mktemp("embsplit"))

    def test_overcap_block_pairs_recovered_by_split(self, spark, split_corpus):
        from op_etl_spark.suite.similarity import embedding_neardup_pairs

        out = embedding_neardup_pairs(spark, split_corpus)
        planted = out.filter("id1 = 9000 AND id2 = 9001").collect()
        assert len(planted) == 1 and planted[0].cosine > 0.99

    def test_split_never_pairs_across_sub_blocks(self, spark, split_corpus):
        from op_etl_spark.suite.similarity import embedding_neardup_pairs
        from pyspark.sql import functions as F

        out = embedding_neardup_pairs(spark, split_corpus)
        # A-ids are < 550, B-ids are >= 5000: a cross pair would have
        # id1 in A and id2 in B
        n_cross = out.filter((F.col("id1") < 550) & (F.col("id2") >= 5000)).count()
        assert n_cross == 0

    def test_signlsh_bucket_cap_and_recall(self, spark, emb_corpus):
        from op_etl_spark.suite.similarity import embedding_signlsh_neardup

        rows = embedding_signlsh_neardup(spark, emb_corpus).collect()
        ids = {r.id1 for r in rows} | {r.id2 for r in rows}
        assert not any(i < N_EMB_CLONES for i in ids)  # mega bucket dropped
        assert any(r.id1 == 9000 and r.id2 == 9001 for r in rows)  # pair found


class TestPrefixFilterExactness:
    def test_prefix_filter_equals_exact_baseline(self, spark, corpus):
        """The no-false-negative contract, adversarially: on the clone-
        heavy corpus the prefix-filtered join must produce EXACTLY the
        corpus-wide exact join's output — including every pair inside the
        200-clone cluster (prefix filtering, unlike the DF cap, is
        lossless; its cost control is the rare-first prefix, not a
        drop)."""
        exact = {
            (r.id1, r.id2, r.n_common, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(spark, corpus).collect()
        }
        prefixed = {
            (r.id1, r.id2, r.n_common, r.jaccard)
            for r in dedup.prefix_filter_jaccard_pairs(spark, corpus).collect()
        }
        assert prefixed == exact
        # and the clone cluster IS present (lossless where the cap drops)
        clone_pairs = [p for p in prefixed if p[0] < N_CLONES and p[1] < N_CLONES]
        assert len(clone_pairs) == N_CLONES * (N_CLONES - 1) // 2


class TestWeightedJaccardDiscrimination:
    def test_doubled_text_scores_half_not_one(self, spark, tmp_path):
        """The docstring's motivating claim: a doc and its 2x
        self-concatenation share every shingle as a SET (unweighted
        Jaccard ~1.0) but the multiset min/max ratio is ~0.5 — weighted
        Jaccard sees the repetition unweighted Jaccard cannot."""
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        doubled = base + " " + base
        rows = [(1, base), (2, doubled)]
        df = spark.createDataFrame(
            [(d, t, "en", "synthetic", len(t)) for d, t in rows],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        out = str(tmp_path / "wjcorpus")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")

        pairs = {
            (r.id1, r.id2): r.w_jaccard
            for r in dedup.weighted_jaccard_pairs(spark, out).collect()
        }
        assert (1, 2) in pairs
        # doubled doc: every shared shingle has count ~2 on one side and 1
        # on the other, plus the single seam shingles -> J_w near 0.5,
        # far from the ~1.0 the set version reports
        assert 0.3 <= pairs[(1, 2)] <= 0.6


class TestExactSubstringPairs:
    """Zero-false-positive contract of the content-defined gram sampler:
    every reported pair shares a verbatim 6-token run; disjoint-vocab
    docs never pair; the DF cap drops boilerplate; and a planted run of
    >= SPAN_W + 3*SPAN_SEL_MOD tokens is reliably detected (the run
    carries enough grams that content-sampling keeps at least one —
    checked exactly against the sampler's own selection rule)."""

    def test_no_false_positives_and_brute_force_agreement(self, spark, corpus):
        got = {
            (r.id1, r.id2): r.n_shared_grams
            for r in dedup.exact_substring_pairs(spark, corpus).collect()
        }
        docs = {
            r.doc_id: r.text.split(" ")
            for r in spark.read.parquet(f"{corpus}/documents.parquet").collect()
        }

        def grams(toks):
            return {
                " ".join(toks[i : i + dedup.SPAN_W])
                for i in range(len(toks) - dedup.SPAN_W + 1)
            }

        # brute force over the small corpus: selected, capped shared grams
        import hashlib

        def selected(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dedup.SPAN_SEL_MOD == 0

        per_doc = {d: {g for g in grams(t) if selected(g)} for d, t in docs.items()}
        df_count: dict = {}
        for gs in per_doc.values():
            for g in gs:
                df_count[g] = df_count.get(g, 0) + 1
        ids = sorted(per_doc)
        expect = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared = {
                    g
                    for g in per_doc[a] & per_doc[b]
                    if 2 <= df_count[g] <= dedup.SPAN_DF_CAP
                }
                if shared:
                    expect[(a, b)] = len(shared)
        assert got == expect
        # every reported pair REALLY shares a verbatim 6-token run
        for a, b in got:
            assert grams(docs[a]) & grams(docs[b])

    def test_boilerplate_cluster_dropped_planted_run_found(self, spark, tmp_path):
        run = " ".join(f"planted{i}" for i in range(dedup.SPAN_W + 3 * dedup.SPAN_SEL_MOD))
        rows = [(1, "prefix one two three " + run), (2, run + " suffix four five six")]
        boiler = "common boilerplate tokens repeated verbatim across every clone doc here now"
        rows += [(100 + i, boiler) for i in range(N_CLONES)]
        df = spark.createDataFrame(
            [(d, t, "en", "synthetic", len(t)) for d, t in rows],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        out = str(tmp_path / "subcorpus")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        got = {(r.id1, r.id2) for r in dedup.exact_substring_pairs(spark, out).collect()}
        assert (1, 2) in got  # the planted shared run is detected
        # the boilerplate cluster (df >> cap) contributes no pair
        assert not any(a >= 100 and b >= 100 for a, b in got)
