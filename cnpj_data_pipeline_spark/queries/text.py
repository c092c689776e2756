"""Text-analysis / dedup operators over the ``documents`` table (training-data
pipeline ops): token stats, quality scoring, language-ID heuristic,
fingerprinting, exact dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash.

Cross-engine determinism: every hash is either md5 (identical in Spark and
DuckDB) or integer arithmetic over a *shingle id* = the leading 60 bits of
md5(shingle) reduced mod 2^31-1 — the same deterministic, fully parallel
mapping in both engines (no engine-specific string hashes, no global-sort
dictionary).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.minhash import (  # shared with the
    HASH_A,  # incremental near-dup index job (plans/neardup.py) — both
    HASH_B,  # compute bit-identical signatures from these primitives
    MERSENNE,
    N_HASHES,
)

STOP_EN = ["the", "a", "of", "to", "and", "in", "is", "it"]
STOP_ES = ["el", "la", "de", "que", "y", "en", "un", "es"]
STOP_FR = ["le", "la", "de", "et", "un", "en", "est", "que"]

SIMHASH_BITS = 16


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _tokens(col="text"):
    return F.split(F.col(col), " ")


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens + char length."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).alias("n_word_tokens"),
        F.length("text").alias("n_chars_measured"),
        (F.length("text") == F.col("n_chars")).alias("chars_consistent"),
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, mean token length, stopword ratio, distinct-
    token ratio — the composite rounded to 6dp for cross-engine equality."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOP_EN)))
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    mean_tok_len = (F.length("text") - (n - 1)) / n  # total chars minus spaces
    score = (
        F.least(n / F.lit(400.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + F.least(stop_hits / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        stop_hits.alias("stopword_hits"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: CJK chars → zh, else stopword-hit argmax over
    {en, es, fr} with deterministic tie-break order en > es > fr."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    en = F.size(F.filter(toks, lambda t: t.isin(*STOP_EN)))
    es = F.size(F.filter(toks, lambda t: t.isin(*STOP_ES)))
    fr = F.size(F.filter(toks, lambda t: t.isin(*STOP_FR)))
    pred = (
        F.when(F.col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
        .when((en >= es) & (en >= fr) & (en > 0), "en")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return d.select(
        "doc_id", "lang",
        en.alias("hits_en"), es.alias("hits_es"), fr.alias("hits_fr"),
        pred.alias("lang_pred"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized text and over the
    leading-3-token prefix (the dedup key used by q_dedup_exact)."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    prefix = F.concat_ws(" ", F.slice(toks, 1, 3))
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp_full"),
        F.md5(prefix).alias("fp_prefix3"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by fingerprint: keep min doc_id per group, report group size."""
    fp = q_doc_fingerprint(spark, sf_dir)
    return fp.groupBy("fp_prefix3").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


def _shingles(col="text", k: int = 3):
    """Word k-shingles — delegates to the shared primitive so the corpus
    queries and the incremental index produce identical shingle sets."""
    from cnpj_data_pipeline_spark.functions import minhash as mh

    return mh.shingles(col, k)


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by word-3-gram Jaccard >= 0.35: explode
    distinct shingles, self-join on shingle (co-occurrence count = |∩|),
    |∪| = |A|+|B|-|∩|. Scale path: the join key IS the shingle, so only
    docs sharing a shingle ever meet (no quadratic blowup). The join key is
    the 31-bit shingle hash id (same deterministic id the oracle uses) — a
    long-key shuffle instead of a string-key one. Each side carries its doc's
    shingle count through the explode, so |A| and |B| ride along with the
    pairs and no extra size-lookup joins are needed; the two identical join
    inputs collapse into one ReusedExchange."""
    d = _docs(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    # materialize the shingle ARRAY as a named column first: referencing one
    # column from both size() and explode() keeps CollapseProject from
    # inlining (= re-evaluating) the whole array expression per exploded row
    sh = d.select("doc_id", _shingles().alias("arr")).select(
        "doc_id",
        F.size("arr").alias("sz"),
        F.explode("arr").alias("shingle"),
    ).select(
        "doc_id",
        "sz",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
            % MERSENNE
        ).alias("sid"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sid") == F.col("b.sid")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = inter.select(
        "doc_a", "doc_b", "n_inter",
        (F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))).alias("jac"),
    )
    return j.filter(F.col("jac") >= 0.35).select(
        "doc_a", "doc_b", "n_inter", F.round("jac", 6).alias("jaccard")
    )


DF_CAP = 20  # max document frequency a shingle may have and still join


def q_ngram_jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100TB-safe variant of q_ngram_jaccard_pairs: shingles whose
    document frequency exceeds DF_CAP are dropped BEFORE the self-join. A
    shingle shared by f docs emits f^2 candidate pairs — boilerplate
    n-grams ('terms of service apply') make the uncapped join quadratic at
    web scale; the cap bounds every shingle's contribution at DF_CAP^2 while
    barely moving recall (near-dups share many rare shingles too). The
    denominator still uses FULL shingle counts, so reported Jaccard is a
    lower bound of the true value — capping can only drop pairs, never
    inflate a score."""
    d = _docs(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    sh = d.select("doc_id", _shingles().alias("arr")).select(
        "doc_id",
        F.size("arr").alias("sz"),
        F.explode("arr").alias("shingle"),
    ).select(
        "doc_id",
        "sz",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
            % MERSENNE
        ).alias("sid"),
    )
    # broadcast the HOT set (boilerplate shingles are few) and anti-join;
    # broadcasting the rare set would ship nearly the whole dictionary
    hot = (
        sh.groupBy("sid")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("sid")
    )
    sh = sh.join(F.broadcast(hot), "sid", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sid") == F.col("b.sid")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = inter.select(
        "doc_a", "doc_b", "n_inter",
        (F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))).alias("jac"),
    )
    return j.filter(F.col("jac") >= 0.35).select(
        "doc_a", "doc_b", "n_inter", F.round("jac", 6).alias("jaccard")
    )


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: pair generation only yields edges (A~B, B~C); the
    dedup decision needs the transitive groups {A,B,C}. Connected components
    over the Jaccard>=0.35 pair graph via alternating star-contraction
    (O(log n) DataFrame rounds, ``operators/graph.py``), labels = component
    min doc_id; every corpus document gets a row (singletons label
    themselves). Oracle: recursive-CTE transitive closure over the same
    pairs — closure is O(n·m) and fine for an oracle, the star contraction
    is the 10^10-doc plan."""
    from cnpj_data_pipeline_spark.operators.graph import connected_components

    pairs = q_ngram_jaccard_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    docs = _docs(spark, sf_dir).select(F.col("doc_id").alias("node"))
    cc = connected_components(edges, nodes=docs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def q_neardup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop decision that materializes the deduplicated
    corpus: within each near-dup cluster the canonical survivor is the
    longest document (max n_chars, tie-break min doc_id). Canonical election
    is a single min_by hash aggregate over a lexicographic struct — one
    map-side-combining shuffle, no per-cluster window sort (a giant cluster
    would serialize a window into one task; the agg stays partial-merge)."""
    from cnpj_data_pipeline_spark.operators.graph import connected_components

    pairs = q_ngram_jaccard_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    d = _docs(spark, sf_dir)
    docs = d.select(F.col("doc_id").alias("node"))
    cc = connected_components(edges, nodes=docs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    labeled = cc.join(d.select("doc_id", "n_chars"), "doc_id")
    canon = labeled.groupBy("cluster_id").agg(
        F.min_by(
            "doc_id", F.struct((-F.col("n_chars")).alias("a"), F.col("doc_id").alias("b"))
        ).alias("canonical_doc_id")
    )
    return labeled.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_doc_id",
        (F.col("doc_id") == F.col("canonical_doc_id")).alias("keep"),
    )


QUALITY_MIN = 0.34  # ≈ corpus median of the 6dp-rounded quality_score


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus funnel, per language: raw →
    quality-gated (quality_score ≥ QUALITY_MIN, compared on the 6dp-rounded
    score both engines agree on bit-exactly) → exact-dedup survivors (min
    doc_id per full-text md5 within the gated set) → near-dup canonical
    survivors (longest doc per connected-component cluster, elected among
    the remaining docs so a filtered-out canonical never empties its
    cluster). Every stage is a semi-join against a keyed winner set — no
    windows over data-sized groups, counts are hash aggregates.

    Note: the synthetic corpus contains near-dups but no byte-identical
    documents, so the exact stage's attrition is 0 there — its semantics are
    still oracle-gated (and exercised with real dupes in tests)."""
    from cnpj_data_pipeline_spark.operators.graph import connected_components

    d = _docs(spark, sf_dir)
    qual = q_doc_quality(spark, sf_dir).select("doc_id", "quality_score")
    s1 = d.join(qual, "doc_id").filter(F.col("quality_score") >= QUALITY_MIN)
    keep_exact = (
        s1.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = s1.join(keep_exact, "doc_id", "left_semi")

    pairs = q_ngram_jaccard_pairs(spark, sf_dir)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        nodes=d.select(F.col("doc_id").alias("node")),
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
    canon = (
        s2.join(cc, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.min_by(
                "doc_id",
                F.struct((-F.col("n_chars")).alias("a"), F.col("doc_id").alias("b")),
            ).alias("doc_id")
        )
        .select("doc_id")
    )
    s3 = s2.join(canon, "doc_id", "left_semi")

    def _per_lang(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("lang").agg(F.count(F.lit(1)).alias(name))

    out = (
        _per_lang(d, "n_raw")
        .join(_per_lang(s1, "n_quality"), "lang", "left")
        .join(_per_lang(s2, "n_exact"), "lang", "left")
        .join(_per_lang(s3, "n_final"), "lang", "left")
    )
    return out.select(
        "lang",
        "n_raw",
        F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
        F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce("n_final", F.lit(0)).cast("long").alias("n_final"),
    )


def _shingle_dict(spark: SparkSession, sf_dir: str):
    """(doc_id, sid) pairs with a deterministic, cross-engine-stable shingle
    id: the leading 60 bits of md5(shingle) reduced mod 2^31-1. Fully
    embarrassingly parallel — the earlier dense-id variant (row_number over a
    globally sorted distinct-shingle dictionary) forced a single-task window
    sort plus a dictionary join, which cannot scale; md5 is bit-identical in
    Spark and DuckDB so the oracle stays exact. The mod keeps sid < 2^31 so
    sid * a + b stays inside int64 for the Carter-Wegman hashes."""
    # the source is a handful of small parquet files -> 1-2 scan partitions;
    # fan the docs out first so the expensive explode+md5 runs on every core
    # (rows-in is tiny, rows-out is ~100x — classic pre-explode repartition)
    from cnpj_data_pipeline_spark.functions import minhash as mh

    d = _docs(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    sh = d.select("doc_id", F.explode(_shingles()).alias("shingle"))
    return sh.withColumn("sid", mh.shingle_id("shingle"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash: sig_h = min over shingles of (a_h * sid + b_h) mod p (Carter-
    Wegman), p = 2^31-1 — pure integer arithmetic on dictionary ids."""
    sh = _shingle_dict(spark, sf_dir)
    aggs = [
        F.min((F.col("sid") * HASH_A[h] + HASH_B[h]) % MERSENNE).alias(f"mh_{h}")
        for h in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: band the 8-hash signature into 4 bands of 2,
    bucket-join on (band, h1, h2), verify candidates with estimated Jaccard
    (signature agreement) >= 0.5. Only same-bucket docs ever meet — the
    100TB-scale path for near-dedup."""
    sig = q_minhash_signatures(spark, sf_dir)
    # one-pass banding with stack() — a 4-way union would re-evaluate the
    # signature aggregation once per band
    stack_args = ", ".join(
        f"{band}, mh_{2 * band}, mh_{2 * band + 1}" for band in range(N_HASHES // 2)
    )
    banded = sig.selectExpr(
        "doc_id", f"stack({N_HASHES // 2}, {stack_args}) AS (band, h1, h2)"
    )
    a, bb = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.mh_{h}") == F.col(f"sb.mh_{h}"), 1).otherwise(0)
        for h in range(N_HASHES)
    )
    verified = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", (agree / F.lit(N_HASHES)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
    )
    return verified.select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint (16-bit) over shingle dictionary ids: bit j of
    h(sid) votes +1/-1; fingerprint bit j = sign of the vote sum."""
    sh = _shingle_dict(spark, sf_dir)
    hashed = sh.withColumn("h", (F.col("sid") * HASH_A[0] + HASH_B[0]) % MERSENNE)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile aggregates: exact continuous quantiles (p50/p90/p99) of
    per-doc token counts, grouped by language — the corpus-statistics shape a
    training-data pipeline reports per shard/language.

    ``F.percentile`` (Spark) and ``quantile_cont`` (DuckDB) share the same
    definition — linear interpolation at index p*(n-1) over the sorted
    values — so the oracle is exact after 6dp rounding. Exact percentile is
    a sort-based aggregate: at 10^10 docs swap in ``approx_percentile``
    (mergeable sketch, one pass, map-side combine) and keep this exact form
    as the small-scale oracle gate."""
    d = _docs(spark, sf_dir)
    per = d.select("lang", F.size(_tokens()).alias("n_tokens"))
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.99)), 6).alias("p99_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


def q_top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: the 3 longest docs (n_chars DESC, doc_id tie-break)
    per language — the PARTITIONED window form of ranking. Contrast
    q_top_customers (global top-k via TakeOrderedAndProject): here the rank
    is per-group, the shuffle key IS the group key, and output is
    k x n_groups — no single-task global sort at any scale (the
    unpartitioned-window trap this engine bans). Languages are FEW and HUGE,
    the worst per-group skew shape, so this routes through the two-phase
    topk_per_group (operators/dedup.py): a local top-k per input partition
    prunes each language to k x partitions rows before the per-lang rank —
    the final window never sees a language's full row set."""
    from cnpj_data_pipeline_spark.operators.dedup import topk_per_group

    d = _docs(spark, sf_dir)
    return topk_per_group(
        d,
        ["lang"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        3,
        rank_col="rnk",
    ).select("lang", "rnk", "doc_id", "n_chars")


SIMHASH_BANDS = 4  # band width = SIMHASH_BITS // SIMHASH_BANDS = 4 bits


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via Hamming-band LSH: band the 16-bit
    fingerprint into 4 equal bands, bucket-join docs sharing (band, bits),
    keep candidates whose true Hamming distance <= 3.

    Unlike MinHash-LSH this banding is EXACT, not probabilistic: by
    pigeonhole, any pair within Hamming distance bands-1 (= 3) leaves at
    least one band untouched, so every qualifying pair is a candidate — the
    banded bucket join returns exactly the brute-force all-pairs answer
    (which is what the quadratic SQL oracle computes) at same-bucket join
    cost. At 10^10 docs only same-(band,bits) docs ever meet; hot buckets
    mean near-identical fingerprints, the pairs a dedup actually wants."""
    sig = q_simhash(spark, sf_dir)
    width = SIMHASH_BITS // SIMHASH_BANDS
    stack_args = ", ".join(
        f"{b}, shiftright(simhash, {b * width}) & {(1 << width) - 1}"
        for b in range(SIMHASH_BANDS)
    )
    banded = sig.selectExpr(
        "doc_id", "simhash", f"stack({SIMHASH_BANDS}, {stack_args}) AS (band, bits)"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        # carry both fingerprints through the join — a 2x16-bit payload is
        # cheaper than re-joining the signature table twice to verify
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= SIMHASH_BANDS - 1)
        .select("doc_a", "doc_b", "hamming")
    )


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12/O4: deterministic sample scan — the reference's first-100-rows
    schema probe (src/processor.py:562-574), as a bounded ordered LIMIT.
    Plan shape: TakeOrderedAndProject (parallel partial top-k; a sample never
    sorts the table globally)."""
    d = _docs(spark, sf_dir)
    return d.orderBy("doc_id").limit(20).select("doc_id", "lang", "source", "n_chars")


EVAL_MOD = 50  # doc_id % EVAL_MOD == 0 -> held-out "benchmark" docs
DECON_K = 4  # n-gram width for contamination matching


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEST-SET DECONTAMINATION — the training-data op every eval pipeline
    needs: flag training documents sharing any word-4-gram with a held-out
    benchmark set (here: the deterministic doc_id %% 50 == 0 slice standing
    in for an eval suite). Emits (doc_id, n_eval_grams_hit) per contaminated
    training doc.

    Plan shape at 100 TB: the EVAL side is tiny by construction (eval suites
    are thousands of docs, the corpus is billions), so its distinct gram set
    broadcasts; the training side explodes distinct 4-grams per doc (O(corpus
    tokens), fully parallel) and the broadcast hash join + per-doc hash agg
    never shuffles the corpus. Matching on n-grams (not full docs) catches
    partial inclusion — the standard contamination definition (GPT-3 appendix
    C uses 13-gram overlap; 4 here because the synthetic vocabulary is tiny,
    so 13-grams never collide and 3-grams always do)."""
    d = _docs(spark, sf_dir)
    grams = F.explode(_shingles(k=DECON_K)).alias("gram")
    ev = (
        d.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(grams)
        .distinct()
    )
    tr = d.filter(F.col("doc_id") % EVAL_MOD != 0).select("doc_id", grams)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").cast("int").alias("n_eval_grams_hit"))
        .orderBy("doc_id")
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPETITION SIGNALS (Gopher-rule family): per document, the duplicate
    word-bigram fraction and the hottest bigram's count — the boilerplate /
    looping-text detectors a pretraining filter runs corpus-wide. A doc is
    flagged repetitive when >10%% of its bigram instances are repeats.

    Plan shape: bigrams explode per doc (O(tokens)), then ONE hash agg keyed
    (doc_id, bigram) with map-side combine, then a per-doc rollup — both
    aggs partial-aggregate, so a pathological doc full of one bigram
    collapses map-side instead of skewing the shuffle."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
    bigrams = F.when(
        n >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    per_big = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_big.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_bigrams"),
            F.count("*").cast("int").alias("n_distinct_bigrams"),
            F.max("cnt").cast("int").alias("top_bigram_n"),
        )
        .withColumn(
            "dup_bigram_frac",
            F.round(
                (F.col("n_bigrams") - F.col("n_distinct_bigrams"))
                / F.col("n_bigrams").cast("double"),
                6,
            ),
        )
        .withColumn("is_repetitive", F.col("dup_bigram_frac") > 0.1)
        .orderBy("doc_id")
    )


PACK_BUDGET = 4096  # tokens per training shard


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING for training shards: documents are packed per
    language in deterministic doc_id order into fixed token-budget shards —
    shard = floor(running-token-count-before / 4096) — and the query emits
    per-shard manifests (doc count, token total, doc_id span). Cumulative-
    quota packing is the distributable packing rule: a doc's shard depends
    only on the prefix sum of token counts before it, not on bin state, so
    it is exact under any partitioning (greedy next-fit, by contrast, is a
    sequential recurrence).

    Plan shape at 100 TB — this is deliberately NOT a naive
    ``Window.partitionBy(lang).orderBy(doc_id)`` cumsum, which moves EVERY
    doc of a language into ONE task (the classic global-window scaling
    trap; Spark even warns). Instead the classic TWO-PASS DISTRIBUTED
    PREFIX SUM: range-partition by (lang, doc_id); pass 1 computes each
    partition's per-lang token subtotal (one tiny row per partition); the
    driver prefix-sums that O(partitions) list; pass 2 rebuilds exact
    global cumsums partition-locally from the broadcast offsets. Both
    passes are Arrow-vectorized; nothing data-sized ever serializes
    through one task."""
    import pandas as pd

    d = _docs(spark, sf_dir)
    per_doc = d.select(
        "lang", "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    n_parts = max(spark.sparkContext.defaultParallelism, 4)
    # persisted: both passes traverse the SAME physical partitioning (pass 2
    # trusts pass 1's per-pid offsets, so the exchange must not be resampled)
    parted = per_doc.repartitionByRange(n_parts, "lang", "doc_id").persist()

    # pass 1: per-partition, per-lang subtotals (tiny)
    def _subtotals(it):
        import pandas as _pd

        from pyspark import TaskContext

        sums: dict[str, int] = {}
        firsts: dict[str, tuple] = {}
        pid = TaskContext.get().partitionId()
        for pdf in it:
            for lang, grp in pdf.groupby("lang"):
                sums[lang] = sums.get(lang, 0) + int(grp["n_tokens"].sum())
                k = (int(grp["doc_id"].min()),)
                if lang not in firsts or k < firsts[lang]:
                    firsts[lang] = k
        yield _pd.DataFrame(
            {
                "pid": [pid] * len(sums),
                "lang": list(sums),
                "subtotal": [sums[l] for l in sums],
                "min_doc": [firsts[l][0] for l in sums],
            }
        )

    subs = parted.mapInPandas(
        _subtotals, "pid int, lang string, subtotal long, min_doc long"
    ).collect()  # O(partitions x langs) rows - metadata, never data
    # driver: offsets[pid][lang] = sum of subtotals of EARLIER partitions
    # (range partitioning orders partitions by (lang, doc_id), but partition
    # ids are already range-ordered; order by (lang, min_doc) per lang)
    by_lang: dict[str, list] = {}
    for r in subs:
        by_lang.setdefault(r["lang"], []).append(r)
    offsets: dict[tuple, int] = {}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r["min_doc"], r["pid"]))
        acc = 0
        for r in rows:
            offsets[(r["pid"], lang)] = acc
            acc += r["subtotal"]
    b_off = spark.sparkContext.broadcast(offsets)

    # pass 2: exact global cumsum partition-locally, then the shard fold
    def _assign(it):
        import pandas as _pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off = b_off.value
        for pdf in it:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["lang", "doc_id"])
            local_before = pdf.groupby("lang")["n_tokens"].cumsum() - pdf[
                "n_tokens"
            ]
            base = pdf["lang"].map(lambda l: off.get((pid, l), 0))
            pdf = pdf.assign(
                shard=((local_before + base) // PACK_BUDGET).astype("int64")
            )
            yield pdf[["lang", "shard", "doc_id", "n_tokens"]]

    assigned = parted.mapInPandas(
        _assign, "lang string, shard long, doc_id long, n_tokens long"
    )
    return (
        assigned.groupBy("lang", "shard")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "shard")
    )


# regex dialect intersection: every construct below parses identically in
# Java regex (Spark) and RE2 (DuckDB) — char classes, bounded repeats, \d,
# ASCII \b. No lookarounds, no backrefs (RE2 has neither).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII DETECTION + SCRUBBING — the redaction pass every training-data
    pipeline runs before text leaves the trust boundary (emails, phone
    numbers, IP addresses -> fixed mask tokens; C4/Dolma-style regex
    scrubbing). The synthetic corpus is clean, so the query first INJECTS
    deterministic PII derived from doc_id — identically in the Spark plan
    and the DuckDB oracle — making the gate check real detection and
    masking, not an all-zeros no-op.

    Plan shape: pure per-row Catalyst string work (`regexp_count` /
    `regexp_replace`, whole-stage codegen, zero Python) over a projected
    two-column scan; the flagged-docs filter keeps the result O(matches).
    At 100 TB this is embarrassingly parallel — no shuffle at all.

    Reference analogue: none (the reference stores PII as-is; its public
    registry data is already redacted upstream by the provider)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    did = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit(".7 logged"),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit(" call 555-867-5309 today")).otherwise(
            F.lit("")
        ),
    )
    enriched = docs.select("doc_id", text.alias("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), F.lit(_PII_EMAIL), F.lit("[EMAIL]")),
            F.lit(_PII_PHONE),
            F.lit("[PHONE]"),
        ),
        F.lit(_PII_IP),
        F.lit("[IP]"),
    )
    return (
        enriched.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(_PII_EMAIL))
            .cast("int")
            .alias("n_emails"),
            F.regexp_count(F.col("text"), F.lit(_PII_PHONE))
            .cast("int")
            .alias("n_phones"),
            F.regexp_count(F.col("text"), F.lit(_PII_IP))
            .cast("int")
            .alias("n_ips"),
            scrubbed.alias("scrubbed"),
        )
        .filter(
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
        )
    )


def q_decontam_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL decontamination (plans/decontam.py) driven end-to-end: the
    training corpus is ingested as a 3-epoch CDC stream into a lake table —
    epoch 1 inserts every training doc, epoch 2 EDITS two deterministic
    slices (doc_id %% 13 == 2 replaced with unique clean text — those docs
    must LEAVE the contamination list; else doc_id %% 7 == 3 gets the first
    eval doc's text appended — those must ENTER it), epoch 3 DELETES the
    doc_id %% 11 == 5 slice — and the DecontamIndexJob tails the change feed
    to maintain the contaminated-docs table. Output = the final list, which
    must equal the ONE-SHOT decontamination of the corpus' final state (the
    oracle computes that state in SQL and re-runs q_decontaminate's gram
    join over it).

    Scale shape: identical to q_decontaminate per epoch — the frozen eval
    gram set broadcasts, only CHANGED docs are ever scored (O(changed docs x
    grams), the corpus is never re-scanned) — plus one O(batch) LWW merge
    into the index table. This is the continuous-obligation form: at 10^10
    docs a nightly from-scratch decontamination is a full corpus scan; this
    pays only for the day's churn."""
    import pyspark.sql.types as T

    from cnpj_data_pipeline_spark.lake.format import LakeTable
    from cnpj_data_pipeline_spark.operators.merge import apply_changes
    from cnpj_data_pipeline_spark.plans.decontam import (
        DecontamIndexJob,
        eval_gram_set,
    )
    from cnpj_data_pipeline_spark.queries.cdc import _mk_scratch

    d = _docs(spark, sf_dir).select(F.col("doc_id").cast("long"), "text")
    ev_docs = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    # two driver-side scalars (the contaminating snippet + the lsn offset)
    ev0_text = ev_docs.orderBy("doc_id").select("text").head()[0]
    off = int(d.agg(F.max("doc_id")).head()[0]) + 1

    root = _mk_scratch("decontam_idx_")
    base = LakeTable.create(
        os.path.join(root, "docs"),
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
        ["doc_id"],
        8,
    )
    tr = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    apply_changes(
        spark,
        base,
        tr.select(
            "doc_id",
            "text",
            F.lit("U").alias("op"),
            F.col("doc_id").alias("lsn"),
        ),
        epoch=1,
    )
    edits = tr.filter(
        (F.col("doc_id") % 13 == 2) | (F.col("doc_id") % 7 == 3)
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 2,
            F.concat(F.lit("clean room zeta "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.concat(F.col("text"), F.lit(" " + ev0_text)))
        .alias("text"),
        F.lit("U").alias("op"),
        (F.col("doc_id") + off).alias("lsn"),
    )
    apply_changes(spark, base, edits, epoch=2)
    dels = tr.filter(F.col("doc_id") % 11 == 5).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit("D").alias("op"),
        (F.col("doc_id") + 2 * off).alias("lsn"),
    )
    apply_changes(spark, base, dels, epoch=3)

    job = DecontamIndexJob(
        base.root,
        os.path.join(root, "idx"),
        eval_gram_set(ev_docs, k=DECON_K),
        k=DECON_K,
        n_buckets=8,
    )
    job.run_once(spark)
    return job.contaminated(spark).orderBy("doc_id")


def q_neardup_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full TWO-HOP index chain (plans/neardup.py -> plans/projection.py)
    driven end-to-end: the corpus is ingested as a 3-epoch CDC stream (epoch
    1 inserts every doc, epoch 2 REPLACES the doc_id %% 13 == 2 slice with
    unique clean text — their band hashes all move, so every old hash key
    must be retracted through BOTH hops — epoch 3 DELETES the doc_id %% 11
    == 5 slice); the NearDupIndexJob maintains the band index from the base
    feed and the ProjectionSyncJob maintains the hash-keyed lookup
    projection from the band index's TYPED feed. Output = the projection's
    final state, which must equal the banding of the corpus' final state
    recomputed from scratch (the oracle derives that state in SQL and
    re-runs the signature + banding CTEs over it).

    Scale shape: hop 1 is O(changed docs x N_BANDS)/epoch, hop 2 is
    O(changed band rows)/epoch with retraction by pre-image — no corpus
    rescan, no read-before-write, at any depth of chaining."""
    import pyspark.sql.types as T

    from cnpj_data_pipeline_spark.lake.format import LakeTable
    from cnpj_data_pipeline_spark.operators.merge import apply_changes
    from cnpj_data_pipeline_spark.plans.neardup import NearDupIndexJob
    from cnpj_data_pipeline_spark.plans.projection import ProjectionSyncJob
    from cnpj_data_pipeline_spark.queries.cdc import _mk_scratch

    d = _docs(spark, sf_dir).select(F.col("doc_id").cast("long"), "text")
    off = int(d.agg(F.max("doc_id")).head()[0]) + 1
    root = _mk_scratch("neardup_proj_")
    base = LakeTable.create(
        os.path.join(root, "docs"),
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
        ["doc_id"],
        8,
    )
    apply_changes(
        spark,
        base,
        d.select(
            "doc_id", "text", F.lit("U").alias("op"), F.col("doc_id").alias("lsn")
        ),
        epoch=1,
    )
    edits = d.filter(F.col("doc_id") % 13 == 2).select(
        "doc_id",
        F.concat(F.lit("clean room zeta "), F.col("doc_id").cast("string")).alias(
            "text"
        ),
        F.lit("U").alias("op"),
        (F.col("doc_id") + off).alias("lsn"),
    )
    apply_changes(spark, base, edits, epoch=2)
    dels = d.filter(F.col("doc_id") % 11 == 5).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit("D").alias("op"),
        (F.col("doc_id") + 2 * off).alias("lsn"),
    )
    apply_changes(spark, base, dels, epoch=3)

    index = NearDupIndexJob(base.root, os.path.join(root, "bands"), n_buckets=8)
    index.run_once(spark)
    proj = ProjectionSyncJob(
        index.index_root,
        os.path.join(root, "by_hash"),
        key_cols=("band", "h1", "h2", "doc_id"),
    )
    proj.run_once(spark)
    return proj.read(spark).select("doc_id", "band", "h1", "h2").orderBy(
        "doc_id", "band"
    )


# --- deterministic corpus-curation ops: sampling / splits / quotas --------
#
# All three key on the same 256-way bucket: the FIRST HEX BYTE of
# md5(doc_id). Lexicographic comparison on the lowercase 2-char hex equals
# numeric comparison (ASCII digits sort below 'a'-'f'), so rate thresholds
# are plain string literals — identical in Spark and DuckDB with no
# hex->int conversion (which the two engines spell differently). A seeded
# hash filter is the scale-correct sampler: embarrassingly parallel, pushed
# to the scan, reproducible across reruns / engines / repartitionings —
# none of which ``df.sample()``'s partition-seeded RNG guarantees.

SAMPLE_THR_EN = "20"  # 0x20 = 32/256  ≈ 12.5 % of English docs
SAMPLE_THR_OTHER = "40"  # 0x40 = 64/256  ≈ 25 % of everything else
SPLIT_TRAIN_HI = "e6"  # 0xe6 = 230/256 ≈ 89.8 % train
SPLIT_VAL_HI = "f3"  # 0xf3 = 243/256 ≈ +5.1 % val; remainder test
QUOTA_PER_SOURCE = 10


def _hash_bucket(col: str = "doc_id"):
    return F.substring(F.md5(F.col(col).cast("string")), 1, 2)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED SAMPLING: per-language keep rates (en 12.5 %,
    other langs 25 %) applied as a pure hash filter over the md5 bucket.
    The standard down-weight-the-dominant-language curation move. Plan
    shape: a single filtered scan — no shuffle, no RNG state, no driver
    coordination; at 100 TB it is exactly as parallel as the scan itself."""
    d = _docs(spark, sf_dir)
    thr = F.when(F.col("lang") == "en", F.lit(SAMPLE_THR_EN)).otherwise(
        F.lit(SAMPLE_THR_OTHER)
    )
    return d.filter(_hash_bucket() < thr).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TRAIN/VAL/TEST SPLIT manifest (~90/5/5 by md5 bucket):
    per (lang, split) document counts and char mass. Hash-assignment means
    a document's split never changes as the corpus grows — appends cannot
    leak docs across splits, unlike fraction-based ``randomSplit``. One
    partial-aggregating hash agg over the scan; |langs|×3 output rows."""
    d = _docs(spark, sf_dir)
    b = _hash_bucket()
    split = (
        F.when(b < F.lit(SPLIT_TRAIN_HI), F.lit("train"))
        .when(b < F.lit(SPLIT_VAL_HI), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE QUOTA CAPPING: keep at most K docs per source — the K
    with the smallest md5(doc_id), i.e. a coordination-free deterministic
    uniform "reservoir" per source (the cap-docs-per-domain move that tames
    boilerplate-heavy domains in web corpora).

    Plan shape at 100 TB — deliberately NOT a bare
    ``Window.partitionBy(source)``: one hot domain would funnel its entire
    row set through ONE task. Two-phase top-K instead: phase 1 ranks within
    (source, input-partition) — the hot source stays spread across all
    scan partitions — and keeps each local top-K, so at most K×partitions
    rows per source survive; phase 2 ranks those survivors globally per
    source. The pre-filter keeps any superset of the true per-source top-K
    regardless of how rows landed in partitions, so the output is exact and
    partitioning-independent (operators/dedup.py:topk_per_group)."""
    from cnpj_data_pipeline_spark.operators.dedup import topk_per_group

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    return topk_per_group(
        d, ["source"], ["h", "doc_id"], QUOTA_PER_SOURCE
    ).select("doc_id", "source", "rn")


QUERIES = {
    "q_stratified_sample": q_stratified_sample,
    "q_train_split": q_train_split,
    "q_source_quota": q_source_quota,
    "q_doc_sample": q_doc_sample,
    "q_decontam_index": q_decontam_index,
    "q_neardup_projection": q_neardup_projection,
    "q_decontaminate": q_decontaminate,
    "q_doc_repetition": q_doc_repetition,
    "q_pack_sequences": q_pack_sequences,
    "q_doc_token_stats": q_doc_token_stats,
    "q_doc_quality": q_doc_quality,
    "q_lang_id": q_lang_id,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_dedup_exact": q_dedup_exact,
    "q_ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "q_ngram_jaccard_pairs_capped": q_ngram_jaccard_pairs_capped,
    "q_neardup_clusters": q_neardup_clusters,
    "q_neardup_canonical": q_neardup_canonical,
    "q_corpus_filter": q_corpus_filter,
    "q_minhash_signatures": q_minhash_signatures,
    "q_minhash_lsh_pairs": q_minhash_lsh_pairs,
    "q_simhash": q_simhash,
    "q_simhash_neardup": q_simhash_neardup,
    "q_token_quantiles": q_token_quantiles,
    "q_top_docs_per_lang": q_top_docs_per_lang,
    "q_pii_scrub": q_pii_scrub,
}

_STOP_EN_SQL = "(" + ",".join(f"'{w}'" for w in STOP_EN) + ")"
_STOP_ES_SQL = "(" + ",".join(f"'{w}'" for w in STOP_ES) + ")"
_STOP_FR_SQL = "(" + ",".join(f"'{w}'" for w in STOP_FR) + ")"

_TOKS = "string_split(text, ' ')"

_SHINGLES_CTE = f"""
shingled AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS}) >= 3 THEN
           list_distinct(list_transform(range(1, len({_TOKS}) - 1),
             i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))
         ELSE [array_to_string({_TOKS}, ' ')] END AS shingles
  FROM documents
),
pairs AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingled),
doc_sids AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(shingle), 1, 15) AS UBIGINT) % 2147483647 AS BIGINT) AS sid
  FROM pairs
)
"""

_MH_COLS = ",\n".join(
    f"min((sid * {HASH_A[h]} + {HASH_B[h]}) % {MERSENNE}) AS mh_{h}"
    for h in range(N_HASHES)
)

_SIG_SQL = f"""
WITH {_SHINGLES_CTE.strip()},
sig AS (SELECT doc_id, {_MH_COLS} FROM doc_sids GROUP BY doc_id)
"""

# shared SQL twins of the simhash pipeline (depends on the shingles CTE)
_SIMHASH_CTES = f"""
        hashed AS (SELECT doc_id, (sid * {HASH_A[0]} + {HASH_B[0]}) % {MERSENNE} AS h FROM doc_sids),
        votes AS (
          SELECT doc_id,
                 {", ".join(f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{j}" for j in range(SIMHASH_BITS))}
          FROM hashed GROUP BY doc_id
        ),
        sims AS (
          SELECT doc_id,
                 CAST({" + ".join(f"CASE WHEN v_{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS))} AS BIGINT) AS simhash
          FROM votes
        )
"""

# Jaccard>=0.35 duplicate-pair edges + recursive-closure component labels —
# shared by the clustering oracles. The closure (O(n·m) rows) is the ORACLE;
# the engine runs O(log n) star-contraction rounds instead.
_CLUSTER_CTES = f"""{_SHINGLES_CTE.strip()},
        sizes AS (SELECT doc_id, count(*) AS sz FROM doc_sids GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM doc_sids a JOIN doc_sids b
            ON a.sid = b.sid AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        dup_pairs AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.35
        ),
        dedges AS (
          SELECT doc_a AS a, doc_b AS b FROM dup_pairs
          UNION SELECT doc_b, doc_a FROM dup_pairs
        ),
        reach AS (
          SELECT a, b FROM dedges
          UNION
          SELECT r.a, e.b FROM reach r JOIN dedges e ON r.b = e.a
        ),
        labels AS (
          SELECT d.doc_id,
                 least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
          FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
          GROUP BY d.doc_id
        )"""

_GRAMS4 = f"""
  CASE WHEN len({_TOKS}) >= 4 THEN
    list_distinct(list_transform(range(1, len({_TOKS}) - 2),
      i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]
             || ' ' || {_TOKS}[i+3]))
  ELSE [array_to_string({_TOKS}, ' ')] END
"""

_DECON_SQL = f"""
WITH ev AS (
  SELECT DISTINCT unnest({_GRAMS4}) AS gram FROM documents WHERE doc_id % 50 = 0
),
tr AS (
  SELECT doc_id, unnest({_GRAMS4}) AS gram FROM documents WHERE doc_id % 50 <> 0
)
SELECT tr.doc_id, CAST(count(DISTINCT tr.gram) AS INTEGER) AS n_eval_grams_hit
FROM tr JOIN ev USING (gram)
GROUP BY tr.doc_id ORDER BY tr.doc_id
"""

_REPETITION_SQL = f"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS}) >= 2 THEN
           list_transform(range(1, len({_TOKS})),
                          i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1])
         ELSE [array_to_string({_TOKS}, ' ')] END AS bigs
  FROM documents
),
e AS (SELECT doc_id, unnest(bigs) AS bigram FROM b),
c AS (SELECT doc_id, bigram, count(*) AS cnt FROM e GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(cnt) AS INTEGER) AS n_bigrams,
       CAST(count(*) AS INTEGER) AS n_distinct_bigrams,
       CAST(max(cnt) AS INTEGER) AS top_bigram_n,
       round((sum(cnt) - count(*)) / CAST(sum(cnt) AS DOUBLE), 6) AS dup_bigram_frac,
       (sum(cnt) - count(*)) / CAST(sum(cnt) AS DOUBLE) > 0.1 AS is_repetitive
FROM c GROUP BY doc_id ORDER BY doc_id
"""

_PACK_SQL = f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM t
)
SELECT lang,
       CAST(floor(cum_before / 4096.0) AS BIGINT) AS shard,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c GROUP BY lang, shard ORDER BY lang, shard
"""

_PII_SQL = f"""
WITH enriched AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.7 logged' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
              THEN ' call 555-867-5309 today' ELSE '' END AS text
  FROM documents
),
flagged AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INTEGER)
           AS n_emails,
         CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INTEGER)
           AS n_phones,
         CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS INTEGER)
           AS n_ips,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g'),
           '{_PII_IP}', '[IP]', 'g') AS scrubbed
  FROM enriched
)
SELECT doc_id, n_emails, n_phones, n_ips, scrubbed
FROM flagged WHERE n_emails + n_phones + n_ips > 0
"""


# q_decontam_index's oracle: derive the corpus' FINAL state in SQL (the same
# deterministic edit/delete slices the query streams through the lake), then
# re-run the one-shot decontamination gram join over it — what the
# incrementally-maintained contaminated-docs table must equal.
_DECON_INDEX_SQL = f"""
WITH ev AS (
  SELECT DISTINCT unnest({_GRAMS4}) AS gram FROM documents WHERE doc_id % 50 = 0
),
ev0 AS (
  SELECT text FROM documents
  WHERE doc_id = (SELECT min(doc_id) FROM documents WHERE doc_id % 50 = 0)
),
fin AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 2 THEN 'clean room zeta ' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 7 = 3 THEN text || ' ' || (SELECT text FROM ev0)
              ELSE text END AS text
  FROM documents
  WHERE doc_id % 50 <> 0 AND doc_id % 11 <> 5
),
tr AS (SELECT doc_id, unnest({_GRAMS4}) AS gram FROM fin)
SELECT tr.doc_id, CAST(count(DISTINCT tr.gram) AS INTEGER) AS n_eval_grams_hit
FROM tr JOIN ev USING (gram)
GROUP BY tr.doc_id ORDER BY tr.doc_id
"""

# q_neardup_projection's oracle: derive the corpus' FINAL state in SQL (the
# same deterministic edit/delete slices the query streams through the lake),
# re-run the signature + banding CTEs over it, emit every (doc, band, h1, h2)
# row — what the two-hop-maintained hash projection must equal.
_NEARDUP_PROJ_SQL = (
    """
WITH fin AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 2
              THEN 'clean room zeta ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 5
),
"""
    + _SIG_SQL.strip().removeprefix("WITH").replace(
        "FROM documents", "FROM fin"
    )
    + f""",
banded AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {band} AS band, mh_{2 * band} AS h1, mh_{2 * band + 1} AS h2 FROM sig"
    for band in range(N_HASHES // 2)
  )}
)
SELECT doc_id, band, h1, h2 FROM banded ORDER BY doc_id, band
"""
)

_BUCKET_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"

ORACLES = {
    "q_stratified_sample": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {_BUCKET_SQL} < CASE WHEN lang = 'en'
            THEN '{SAMPLE_THR_EN}' ELSE '{SAMPLE_THR_OTHER}' END
    """,
    "q_train_split": f"""
        SELECT lang,
               CASE WHEN {_BUCKET_SQL} < '{SPLIT_TRAIN_HI}' THEN 'train'
                    WHEN {_BUCKET_SQL} < '{SPLIT_VAL_HI}' THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1, 2
    """,
    "q_source_quota": f"""
        SELECT doc_id, source, rn FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                     PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        ) WHERE rn <= {QUOTA_PER_SOURCE}
    """,
    "q_pii_scrub": _PII_SQL,
    "q_decontaminate": _DECON_SQL,
    "q_decontam_index": _DECON_INDEX_SQL,
    "q_neardup_projection": _NEARDUP_PROJ_SQL,
    "q_doc_repetition": _REPETITION_SQL,
    "q_pack_sequences": _PACK_SQL,
    "q_doc_sample": """
        SELECT doc_id, lang, source, n_chars
        FROM documents ORDER BY doc_id LIMIT 20
    """,
    "q_doc_token_stats": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '^[a-z]+$'))) AS INTEGER) AS n_word_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_measured,
               length(text) = n_chars AS chars_consistent
        FROM documents
    """,
    "q_doc_quality": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               round((length(text) - (len({_TOKS}) - 1)) / CAST(len({_TOKS}) AS DOUBLE), 6) AS mean_token_len,
               CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) AS INTEGER) AS stopword_hits,
               round(len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE), 6) AS distinct_ratio,
               round(
                 least(len({_TOKS}) / 400.0, 1.0) * 0.4
                 + (len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE)) * 0.4
                 + least(len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) / 8.0, 1.0) * 0.2
               , 6) AS quality_score
        FROM documents
    """,
    "q_lang_id": f"""
        SELECT doc_id, lang,
               CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) AS INTEGER) AS hits_en,
               CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_ES_SQL})) AS INTEGER) AS hits_es,
               CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_FR_SQL})) AS INTEGER) AS hits_fr,
               CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
                    WHEN len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) >= len(list_filter({_TOKS}, t -> t IN {_STOP_ES_SQL}))
                         AND len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) >= len(list_filter({_TOKS}, t -> t IN {_STOP_FR_SQL}))
                         AND len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) > 0 THEN 'en'
                    WHEN len(list_filter({_TOKS}, t -> t IN {_STOP_ES_SQL})) >= len(list_filter({_TOKS}, t -> t IN {_STOP_FR_SQL}))
                         AND len(list_filter({_TOKS}, t -> t IN {_STOP_ES_SQL})) > 0 THEN 'es'
                    WHEN len(list_filter({_TOKS}, t -> t IN {_STOP_FR_SQL})) > 0 THEN 'fr'
                    ELSE 'und' END AS lang_pred
        FROM documents
    """,
    "q_doc_fingerprint": f"""
        SELECT doc_id,
               md5(lower(trim(text))) AS fp_full,
               md5(array_to_string({_TOKS}[1:3], ' ')) AS fp_prefix3
        FROM documents
    """,
    "q_dedup_exact": f"""
        SELECT md5(array_to_string({_TOKS}[1:3], ' ')) AS fp_prefix3,
               min(doc_id) AS keep_doc_id,
               count(*) AS group_size
        FROM documents GROUP BY 1
    """,
    "q_ngram_jaccard_pairs": f"""
        WITH {_SHINGLES_CTE.strip()},
        sizes AS (SELECT doc_id, count(*) AS sz FROM doc_sids GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM doc_sids a JOIN doc_sids b
            ON a.sid = b.sid AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_inter,
               round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.35
    """,
    "q_ngram_jaccard_pairs_capped": f"""
        WITH {_SHINGLES_CTE.strip()},
        hot AS (
          SELECT sid FROM doc_sids GROUP BY sid HAVING count(*) > {DF_CAP}
        ),
        kept AS (
          SELECT d.doc_id, d.sid FROM doc_sids d
          LEFT JOIN hot h ON d.sid = h.sid WHERE h.sid IS NULL
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM doc_sids GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM kept a JOIN kept b
            ON a.sid = b.sid AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_inter,
               round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.35
    """,
    "q_neardup_clusters": f"""
        WITH RECURSIVE {_CLUSTER_CTES}
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM labels
    """,
    "q_neardup_canonical": f"""
        WITH RECURSIVE {_CLUSTER_CTES},
        canon AS (
          SELECT cluster_id, doc_id AS canonical_doc_id FROM (
            SELECT l.cluster_id, l.doc_id,
                   row_number() OVER (
                       PARTITION BY l.cluster_id
                       ORDER BY d.n_chars DESC, l.doc_id
                   ) AS rn
            FROM labels l JOIN documents d ON l.doc_id = d.doc_id
          ) WHERE rn = 1
        )
        SELECT l.doc_id, l.cluster_id, c.canonical_doc_id,
               l.doc_id = c.canonical_doc_id AS keep
        FROM labels l JOIN canon c ON l.cluster_id = c.cluster_id
    """,
    "q_corpus_filter": f"""
        WITH RECURSIVE {_CLUSTER_CTES},
        qual AS (
          SELECT doc_id,
                 round(
                   least(len({_TOKS}) / 400.0, 1.0) * 0.4
                   + (len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE)) * 0.4
                   + least(len(list_filter({_TOKS}, t -> t IN {_STOP_EN_SQL})) / 8.0, 1.0) * 0.2
                 , 6) AS quality_score
          FROM documents
        ),
        s1 AS (
          SELECT d.* FROM documents d JOIN qual q USING (doc_id)
          WHERE q.quality_score >= {QUALITY_MIN}
        ),
        s2 AS (
          SELECT * FROM s1 WHERE doc_id IN (
            SELECT min(doc_id) FROM s1 GROUP BY md5(lower(trim(text)))
          )
        ),
        s3 AS (
          SELECT doc_id FROM (
            SELECT s2.doc_id,
                   row_number() OVER (
                       PARTITION BY l.cluster_id
                       ORDER BY s2.n_chars DESC, s2.doc_id
                   ) AS rn
            FROM s2 JOIN labels l USING (doc_id)
          ) WHERE rn = 1
        )
        SELECT r.lang, r.n_raw,
               coalesce(a.n_quality, 0) AS n_quality,
               coalesce(b.n_exact, 0) AS n_exact,
               coalesce(c.n_final, 0) AS n_final
        FROM (SELECT lang, count(*) AS n_raw FROM documents GROUP BY lang) r
        LEFT JOIN (SELECT lang, count(*) AS n_quality FROM s1 GROUP BY lang) a USING (lang)
        LEFT JOIN (SELECT lang, count(*) AS n_exact FROM s2 GROUP BY lang) b USING (lang)
        LEFT JOIN (
          SELECT lang, count(*) AS n_final FROM s2
          WHERE doc_id IN (SELECT doc_id FROM s3) GROUP BY lang
        ) c USING (lang)
    """,
    "q_minhash_signatures": _SIG_SQL + "SELECT * FROM sig",
    "q_minhash_lsh_pairs": _SIG_SQL + f""",
        banded AS (
          {" UNION ALL ".join(
            f"SELECT doc_id, {band} AS band, mh_{2*band} AS h1, mh_{2*band+1} AS h2 FROM sig"
            for band in range(N_HASHES // 2)
          )}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(({" + ".join(f"CASE WHEN sa.mh_{h} = sb.mh_{h} THEN 1 ELSE 0 END" for h in range(N_HASHES))}) / {N_HASHES}.0, 6) AS est_jaccard
        FROM cand
        JOIN sig sa ON doc_a = sa.doc_id
        JOIN sig sb ON doc_b = sb.doc_id
        WHERE ({" + ".join(f"CASE WHEN sa.mh_{h} = sb.mh_{h} THEN 1 ELSE 0 END" for h in range(N_HASHES))}) / {N_HASHES}.0 >= 0.5
    """,
    "q_simhash": f"""
        WITH {_SHINGLES_CTE.strip()},
        {_SIMHASH_CTES}
        SELECT doc_id, simhash FROM sims
    """,
    "q_token_quantiles": f"""
        SELECT lang,
               count(*) AS n_docs,
               round(quantile_cont(len({_TOKS}), 0.5), 6) AS p50_tokens,
               round(quantile_cont(len({_TOKS}), 0.9), 6) AS p90_tokens,
               round(quantile_cont(len({_TOKS}), 0.99), 6) AS p99_tokens,
               CAST(max(len({_TOKS})) AS INTEGER) AS max_tokens
        FROM documents GROUP BY lang
    """,
    "q_top_docs_per_lang": """
        SELECT lang, CAST(rnk AS INTEGER) AS rnk, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (
                     PARTITION BY lang ORDER BY n_chars DESC, doc_id
                 ) AS rnk
          FROM documents
        ) WHERE rnk <= 3
    """,
    "q_simhash_neardup": f"""
        WITH {_SHINGLES_CTE.strip()},
        {_SIMHASH_CTES}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_BANDS - 1}
    """,
}
