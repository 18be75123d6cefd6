"""Deduplication family for training-data pipelines.

Four tiers, cheapest first — all pure DataFrame programs (no Python UDFs):

- exact            md5 over normalized text; hash groupBy (A12 analogue,
                   distributed as a salted-safe hash agg like uniqueness.py)
- ngram_jaccard    exact word-n-gram Jaccard via shingle self-join — the
                   verification kernel the approximate tiers reuse
- minhash_lsh      MinHash signatures + banded LSH bucket join -> candidate
                   pairs -> exact-Jaccard verification. Hashes are
                   md5-lexicographic (portable across engines, so the DuckDB
                   oracle reproduces signatures bit-for-bit).
- simhash          64-bit SimHash fingerprints from md5 bit sums

Scale notes (the reason LSH exists): the exact shingle self-join explodes on
common shingles — at 10^9 docs the band-bucket join touches only colliding
candidates, and band buckets are bounded by ``max_bucket`` (drop
pathologically hot buckets, standard LSH practice; dropped buckets are
*logged as data* in the output, not silently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

# MinHash configuration — fixed so oracle SQL reproduces it exactly
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc content hash + duplicate-group stats: (doc_id, text_md5,
    dup_count, is_canonical). Canonical = min id in its hash group."""
    h = docs.select(F.col(id_col).alias("doc_id"), T.fingerprint_md5(F.col(text_col)).alias("text_md5"))
    grp = h.groupBy("text_md5").agg(
        F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("canonical_id")
    ).select(F.col("text_md5").alias("__md5"), "dup_count", "canonical_id")
    return (
        # null-safe join: NULL-text docs hash to a NULL md5, which groupBy
        # keeps as a group but a plain equi-join back would drop — the
        # report must cover EVERY doc (null-content dups are still dups)
        h.join(grp, h["text_md5"].eqNullSafe(grp["__md5"]))
        .drop("__md5")
        .select(
            "doc_id",
            "text_md5",
            "dup_count",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        )
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Spread UNDER-SPLIT inputs across all cores before CPU-heavy narrow
    transforms. A small parquet input (one file -> one split) would
    otherwise run the whole shingle/hash pipeline on ONE task — input
    splits, not data volume, bound the parallelism of narrow stages.

    Gated on actual input parallelism: ``repartition(n)`` is always a full
    round-robin shuffle of the raw text (it pins an exchange AQE cannot
    coalesce away), so a 100 TB corpus with thousands of splits must NOT
    pay it — only inputs with fewer splits than cores are spread.
    """
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() >= sc.defaultParallelism:
        return docs
    return docs.repartition(sc.defaultParallelism)


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return _spread(docs).select(
        F.col(id_col).alias("doc_id"), T.shingles_fast(F.col(text_col), n=n).alias("sh")
    ).where(F.size("sh") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact Jaccard over distinct word n-grams for all colliding pairs.

    Plan: explode shingles -> self-join on shingle (co-partitioned by the
    join key; AQE handles hot shingles) -> per-pair intersection counts ->
    union sizes from per-doc counts (broadcast — one row per doc).
    """
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("g"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, h0..h15): Kirsch-Mitzenmacher MinHash — per shingle TWO md5
    digests become numeric h1 (60 bits) and h2 (56 bits), and seed i's hash
    is ``h1 + i*h2`` (no overflow: max < 2^61); the signature is the min per
    seed. 2 hashes per shingle occurrence instead of N_HASHES (measured
    ~2.4x faster end-to-end at sf0.1 vs the per-seed-md5 formulation), same
    collision structure (Kirsch & Mitzenmacher 2006 — pairwise-independent
    combination preserves LSH banding guarantees).

    Engine-portable on purpose: md5 + hex-prefix-to-bigint reproduce
    bit-for-bit in any SQL engine (DuckDB: CAST(concat('0x',...) AS
    BIGINT)), which is what keeps the oracle able to rebuild signatures
    exactly. At production scale swap md5 for xxhash64 — structure unchanged.
    """
    return _signatures_from_shingles(_doc_shingles(docs, id_col, text_col, n))


def _signatures_from_shingles(sh: DataFrame) -> DataFrame:
    ex = sh.select("doc_id", F.explode("sh").alias("g"))
    h1 = F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.concat(F.lit("#"), F.col("g"))), 1, 14), 16, 10).cast("long")
    hashed = ex.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    aggs = [F.min(F.col("h1") + i * F.col("h2")).alias(f"h{i}") for i in range(N_HASHES)]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs via banded LSH + exact-Jaccard verification.

    Bands of 4 rows over 16 hashes -> candidate recall ~ 1-(1-j^4)^4.
    Candidates are verified with exact n-gram Jaccard, so precision is exact;
    LSH only affects recall (vs the O(n^2)-ish exact self-join).
    """
    # ONE shingle computation feeds BOTH the signature path and the exact
    # verification joins (it used to run twice — the single most expensive
    # subtree in the pipeline); localCheckpoint makes it shareable across
    # the otherwise-unshared plan subtrees, self-cleaning on GC.
    sh = _doc_shingles(docs, id_col, text_col, n).localCheckpoint(eager=False)
    sig = _signatures_from_shingles(sh)
    # ONE pass over sig: bands as an exploded struct array. (A per-band
    # union would re-execute the whole signature subtree — explode +
    # 16 md5/shingle — once per band, and again for every consumer below:
    # Catalyst does not share common subplans across union branches or
    # self-join sides.)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                )
            ).alias("bkey"),
        )
        for b in range(N_BANDS)
    ]
    # localCheckpoint (lazy), not persist(): 4 small rows/doc, consumed 4x
    # (bucket count + anti-join + both self-join sides), MEMORY_AND_DISK at
    # 10^9 docs (~50 B/row). Unlike persist(), the blocks are NOT pinned in
    # the cache manager — the ContextCleaner drops them when the returned
    # plan is garbage-collected, so repeated calls in a long session (bench
    # loops, suite reruns) don't accumulate dead cached tables. Trade-off:
    # lineage is truncated, so an executor loss mid-query fails the query
    # instead of recomputing (acceptable: reissue the query).
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bb"))
        .select("doc_id", "bb.band", "bb.bkey")
        .localCheckpoint(eager=False)
    )
    # bound pathological buckets (hot-key skew control): count per bucket,
    # drop buckets above max_bucket
    bucket_sizes = bands.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("bn"))
    bands_ok = bands.join(
        F.broadcast(bucket_sizes.where(F.col("bn") > max_bucket)), ["band", "bkey"], "left_anti"
    )
    a = bands_ok.alias("a")
    b2 = bands_ok.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification on candidates only, over the same checkpointed
    # shingle table (both join sides read it — self-join sides don't share
    # plan subtrees)
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sha, "doc_a")
        .join(shb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def winnow_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs sharing >= ``min_shared`` winnowing fingerprints
    (functions/text.py winnow_fingerprints — the MOSS scheme). Detects
    shared runs of >= k+w-1 words, which MinHash's whole-document Jaccard
    dilutes away on long documents with one plagiarized passage.

    Plan shape mirrors minhash_lsh_pairs: explode fingerprints -> bounded
    bucket self-join on the fingerprint -> per-pair shared counts. A doc of
    L words yields ~L/ w distinct fingerprints in expectation, so the
    exploded table is a constant factor of the corpus; hot fingerprints
    (boilerplate phrases) are dropped at ``max_bucket`` — recall, never
    precision (same skew control as the MinHash path)."""
    fp = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.winnow_fingerprints(F.col(text_col), k, w)).alias("fp"),
    ).localCheckpoint(eager=False)  # consumed 3x: sizes + both join sides
    sizes = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("bn"))
    fp_ok = fp.join(
        F.broadcast(sizes.where(F.col("bn") > max_bucket)), "fp", "left_anti"
    )
    a = fp_ok.alias("a")
    b = fp_ok.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def simhash_bits(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc as a bit string (portable: no int64 sign traps).

    Per token occurrence: md5 -> first 16 hex chars -> 64 bits; per bit,
    sum(+1/-1) over tokens; bit = 1 iff sum > 0. One explode + one groupBy
    with 64 algebraic sums (map-side combined).
    """
    w = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.words(T.normalized_text(F.col(text_col)))).alias("w"),
    ).withColumn("hx", F.substring(F.md5(F.col("w")), 1, 16))
    # hex digit value via strpos on the hex alphabet (portable, no conv())
    digits = [
        (F.instr(F.lit("0123456789abcdef"), F.substring(F.col("hx"), j + 1, 1)) - 1).alias(
            f"d{j}"
        )
        for j in range(16)
    ]
    w = w.select("doc_id", *digits)
    sums = []
    for k in range(64):
        j, shift = divmod(k, 4)
        bit = F.shiftright(F.col(f"d{j}"), 3 - shift).bitwiseAND(F.lit(1))
        sums.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{k}"))
    agg = w.groupBy("doc_id").agg(*sums)
    bitstr = F.concat(*[F.when(F.col(f"s{k}") > 0, "1").otherwise("0") for k in range(64)])
    return agg.select("doc_id", bitstr.alias("simhash64"))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any length-``n`` word
    gram with a held-out benchmark set (the GPT-3 appendix-C / Pile
    protocol — eval contamination is an exact-substring phenomenon, so
    exact gram overlap, not similarity, is the right primitive; production
    uses n=13, small test corpora use smaller n).

    Returns one row per contaminated corpus doc: ``(doc_id, matched_grams
    [distinct shared grams], bench_docs [distinct benchmark docs hit])``.
    Clean docs are absent — at corpus scale the output is the kill-list.

    ``max_df`` drops grams present in more than ``max_df`` benchmark docs
    (boilerplate preambles would otherwise flag everything) — same
    hot-bucket policy as minhash_lsh_pairs, applied on the benchmark side
    where the df count is cheap.

    Scale shape: the benchmark side is small by definition (eval suites,
    not corpora) => its gram table broadcasts; the corpus side is one
    explode feeding a broadcast hash join — the corpus never shuffles.
    groupBy(doc_id) then aggregates matches per doc (two-phase hash agg).
    """
    bench = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(T.shingles(F.col(text_col), n=n)).alias("g"),
    )
    if max_df is not None:
        hot = (
            bench.groupBy("g")
            # distinct grain: per gram over the BENCH side (broadcast-small)
            .agg(F.countDistinct("bench_id").alias("df"))
            .where(F.col("df") > max_df)
            .select("g")
        )
        bench = bench.join(F.broadcast(hot), "g", "left_anti")
    cg = _spread(corpus).select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.shingles(F.col(text_col), n=n)).alias("g"),
    )
    hits = cg.join(F.broadcast(bench), "g")
    return hits.groupBy("doc_id").agg(
        # distinct grain: per corpus doc over matched bench grams/ids —
        # bounded by the broadcast kill-list size, never corpus-cardinality
        F.countDistinct("g").alias("matched_grams"),
        F.countDistinct("bench_id").alias("bench_docs"),
    )


def edit_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 24,
    sim_threshold: float = 0.9,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup candidate pairs VERIFIED by exact edit distance.

    The probabilistic tiers (MinHash q22, SimHash q23, winnowing q58)
    propose candidates; this is the precision pass a curation pipeline runs
    on the survivors before deleting data: pairs whose normalized texts
    share a ``prefix_len``-char prefix are scored with full Levenshtein and
    ``edit_sim = 1 - lev / max(len_a, len_b)``, keeping only pairs at or
    above ``sim_threshold`` (the filter bounds output to the confirmed
    near-dups — without it a 1000-doc hot prefix emits ~500k scored rows).

    Levenshtein is O(len_a * len_b) PER PAIR — the expensive exact kernel —
    so the candidate generator must bound the pair count, never the corpus
    square. Prefix blocking here is the cheapest such generator (one hash
    self-join on a fixed-width key); hot prefixes (boilerplate openings) are
    dropped at ``max_bucket`` like every other blocking tier. In a real
    pipeline the input is the candidate output of q22/q58; the distance runs
    JVM-side (Catalyst ``levenshtein``), no Python.
    """
    nt = (
        _spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            T.normalized_text(F.col(text_col)).alias("nt"),
        )
        .where(F.length("nt") >= prefix_len)
        .withColumn("pfx", F.substring("nt", 1, prefix_len))
        .localCheckpoint(eager=False)  # consumed 3x: sizes + both join sides
    )
    sizes = nt.groupBy("pfx").agg(F.count(F.lit(1)).alias("bn"))
    ok = nt.join(F.broadcast(sizes.where(F.col("bn") > max_bucket)), "pfx", "left_anti")
    a = ok.alias("a")
    b = ok.alias("b")
    # Bounded kernel: levenshtein(l, r, threshold) early-exits the DP once
    # the distance provably exceeds the similarity budget, costing
    # O(threshold * len) instead of O(len^2) per pair — the budget is
    # (1-t)*max_len, so at t=0.9 the filter kernel is ~10x cheaper on the
    # (dominant) rejected pairs. At sf0.1 an interleaved A/B measured no
    # wall delta (the len_band pre-filter already removes the distant
    # pairs there); the bound matters for the adversarial case len_band
    # cannot see — equal-length pairs with dissimilar tails, full O(len^2)
    # unbounded. The threshold is floor(budget)+1, a safe
    # OVER-estimate: 1-t in binary can land just under the true value
    # (1-0.9 = 0.0999...98), and flooring that times mx would early-reject
    # a boundary pair the exact sim filter accepts. Within the threshold
    # the kernel returns the true distance (and -1 beyond it), so the sim
    # filter below applies the SAME arithmetic as the DuckDB oracle and
    # the output is bit-identical to the unbounded kernel.
    sim_lit = float(sim_threshold)
    lev = F.expr(
        "levenshtein(a.nt, b.nt, "
        f"CAST(FLOOR(({1.0 - sim_lit!r}) * GREATEST(length(a.nt), length(b.nt))) AS INT) + 1)"
    )
    mx = F.greatest(F.length("a.nt"), F.length("b.nt")).cast("double")
    # try_divide: two EMPTY normalized texts give mx = 0 and ANSI plain
    # division would abort the pass; NULL sim drops the pair at the sim
    # filter on both engines (DuckDB's 0/0 is NULL too) — empty-empty
    # duplicates are the exact-dup tier's catch (q20), not this kernel's
    sim = F.lit(1.0) - F.try_divide(lev.cast("double"), mx)
    # lev >= |len_a - len_b|, so sim >= t forces the length gap under
    # (1-t)*max_len. Filtering on lengths FIRST (join-condition-pushable,
    # O(1) per pair) skips the O(L^2) levenshtein kernel for the bulk of
    # same-prefix pairs; implied by the sim filter below, so the output —
    # and the DuckDB oracle — are unchanged.
    len_band = (
        F.abs(F.length("a.nt") - F.length("b.nt")).cast("double")
        <= (F.lit(1.0) - F.lit(sim_threshold)) * mx
    )
    return (
        a.join(
            b,
            (F.col("a.pfx") == F.col("b.pfx")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(len_band)
        # lev = -1 means "beyond the threshold" (sim on -1 would wrongly
        # pass); the guard keeps exactly the pairs the oracle keeps
        .where((lev >= F.lit(0)) & (sim >= F.lit(sim_threshold)))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            lev.cast("int").alias("lev"),
            F.round(sim, 6).alias("edit_sim"),
        )
    )
