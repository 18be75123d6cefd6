"""Physical-plan audit: assert the plans we designed for are the plans we got.

For each audited query: capture ``explain(formatted)`` and check the
properties that matter at 100 TB — filter/partition pushdown reached the
scan, projections pruned unused columns, small sides broadcast, window
top-k pushed a group-limit, whole-stage codegen covers the hot path.

Usage: python scripts/audit_plans.py [sf_dir]   (prints PASS/FAIL per rule)
Exit code 1 if any rule fails — wired into tests/test_plan_quality.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _nodes(p: str, op: str) -> int:
    """Count physical-plan NODES named ``op`` (header lines '(N) Op'),
    not raw substring hits (which also match input-reference lines)."""
    import re

    return len(re.findall(r"\(\d+\) " + op + r"\b", p))


def unpartitioned_windows(p: str) -> int:
    """Count Window NODES with an EMPTY partition spec — the Arguments line
    of a partitioned Window prints ``[exprs], [partitionSpec], [orderSpec]``
    (two ``], [`` separators); an unpartitioned one prints ``[exprs],
    [orderSpec]`` (one). An unpartitioned WindowExec funnels the entire
    input through ONE task — banned over non-aggregated inputs (the q50
    scale-killer fixed in round 3; see scoring.ranked_anomalies)."""
    import re

    n = 0
    for m in re.finditer(r"\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: ([^\n]*)", p):
        groups = m.group(1).split("], [")
        if len(groups) >= 3:
            continue  # [exprs], [partitionSpec], [orderSpec]
        # two groups: [exprs], [partitionSpec] (unordered frame agg — fine)
        # or [exprs], [orderSpec] (UNpartitioned ordered window — banned);
        # order specs carry sort directions, partition specs never do
        if len(groups) < 2 or " ASC" in groups[1] or " DESC" in groups[1]:
            n += 1
    return n


# Queries whose plans contain Window nodes (or did before round 3): every
# Window must carry a partition spec. q32 is exempt: its zero-column windows
# run over a <=48-row aggregated histogram (bounded by construction).
WINDOW_PARTITIONED_QUERIES = [
    "q05_window_median_residuals",
    "q20_dedup_exact",
    "q34_active_duration",
    "q47_sessionize",
    "q48_topk_per_group",
    "q50_ranked_anomalies",
    "q63_sliding_window",
    "q64_asof_join",
    "q66_stratified_cap",
    "q69_audio_neardup",
    "q72_sequence_packing",
    "q91_chronology_audit",
    "q100_funnel_conversion",
    "q106_burstiness_audit",
    "q113_distinctive_terms",
    "q114_cohort_retention",
    "q115_transition_drift",
]

RULES = [
    # (query, rule name, predicate over formatted plan text)
    (
        "q01_pricing_summary",
        "shipdate filter pushed to parquet scan",
        lambda p: "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p,
    ),
    (
        "q01_pricing_summary",
        "scan pruned to 7 needed columns",
        lambda p: "l_comment" not in p and "l_partkey" not in p,
    ),
    (
        "q02_topk_revenue_join",
        "customer side broadcast",
        lambda p: "BroadcastHashJoin" in p,
    ),
    (
        "q02_topk_revenue_join",
        "top-10 via TakeOrderedAndProject (no global sort)",
        lambda p: "TakeOrderedAndProject" in p,
    ),
    (
        "q03_group_sigma_flags",
        "bounds joined back broadcast (detail table unshuffled)",
        lambda p: "BroadcastHashJoin" in p and "SortMergeJoin" not in p,
    ),
    (
        "q12_histogram",
        "histogram is pure hash-agg with partial aggregation",
        lambda p: p.count("HashAggregate") >= 2 and "Exchange" in p,
    ),
    (
        "q17_uniqueness_dups",
        "two-phase agg: partial on (salt,key) then final",
        lambda p: p.count("HashAggregate") >= 3,
    ),
    (
        "q81_rate_anomaly",
        "median/MAD join-backs broadcast on the bucket-count aggregate",
        lambda p: "BroadcastHashJoin" in p
        and "SortMergeJoin" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q78_segment_plan",
        "segmentation is shuffle-free codegen (explode, no Exchange/UDF)",
        lambda p: "Generate" in p
        and "Exchange" not in p
        and "ArrowEvalPython" not in p
        and "BatchEvalPython" not in p,
    ),
    (
        "q31_column_stats",
        "one scan, no join, all stats in one agg",
        lambda p: "Join" not in p,
    ),
    (
        "q39_format_columns",
        "projection pruned scan to 4 mapped columns",
        lambda p: "ReadSchema" in p and "props" not in p and "ts" not in p.split("ReadSchema")[1][:400],
    ),
    (
        "q48_topk_per_group",
        "rank filter pushes WindowGroupLimit below the shuffle",
        lambda p: "WindowGroupLimit" in p,
    ),
    (
        "q57_ivf_ann",
        "probe side broadcast: base never shuffles before top-k",
        lambda p: "BroadcastHashJoin" in p and "SortMergeJoin" not in p,
    ),
    (
        "q57_ivf_ann",
        "no cartesian fallback in list-bucketed candidate join",
        lambda p: "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
    ),
    (
        "q58_winnow_fingerprints",
        "winnowing is one scan, no join, no shuffle before output",
        lambda p: "Join" not in p and "Exchange" not in p,
    ),
    (
        "q59_winnow_neardup",
        "hot-fingerprint bound is a broadcast anti-join",
        lambda p: "BroadcastHashJoin" in p and "LeftAnti" in p,
    ),
    (
        "q63_sliding_window",
        "all frames fuse into one Window over one shuffle + one sort",
        lambda p: _nodes(p, "Exchange") == 1
        and _nodes(p, "Sort") == 1
        and _nodes(p, "Window") == 1,
    ),
    (
        "q64_asof_join",
        "as-of is union + window — no join operator at all",
        lambda p: "Join" not in p and "Union" in p and "Window" in p,
    ),
    (
        "q65_interval_join",
        "interval join is a real equi-join, not a nested-loop fallback",
        lambda p: ("SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p)
        and "BroadcastNestedLoopJoin" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q66_stratified_cap",
        "per-source cap pushes WindowGroupLimit below the shuffle",
        lambda p: "WindowGroupLimit" in p,
    ),
    (
        "q69_audio_neardup",
        "fingerprint match is a hash-equi self-join with a broadcast hot-hash bound",
        lambda p: ("SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p)
        and "BroadcastNestedLoopJoin" not in p
        and "CartesianProduct" not in p
        and "LeftAnti" in p,
    ),
    (
        "q70_pii_stats",
        "PII scan is pure codegen expressions + two-phase hash agg (no UDF, no join)",
        lambda p: "Join" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and p.count("HashAggregate") >= 2,
    ),
    (
        "q71_decontamination",
        "benchmark gram table broadcasts; corpus text never shuffles",
        lambda p: "BroadcastHashJoin" in p and "SortMergeJoin" not in p,
    ),
    (
        "q72_sequence_packing",
        "packing is one shuffle + one sort + one window per stream",
        lambda p: _nodes(p, "Exchange") == 1
        and _nodes(p, "Sort") == 1
        and _nodes(p, "Window") == 1,
    ),
    (
        "q73_neardup_clusters",
        "cluster join-back is hash-equi (no nested-loop / cartesian fallback)",
        lambda p: "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
    ),
    (
        "q74_split_assignment",
        "split hash is per-row codegen: no join, no UDF, two-phase agg",
        lambda p: "Join" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and p.count("HashAggregate") >= 2,
    ),
    (
        "q75_mixing_weights",
        "totals via broadcast 1-row join; no unpartitioned window, no cartesian",
        lambda p: "Window" not in p and "CartesianProduct" not in p,
    ),
    (
        "q76_lm_quality_score",
        "LM scoring is hash-equi joins + hash aggs, no per-row Python, no cartesian",
        lambda p: "CartesianProduct" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and p.count("HashAggregate") >= 2,
    ),
    (
        "q83_embedding_qa",
        "profile join-backs broadcast 1-row aggs (no shuffle join, no window)",
        lambda p: "SortMergeJoin" not in p
        and "CartesianProduct" not in p
        and _nodes(p, "Window") == 0,
    ),
    (
        "q84_windowed_drift",
        "windowed drift is pure hash-agg; ref profile is a literal (no join at all)",
        lambda p: p.count("HashAggregate") >= 2
        and "Join" not in p
        and _nodes(p, "Window") == 0,
    ),
    (
        "q85_filter_verdicts",
        "rule stack: hash aggs + entity-grained hash join, no window/cartesian/UDF",
        lambda p: p.count("HashAggregate") >= 4
        and _nodes(p, "Window") == 0
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p,
    ),
    (
        "q87_categorical_drift",
        "chi2 grid built from aggregate-grain sides: detail scanned once via "
        "checkpointed counts (no parquet rescan), BNLJ only between aggregates, "
        "no window/cartesian/UDF",
        lambda p: _nodes(p, "Scan parquet") == 0
        and _nodes(p, "BroadcastNestedLoopJoin") <= 2
        and "CartesianProduct" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q88_benford_audit",
        "benford grid built from aggregate-grain sides: detail scanned once via "
        "checkpointed (group, digit) counts, no window/cartesian/UDF",
        lambda p: _nodes(p, "Scan parquet") == 0
        and "CartesianProduct" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q89_wasserstein_drift",
        "W1 cumsums run on aggregate-grain grid: detail scanned once via "
        "checkpointed (day, bin) counts, windows all partitioned, no cartesian/UDF",
        lambda p: _nodes(p, "Scan parquet") == 0
        and unpartitioned_windows(p) == 0
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p,
    ),
    (
        "q90_hot_key_audit",
        "hot-key audit runs on checkpointed per-key counts: no detail rescan, "
        "stats row broadcast, no window/cartesian/UDF",
        lambda p: _nodes(p, "Scan parquet") == 0
        and _nodes(p, "BroadcastNestedLoopJoin") <= 1
        and "CartesianProduct" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q92_sequence_gaps",
        "id-range completeness is one two-phase hash agg pass: no window, "
        "no join, scan pruned to the id column",
        lambda p: _nodes(p, "Window") == 0
        and "Join" not in p
        and "ReadSchema: struct<event_id:bigint>" in p,
    ),
    (
        "q93_association_audit",
        "cramers-v runs on checkpointed contingency cells: no detail rescan, "
        "only observed cells (no dense-grid fill), broadcast-only joins, no window",
        lambda p: _nodes(p, "Scan parquet") == 0
        and _nodes(p, "BroadcastNestedLoopJoin") <= 1
        and "CartesianProduct" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q94_edit_verified_pairs",
        "levenshtein verification: bounded prefix-block self-join (no cartesian), "
        "JVM-side distance (no Python), no window",
        lambda p: "CartesianProduct" not in p
        and "BatchEvalPython" not in p
        and _nodes(p, "Window") == 0
        and "levenshtein" in p,
    ),
    (
        "q95_loudness_audit",
        "loudness audit fuses with audio_features into ONE mapInPandas pass "
        "(dBFS/gain/verdict are Catalyst projections), no row-wise Python",
        lambda p: _nodes(p, "MapInPandas") == 1 and "BatchEvalPython" not in p,
    ),
    (
        "q96_label_noise_audit",
        "label-noise scoring: centroids broadcast onto vectors (one BNLJ), "
        "distance is a JVM fold (no Python), no window",
        lambda p: _nodes(p, "BroadcastNestedLoopJoin") <= 1
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p
        and _nodes(p, "Window") == 0,
    ),
    (
        "q97_fk_health_matrix",
        "fk matrix: key-grain anti-joins (child pre-aggregated to distinct "
        "FK values), no cartesian/window/Python",
        lambda p: "LeftAnti" in p
        and "CartesianProduct" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q98_profile_diff",
        "profile diff: two single-pass profile scans with the date predicate "
        "pushed down, column-grain broadcast join, no window/Python",
        lambda p: _nodes(p, "Scan parquet") == 2
        and "PushedFilters: [IsNotNull(o_orderdate)" in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q99_zipf_audit",
        "zipf head is TakeOrderedAndProject-bounded (no full-vocab sort); the "
        "only window runs over the <=200-row head (bounded exemption, like q32)",
        lambda p: _nodes(p, "TakeOrderedAndProject") >= 1
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p,
    ),
    (
        "q101_mixture_materialize",
        "mixture fan-out: per-source epochs broadcast back (no window), "
        "guarded explode(sequence) copy expansion, no cartesian/Python",
        lambda p: _nodes(p, "Window") == 0
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p
        and _nodes(p, "Generate") >= 1,
    ),
    (
        "q102_transcode_qa",
        "transcode QA is ONE mapInPandas pass (concat decode + samplewise "
        "re-encode + reduceat SNR), no row-wise Python",
        lambda p: _nodes(p, "MapInPandas") == 1 and "BatchEvalPython" not in p,
    ),
    (
        "q103_novel_categories",
        "dictionary diff: both sides pre-aggregated to category grain before "
        "the full-outer join; date predicates pushed to the scans; no window",
        lambda p: _nodes(p, "Window") == 0
        and "PushedFilters: [IsNotNull(ts)" in p
        and "FullOuter" in p
        and "BatchEvalPython" not in p,
    ),
    (
        "q104_bandwidth_audit",
        "bandwidth audit composes over ONE audio_features decode pass "
        "(Catalyst join+projection on top), no row-wise Python",
        lambda p: _nodes(p, "MapInPandas") == 1 and "BatchEvalPython" not in p,
    ),
    (
        "q107_entropy_audit",
        "entropy via the shuffle-free identity: two hash-agg phases, no join, "
        "no window, no Python",
        lambda p: _nodes(p, "Window") == 0
        and "Join" not in p
        and "BatchEvalPython" not in p
        and p.count("HashAggregate") >= 4,
    ),
    (
        "q108_regression_conformance",
        "regression fit is ONE 1-row aggregate broadcast back (BNLJ); detail "
        "scans pruned; no window",
        lambda p: _nodes(p, "BroadcastNestedLoopJoin") == 1
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p
        and "l_orderkey" in p,
    ),
    (
        "q111_vocab_divergence",
        "JSD head is TakeOrdered-bounded; both sides counted in ONE pass "
        "(conditional sums, no self-join); no window/Python",
        lambda p: _nodes(p, "TakeOrderedAndProject") >= 1
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q113_distinctive_terms",
        "log-odds ranking pushes a per-source WindowGroupLimit; counts "
        "checkpointed (one token-explode pass); no cartesian/Python",
        lambda p: "WindowGroupLimit" in p
        and "CartesianProduct" not in p
        and "BatchEvalPython" not in p,
    ),
    (
        "q117_byte_length_audit",
        "byte-length triage is pure codegen (no decode, no Python, no join "
        "beyond none): zero MapInPandas, zero exchange before the agg is fine",
        lambda p: _nodes(p, "MapInPandas") == 0
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and "Join" not in p,
    ),
    (
        "q120_slope_heterogeneity",
        "per-group slopes from ONE grouped-sums pass; slope-population stats "
        "broadcast back; no window/Python",
        lambda p: _nodes(p, "Window") == 0
        and _nodes(p, "BroadcastNestedLoopJoin") <= 1
        and "BatchEvalPython" not in p,
    ),
    (
        "q121_type_inference_audit",
        "type inference is pure codegen conditional counts: no join, no "
        "window, no Python",
        lambda p: "Join" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q122_k_anonymity",
        "k-anonymity is two hash-agg phases to combo grain then one row: no "
        "join, no window, no Python",
        lambda p: "Join" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q123_correlation_matrix",
        "all six corr() aggregates fuse into ONE scan; the 1-row result is "
        "checkpointed so the six union branches never rescan; no window",
        lambda p: _nodes(p, "Scan parquet") == 0
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p,
    ),
    (
        "q68_repetition_signals",
        "repetition metrics are pure two-phase hash aggs (no window, no nested loop)",
        lambda p: p.count("HashAggregate") >= 4
        and "Window" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q127_quarantine",
        "quarantine join-back is a key equi-join of the key-grain violation "
        "summary onto the detail table: no cartesian/BNLJ (the summary side "
        "aggregates BEFORE the join, so the shuffle never carries payloads), "
        "no window, no row-wise Python",
        lambda p: "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p
        and ("SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p),
    ),
    (
        "q129_reconciliation",
        "ledger reconciliation pre-aggregates the child side to key grain "
        "with a map-side partial_sum BEFORE the key equi-join (the join "
        "never carries detail rows); no cartesian/BNLJ, no window, no "
        "row-wise Python",
        lambda p: "partial_sum" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p
        and ("SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p),
    ),
    (
        "q130_json_key_profile",
        "JSON key-set profile parses in the JVM (JacksonParser via from_json "
        "— no Python UDF; the parse subtree sits behind the lazy "
        "localCheckpoint boundary) and aggregates at key-set grain; share "
        "joins back broadcast (no window, no cartesian of detail rows)",
        lambda p: p.count("HashAggregate") >= 2
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q128_null_patterns",
        "missingness-pattern profile is one codegen projection + a two-phase "
        "hash agg at pattern grain; share joins back broadcast (no window, "
        "no python, no cartesian of detail rows)",
        lambda p: p.count("HashAggregate") >= 2
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q139_constraint_suggestion",
        "constraint-suggestion profile is ONE aggregate over ONE scan of the "
        "table (multi-column exact distinct plans through Expand — the "
        "documented exact-tier cost; exact=False removes it); the per-column "
        "reshape is a stack projection, never a second scan, a join, a "
        "window, or Python",
        lambda p: _nodes(p, "Scan parquet") == 1
        and "Expand" in p
        and "Join" not in p
        and _nodes(p, "Window") == 0
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q140_metric_regression",
        "metric-history screen: the latest-run marker is a broadcast 1-row "
        "agg (BNLJ of one row, the q08/q75 totals pattern — NOT a data-scale "
        "cartesian); both median passes and the join back are hash/sort "
        "equi-joins at metric grain; no Python, no unpartitioned window",
        lambda p: "CartesianProduct" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and _nodes(p, "Window") == 0
        and ("SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p),
    ),
    (
        "q142_image_decode_qa",
        "image decode QA: exactly two Arrow-batched mapInPandas passes "
        "(pixel features + header metadata), the metadata side joined by "
        "BROADCAST (tiny per-image rows vs the decode side), no "
        "row-at-a-time Python, no cartesian",
        lambda p: _nodes(p, "MapInPandas") == 2
        and "BroadcastHashJoin" in p
        and "BatchEvalPython" not in p
        and "CartesianProduct" not in p,
    ),
    (
        "q143_video_container_audit",
        "video container audit: ONE Arrow-batched mapInPandas parse pass "
        "feeding a partial (map-side combine) hash aggregate at brand "
        "grain; no row-at-a-time Python, no join, no cartesian",
        lambda p: _nodes(p, "MapInPandas") == 1
        and "HashAggregate" in p
        and "BatchEvalPython" not in p
        and "Join" not in p
        and "CartesianProduct" not in p,
    ),
] + [
    (
        qname,
        "no unpartitioned WindowExec (single-task global sort+rank)",
        lambda p: unpartitioned_windows(p) == 0,
    )
    for qname in WINDOW_PARTITIONED_QUERIES
]


def bucketed_payload_plans(spark) -> dict[str, str]:
    """Build the payload ref-comparison join over (a) clip_id-bucketed
    session-catalog tables and (b) the same data as plain parquet roots,
    with broadcast disabled (at 10^12 clips neither side broadcasts), and
    return both formatted plans. The EXTRA_RULES below lock the engine's
    biggest-shuffle elision: bucketed layout => sort-merge join with ZERO
    Exchange on either side; the parquet control keeps the rule honest
    (same join, >=2 Exchanges without the bucket spec)."""
    import shutil
    import tempfile

    from audit_anomaly_detection_etl_spark.operators import payload
    from audit_anomaly_detection_etl_spark.sources import synth, tableio

    tmp = tempfile.mkdtemp(prefix="plan_bucketed_")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        t = synth.generate_clips(n_clips=200, n_parts=4, seed=7)
        synth.write_clip_tables(t, tmp)
        clips = spark.read.parquet(t.paths["clips"])
        ref = spark.read.parquet(t.paths["clips_ref"])
        tableio.write_bucketed(
            spark, clips, "plan_audit_clips_b", f"{tmp}/clips_b", 8
        )
        tableio.write_bucketed(
            spark, ref, "plan_audit_ref_b", f"{tmp}/ref_b", 8
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cb = tableio.read_table(spark, "plan_audit_clips_b")
        rb = tableio.read_table(spark, "plan_audit_ref_b")
        bucketed = plan_of(payload.payload_report(cb, rb))
        parquet = plan_of(payload.payload_report(clips, ref))

        # the WHOLE per-wave violations plan (schema + salted uniqueness +
        # referential anti-joins + payload + byte_length + encoding composed
        # over one scan): HashPartitioning(clip_id) from the bucketed scans
        # satisfies the clustering requirement of every agg and join in it
        from audit_anomaly_detection_etl_spark.plans.runner import (
            wave_violations,
        )
        from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec

        spec = SuiteSpec()
        wave_b = plan_of(wave_violations(cb, rb, spec, spec.checks))
        wave_p = plan_of(wave_violations(clips, ref, spec, spec.checks))
        return {
            "bucketed": bucketed,
            "parquet": parquet,
            "wave_bucketed": wave_b,
            "wave_parquet": wave_p,
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS plan_audit_clips_b")
        spark.sql("DROP TABLE IF EXISTS plan_audit_ref_b")
        shutil.rmtree(tmp, ignore_errors=True)


# rules over bucketed_payload_plans output (keyed plans, not queries())
EXTRA_RULES = [
    (
        "bucketed",
        "payload ref-join over bucketed tables: sort-merge with ZERO "
        "Exchange on either side (the 100 TB shuffle elided by layout)",
        lambda p: _nodes(p, "Exchange") == 0 and _nodes(p, "SortMergeJoin") == 1,
    ),
    (
        "parquet",
        "control: identical join over plain parquet shuffles both sides "
        "(proves the bucketed rule is non-vacuous)",
        lambda p: _nodes(p, "Exchange") >= 2 and _nodes(p, "SortMergeJoin") == 1,
    ),
    (
        "wave_bucketed",
        "ENTIRE default per-wave violations plan over bucketed tables "
        "(schema+uniqueness+referential+payload+byte_length+encoding): ZERO "
        "shuffle Exchanges — only the broadcast of the tiny dup-key set",
        lambda p: _nodes(p, "Exchange") == 0
        and _nodes(p, "BroadcastExchange") >= 1,
    ),
    (
        "wave_parquet",
        "control: the same wave plan over plain parquet shuffles many times "
        "(proves the wave_bucketed rule is non-vacuous)",
        lambda p: _nodes(p, "Exchange") >= 6,
    ),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry_mod
    from audit_anomaly_detection_etl_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[2]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    failures = 0
    plans: dict[str, str] = {}
    for qname, rule, pred in RULES:
        if qname not in plans:
            plans[qname] = plan_of(qs[qname](spark, sf_dir))
        ok = False
        try:
            ok = bool(pred(plans[qname]))
        except Exception:
            ok = False
        print(f"{'PASS' if ok else 'FAIL'}  {qname}: {rule}")
        if not ok:
            failures += 1
    extra_plans = bucketed_payload_plans(spark)
    for key, rule, pred in EXTRA_RULES:
        ok = False
        try:
            ok = bool(pred(extra_plans[key]))
        except Exception:
            ok = False
        print(f"{'PASS' if ok else 'FAIL'}  payload_bucketed[{key}]: {rule}")
        if not ok:
            failures += 1
    if failures:
        print(f"\n{failures} plan rule(s) failed", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
