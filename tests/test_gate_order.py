"""Pin the driver-gate registration order (queries.py policy block).

The correctness driver takes the first 50 registered queries; round 3
proved an insert mid-file can silently evict a gated query.  These tests
make that failure mode loud.
"""

from spider_engine_spark.queries import (
    _DRIVER_GATE_CAP,
    _GATE_OVERFLOW,
    _GATE_ROTATION,
    _GATE_ROUND,
    ORACLES,
    QUERIES,
)

# Queries that do not yet have >=2 consecutive gate-green rounds — they
# must stay inside the cap (and outside every rotation slot) until they
# do.  Round-4 additions (bpe_token_count_by_lang, winnowing_
# fingerprints) earned their second green row in r5; thumbnail_stats
# (first green r4) joined the rotation's EVEN slot, which it first sits
# out in r6 — after its second consecutive green round.
NEVER_YET_GATED = [
    "gopher_repetition_fracs",
    "quality_gate_audit",
    "corpus_sample_strata",
    "benchmark_contamination",
    "pii_scrub_audit",
    "sequence_packing",
    "dedup_clusters",
    "streaming_neardup_pairs",
    "token_rarity_scores",
    "search_bm25",
    # round-6 additions
    "search_bm25_multi",
    "packing_blocks",
    "dedup_exact_substrings",
    "semdedup_corpus",
    "mixture_resample_counts",
    "interleaved_packing",
    "collocations_pmi_topk",
    "c4_clean_audit",
    "paragraph_dedup_docs",
    "hll_distinct_events",
    "cms_term_counts",
    "streaming_cms_term_counts",
]


def test_never_gated_queries_inside_cap():
    order = list(QUERIES)
    for name in NEVER_YET_GATED:
        assert order.index(name) < _DRIVER_GATE_CAP, (
            f"{name} is registered at position {order.index(name)} — "
            f"outside the driver's {_DRIVER_GATE_CAP}-row gate"
        )


def test_overflow_entries_are_registered_and_last():
    order = list(QUERIES)
    for name in _GATE_OVERFLOW:
        assert name in QUERIES
    assert order[-len(_GATE_OVERFLOW):] == [
        n for n in _GATE_OVERFLOW if n in QUERIES
    ]


def test_every_gated_query_has_an_oracle():
    # the gate's value-hash check needs an oracle; anything inside the cap
    # without one silently downgrades to rows-only
    for name in list(QUERIES)[:_DRIVER_GATE_CAP]:
        assert name in ORACLES, f"{name} gated but has no oracle"


def test_rotation_slots_are_disjoint():
    """No query may sit out two consecutive rounds: consecutive rotation
    slots (which alternate by round parity) must share no entries, so
    every demoted query regains a hard-signal driver row next round."""
    for i in range(len(_GATE_ROTATION)):
        a = set(_GATE_ROTATION[i])
        b = set(_GATE_ROTATION[(i + 1) % len(_GATE_ROTATION)])
        assert not (a & b), f"rotation slots {i} and {i+1} overlap: {a & b}"
    assert _GATE_OVERFLOW == _GATE_ROTATION[_GATE_ROUND % len(_GATE_ROTATION)]


def test_demoted_entries_have_a_gated_partner():
    """Every demoted query's redundancy partner must be INSIDE the gate
    this round, so the shared plan family always has a current row."""
    partners = {
        "embedding_topk_pairs": "knn_brute",
        "knn_brute": "embedding_topk_pairs",
        "search_pagination": "search_tfidf",
        "search_tfidf": "search_pagination",
        "streaming_hourly_window": "events_hourly",
        "events_hourly": "streaming_hourly_window",
        "search_filtered": "filters_all_ops",
        "filters_all_ops": "search_filtered",
        "events_running_sum": "events_lead_lag",
        "events_lead_lag": "events_running_sum",
        "tpch_q1": "tpch_q6",
        "tpch_q6": "tpch_q1",
        "frame_sample_stats": "thumbnail_stats",
        "thumbnail_stats": "frame_sample_stats",
        "window_topn_orders": "window_ntile_users",
        "window_ntile_users": "window_topn_orders",
        "tpch_q3_top10": "tpch_q5_regional",
        "tpch_q5_regional": "tpch_q3_top10",
        "dedup_minhash_lsh": "dedup_ngram_jaccard",
        "dedup_ngram_jaccard": "dedup_minhash_lsh",
        "rollup_lang_source": "pivot_event_types",
        "pivot_event_types": "rollup_lang_source",
        "events_sessionize": "events_running_sum",
        "asof_join_latest_order": "range_join_value_buckets",
        "search_multi_term_and": "search_multi_term_or",
        "search_multi_term_or": "search_multi_term_and",
        "tpch_q4_semijoin": "tpch_q14_promo",
        "tpch_q14_promo": "tpch_q4_semijoin",
        "json_props_topk": "regex_priority_codes",
        "regex_priority_codes": "json_props_topk",
        "value_percentiles": "agg_distinct_users",
        "agg_distinct_users": "value_percentiles",
        "text_quality": "doc_fingerprint",
        "doc_fingerprint": "text_quality",
        "lang_id_counts": "token_count_by_source",
        "token_count_by_source": "lang_id_counts",
        "update_latest": "delete_antijoin",
        "delete_antijoin": "update_latest",
        "dedup_simhash": "embedding_near_dups_lsh",
        "embedding_near_dups_lsh": "dedup_simhash",
        "term_doc_freq": "bpe_token_count_by_lang",
        "bpe_token_count_by_lang": "term_doc_freq",
        "filter_sentinel_semantics": "point_lookup",
        "point_lookup": "filter_sentinel_semantics",
        "set_ops_docs": "dedup_exact",
        "dedup_exact": "set_ops_docs",
        "ann_lsh": "ann_ivf",
        "ann_ivf": "ann_lsh",
        "range_join_value_buckets": "asof_join_latest_order",
        "multimodal_decode": "thumbnail_stats",
    }
    order = list(QUERIES)
    for name in _GATE_OVERFLOW:
        partner = partners[name]
        assert order.index(partner) < _DRIVER_GATE_CAP, (
            f"{name} is demoted but partner {partner} is outside the gate"
        )
    # never-yet-2-round-green queries cannot appear in any rotation slot
    for slot in _GATE_ROTATION:
        assert not (set(slot) & set(NEVER_YET_GATED))


def test_registry_size_documented():
    # if this grows past cap + len(overflow), a *new* query fell off the
    # gate — extend _GATE_OVERFLOW deliberately instead
    assert len(QUERIES) <= _DRIVER_GATE_CAP + len(_GATE_OVERFLOW), (
        "registry outgrew the documented overflow — update _GATE_OVERFLOW "
        "per the policy in queries.py"
    )


def test_quality_audit_plan_does_not_reexpand_tokenize(spark):
    """quality_gate_audit must reference quality_filter's derived
    columns only through aggregate expressions: a Filter/Generate above
    the ladder is rewritten through it by PushDownPredicates/generator
    pushdown (no non-cheap duplication guard), re-expanding the
    tokenize subtree ~57x per row (measured 30x slower at sf0.01)."""
    from spider_engine_spark.queries import QUERIES

    df = QUERIES["quality_gate_audit"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_split = plan.count("split(")
    assert n_split <= 4, (
        f"tokenize subtree appears {n_split}x in the audit plan — "
        "a filter/explode re-expanded the quality_filter ladder"
    )
