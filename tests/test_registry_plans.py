"""Registry-wide scale-killer sweep: EVERY driver query's physical plan
is checked for the three patterns that do not survive a 100× scale-up —
row-at-a-time Python UDFs (BatchEvalPython), unbounded cartesian
pairings, and nested-loop joins that are not deliberate broadcast-bounded
designs. test_plans.py pins per-query positive properties; this sweep
guarantees the NEGATIVE property across the whole 50-entry surface, so a
new or edited query cannot quietly regress into a quadratic plan."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

# nested-loop joins that are the documented design, every BNLJ input a
# broadcast side bounded by the operator's own budget:
# - ann_recall_eval: brute-force truth side vs the broadcast hash-sampled
#   probe frame (|sample| x corpus IS the eval budget), plus the trivial
#   1-row x 1-row combine of the two count aggregates
# - text_langid_eval: the trained weight grid is vocab x language-list x
#   1-row language-count — two cross products of model-sized frames,
#   both build sides broadcast
# - host_link_centrality: per-round dangling-mass fold-back is a
#   crossJoin against a broadcast 1-row aggregate (plus the demo's
#   broadcast 1-row max-doc_id frame) — both build sides single-row
# - text_lm_perplexity: the unk-floor row (ord=0) and the trainer's
#   total-token frame are broadcast 1-row crossJoins (model constants)
# - host_anchor_texts: the DEMO derives pseudo-links via the same
#   broadcast 1-row max-doc_id frame as host_link_centrality; the
#   production path (extract_links -> rollup) has no cross join
BNLJ_OK = {"ann_recall_eval", "text_langid_eval", "host_link_centrality",
           "text_lm_perplexity", "host_anchor_texts",
           # text_dsir_select: the smoothing-totals frame is a broadcast
           # 1-row aggregate crossJoined onto the <=DSIR_DIM-row model
           "text_dsir_select"}

def _extra_queries():
    """Oracled operators living outside the 50-row driver window (the
    hostile gate carries their value parity; this sweep carries their
    plan discipline)."""
    from ocr_module_spark.functions import (badwords, datacard, dedup,
                                            embed, exactsubstr,
                                            hostrep, langid, linededup,
                                            linkgraph, mixture,
                                            model_score, multimodal,
                                            ngramlm, packing,
                                            snapshots, splits, textnorm,
                                            textstats, urls)
    from ocr_module_spark.operators import relational
    from ocr_module_spark.operators.extraction import (
        q_region_pixel_features)
    return {
        "text_langid_eval": langid.q_langid_eval,
        "host_reputation": hostrep.q_host_reputation,
        "host_link_centrality": linkgraph.q_link_centrality,
        "host_anchor_texts": linkgraph.q_host_anchors,
        "snapshot_diff": snapshots.q_snapshot_diff,
        # curate_pack_sequences / fn_url_canonicalize moved INTO the
        # driver window in round 4; proj_bbox / token_split left it
        "proj_bbox_reduction_units": relational.q_bbox_reduction_units,
        "fn_token_split_count": relational.q_token_split_count,
        # round-5 rotation: these five left the driver window (slots
        # taken by the r4 flagships); the sweep keeps their plan gate
        "agg_content_length": relational.q_content_length,
        "json_pointer_extract": relational.q_json_pointer_extract,
        "join_positional_zip": relational.q_positional_zip_join,
        "mm_frame_sample": multimodal.q_mm_frame_sample,
        "text_rolling_fingerprint": textstats.q_rolling_fingerprint,
        "curate_pack_salted": packing.q_pack_sequences_salted,
        "curate_pack_materialize": packing.q_pack_materialize,
        "curate_shards": packing.q_curate_shards,
        "curate_shards_salted": packing.q_curate_shards_salted,
        "fn_url_latest_revision": urls.q_url_latest_revision,
        "text_model_score": model_score.q_model_score,
        "text_model_auc": model_score.q_model_auc,
        "text_model_auc_holdout": model_score.q_model_auc_holdout,
        "region_pixel_features": q_region_pixel_features,
        "curate_split": splits.q_split_rollup,
        "curate_split_leakage": splits.q_split_leakage_audit,
        "curate_split_repair": splits.q_split_repair,
        "curate_mixture_epochs": mixture.q_mixture_epochs,
        "text_boilerplate_lines": linededup.q_boilerplate_lines,
        "text_line_quality": linededup.q_line_quality,
        "text_normalize": textnorm.q_text_normalize,
        "text_lm_perplexity": ngramlm.q_lm_perplexity,
        "text_embed_hash": embed.q_text_embed_hash,
        "dedup_jaccard_pairs": dedup.q_dedup_jaccard_pairs,
        "dedup_exactsubstr": exactsubstr.q_dedup_exactsubstr,
        "text_datacard": datacard.q_text_datacard,
        "text_datacard_exemplars": datacard.q_text_datacard_exemplars,
        "text_badwords": badwords.q_text_badwords,
    }


_QUERIES = sorted({**entry_mod.queries(), **_extra_queries()}.items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_no_scale_killers_in_plan(spark, sf_dir, name, fn):
    plan = (fn(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, \
            f"{name}: unexpected nested-loop join"
