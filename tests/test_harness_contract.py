"""Driver-contract invariants: queries()/oracle_sql() registries stay
consistent without running any pipeline (cheap structural guards)."""

import importlib.util
import os
import sys


def _entry():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_entry_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_registry_consistency():
    mod = _entry()
    q = mod.queries()
    o = mod.oracle_sql()
    # every oracle belongs to a registered query
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # every registry entry is hard-oracled: the BPE pair flipped in
    # round 4 (generated merge-round CTE chain) and crawl_order in
    # round 5 (unrolled per-round crawl CTE chain) — no rows-only
    # entries remain
    assert sorted(set(q) - set(o)) == []
    # every query is callable, every oracle a non-empty SQL string
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in o.values())
    # no duplicate registrations lost to dict collisions: the module
    # defines one _<name> function per query key it registers
    assert len(q) == len(set(q))


def test_first_fifty_is_the_round5_stamp_window():
    """The driver stamps only the first 50 registry entries per round
    (observed cap). Round-5 rotation (VERDICT r4 item 4): the window
    holds exactly ROUND5_FIRST50 — 50 entries never stamped by any
    prior round's driver run — and none of them appears in
    CORRECTNESS_r01..r04, so the round-5 run extends cumulative
    driver-stamped coverage instead of re-stamping green entries."""
    import json

    mod = _entry()
    first50 = list(mod.queries())[:50]
    assert first50 == mod.ROUND5_FIRST50
    assert len(set(first50)) == 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamped = set()
    for r in (1, 2, 3, 4):
        p = os.path.join(root, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(p):
            with open(p) as f:
                stamped |= set(json.load(f))
    overlap = set(first50) & stamped
    assert not overlap, f"already-stamped entries in the window: {overlap}"


def test_prior_covering_set_still_registered():
    """The round-4 family covering set rotated to the tail, not out of
    the registry: every representative still has a queries() entry."""
    mod = _entry()
    registered = set(mod.queries())
    required = {
        # warc / pages / crawl artifacts (cdxj_append_lookup composes
        # build+append+lookup; the plain cdxj_lookup moved to the tail)
        "warc_rec_types", "host_counts", "crawl_order",
        "wet_export", "revisit_dedup", "anchor_stats",
        # crawl-source / url-curation / index-maintenance (new r4)
        "redirect_resolve",
        "cdxj_append_lookup", "tfidf_keywords", "url_canon_dedup",
        # similarity search (ivfpq composes pq+ivf; the standalone
        # layout/pq entries moved to the tail in r4 s3)
        "knn_top10", "ivfpq_top10",
        # chunking + layout-compaction families (r4 s5: cdc_shared
        # replaces chunk_windows as the chunking rep — it exercises
        # boundary machinery AND the cross-doc dedup aggregate;
        # fingerprint_dups / simhash_pairs demoted to the tail —
        # dedup keeps jaccard/embedding/lsh-append/line reps)
        "cdc_shared", "postings_compact_probe",
        # denoising-pair family (r4 s4; embedding_neardup demoted —
        # embedding similarity keeps knn/ivfpq/semdedup reps)
        "span_corrupt",
        # LM / quality / curation (trigram interp composes the
        # unigram/bigram ladder, which moved to the tail in r4 s3)
        "trigram_nll", "bm25_top20",
        "decontam_overlap", "dsir_weights", "span_scrub", "pii_redact",
        "gopher_quality", "nb_langid", "weighted_sample",
        "pmi_collocations",
        # graph / dedup new families (r4 s3)
        "wcc_labels", "containment_pairs",
        # dedup / export / selection
        "budget_subset", "jaccard_clusters",
        "lsh_append_pairs",
        # substring-level exact-span dedup (r4 s5) replaces
        # line_dedup (the newline-aligned special case) as the rep
        "substring_spans",
        "pretrain_corpus", "export_bpe_packed", "export_shards",
        "frontier_candidates",
        # multimodal (media_features -> tail in the r4 s4 refit)
        "media_phash_dups",
        # record-linkage family (r4 s4)
        "er_matches",
        # session-6 new families (r4 s6 refit: blocklist/sitemap/wat/
        # readability/token_stats -> tail; their families keep reps)
        "style_delta", "session_survival", "kendall_signals",
        "c4_filter", "event_markov",
        # relational / pack / sketch / quantile / graph / clustering
        "q1_pricing_summary", "asof_click_purchase",
        "pack_1024", "pagerank_5", "hll_lang_tokens",
        "split_strat", "kmeans_clusters", "semdedup_dups",
    }
    missing = required - registered
    assert not missing, f"families dropped from the registry: {missing}"


def test_oracle_sql_parses():
    """Every oracle must at least PREPARE in DuckDB against empty
    tables with the production schemas (catches SQL typos without
    paying the full data run)."""
    import duckdb

    mod = _entry()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet') LIMIT 0")
    for name, sql in mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name} fails to plan: {e}")
