#!/usr/bin/env python3
"""sf0.1+ variant of check.py: identical strict compare, but skips oracles
that are O(N^2) to REPLAY in DuckDB (brute-force pair-join SQL and the
recursive-CTE component closure). Those queries' correctness is still gated
at sf0.01 by check.py and by the brute-force-equivalence ScalaTest specs;
this script exists to validate everything else at a 10x scale factor.

Usage: python3 tools/check_big.py /root/testdata/sf0.1 /tmp/verify_out
"""
import sys, json, importlib.util

SKIP = {
    "ngram_jaccard_pairs",   # inverted-index brute-force oracle: O(pairs)
    "edit_distance_pairs",   # same candidate SQL + levenshtein
    "dedup_minhash_lsh",     # same pair SQL as the exact-Jaccard oracle
    "dedup_groups",          # recursive-CTE transitive closure
    "dedup_embedding",       # all-pairs list_cosine_similarity
    "triplet_mining",        # declared O(N^2) exact baseline, both sides
    "contamination_check",   # all-pairs shared-shingle join
    "stream_stream_join",    # events self-join on a time band
    "stream_stream_left_join",  # same self-join, left-outer
    "stream_stream_full_join",  # same self-join, full-outer
    "dedup_representative",  # recursive-CTE closure (same as dedup_groups)
    "dedup_incremental",     # batch x corpus all-pairs Jaccard oracle
    "streaming_neardup_ingest",  # 4x (batch x admitted) all-pairs Jaccard replay,
                                 # and the banding-recall audit is pinned at sf0.01
    "semantic_dedup",        # unrolled quantized k-means + within-cluster pairs
                             # + recursive-CTE closure: O(cluster pairs) replay
    "dbscan_embeddings",     # all-pairs eps-join + recursive-CTE closure replay
    "dbscan_embeddings_lsh", # banded candidates, but the label tail is the
                             # same recursive-CTE closure replay class
    "spatial_distance_join", # the oracle replays the N^2 point self-join
    "graph_condensation",    # same mutual-reachability closure replay as graph_scc
    "graph_scc",             # mutual-reachability closure SELF-JOIN: the reach
                             # set alone is quadratic in SCC size — same class
                             # as graph_components; gated at sf0.01
    "graph_components",      # recursive-CTE transitive closure: the reach set
                             # materializes sum(|component|^2) rows (trading
                             # blocs are large corpus fractions) — same
                             # quadratic-replay class as dedup_groups;
                             # correctness stays gated at sf0.01 by check.py
}

spec = importlib.util.spec_from_file_location(
    "check", __file__.replace("check_big.py", "check.py"))
check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check)

if __name__ == "__main__":
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle_path = f"{outdir}/oracle_sql.json"
    oracle = json.load(open(oracle_path))
    kept = {k: v for k, v in oracle.items() if k not in SKIP}
    print(f"[check_big] skipping {len(oracle) - len(kept)} quadratic-replay oracles: "
          + ", ".join(sorted(set(oracle) & SKIP)))
    json.dump(kept, open(oracle_path, "w"))
    try:
        check.main(sfdir, outdir)
    finally:
        json.dump(oracle, open(oracle_path, "w"))
