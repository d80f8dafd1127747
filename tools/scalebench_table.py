#!/usr/bin/env python3
"""Render BASELINE.md's 'Demonstrated scaling' tables from
SCALEBENCH.json — so the published table is BY CONSTRUCTION exactly
what the committed artifact substantiates (round-9 verdict #1).
Dev-side tool (driver-style python env), not part of the library.
"""
import json
import sys

LABELS = {
    "q20_dedup_exact": "q20 exact dedup",
    "q21_dedup_ngram_jaccard": "q21 n-gram Jaccard",
    "q22_dedup_minhash_lsh": "q22 MinHash LSH",
    "q23_dedup_simhash": "q23 SimHash (scale-derived contract)",
    "q52_dedup_corpus": "q52 corpus dedup",
    "q62_dedup_incremental": "q62 incremental ingest dedup",
    "q64_decontamination": "q64 decontamination (broadcast eval)",
    "q48_embed_near_dup_lsh": "q48 near-dup LSH (scale-derived)",
    "q51_embed_near_dup_lsh_hi": "q51 near-dup LSH (scale-derived τ=0.95)",
    "q53_embed_ann_ivf_clustered": "q53 IVF ANN clustered",
    "q84_passage_dedup": "q84 passage dedup",
    "q85_containment": "q85 containment pairs",
    "q86_shard_manifest": "q86 shard manifest",
    "q87_bigram_surprisal": "q87 bigram surprisal",
    "q104_media_jpeg": "q104 JPEG decode (media family rep)",
    "q107_compressed_ingest": "q107 zstd/LZ4 ingest",
    "q129_dedup_bloom_incremental": "q129 Bloom dedup (in-plan)",
    "q136_dedup_bloom_artifact": "q136 Bloom dedup (stored+merged)",
    "q126_embed_ann_ivf_sq8_stored": "q126 IVF-SQ8 stored serving",
    "q132_embed_ann_pq_stored": "q132 PQ stored serving",
    "q134_embed_ann_ivfpq_stored": "q134 IVFADC stored serving",
    "q133_ann_index_append": "q133 IVF append + serve",
    "q135_pq_index_append": "q135 PQ append + serve",
    "q137_bm25_topk": "q137 BM25 retrieval (in-plan)",
    "q138_bm25_stored": "q138 BM25 stored inverted file",
    "q139_bm25_index_append": "q139 BM25 df-merge append + serve",
    "q147_substring_dedup": "q147 substring spans (in-plan)",
    "q151_substring_dedup_stored": "q151 substring stored+compacted serve",
    "q148_stream_index_append": "q148 streamed IVF append + serve",
    "q158_stream_substring_append": "q158 streamed substring append + serve",
    "q140_link_pagerank": "q140 PageRank (5 rounds)",
    "q146_link_pagerank_dangling": "q146 dangling PageRank",
    "q149_link_hits": "q149 HITS (4 rounds)",
    "q155_link_prior_stored": "q155 stored PageRank prior serve",
    "q157_cms_heavy_hitters_stored": "q157 CMS artifact serve",
    "q159_link_ppr": "q159 personalized PageRank",
    "q160_substring_delete": "q160 substring delete + serve",
    "q161_bm25_delete": "q161 BM25 delete + serve",
    "q162_ann_ivf_sq8_delete": "q162 IVF-SQ8 delete + serve",
    "q163_ann_pq_delete": "q163 PQ delete + serve",
    "q164_ann_ivfpq_delete": "q164 IVFADC delete + serve",
    "q165_neardup_index_delete": "q165 near-dup delete + serve",
    "q166_semantic_decontam": "q166 semantic decontamination",
}

MAINT_LABELS = {
    "ivf_build_sec": "IVF-SQ8 index build (full corpus)",
    "ivf_append_sec": "IVF append, FIXED 100-vector batch",
    "ivf_delete_sec": "IVF tombstone delete, same batch",
    "ivf_purge_sec": "IVF purge (physical reclaim, ∝ index)",
    "pq_build_sec": "PQ index build (full corpus)",
    "pq_append_sec": "PQ append, FIXED 100-vector batch",
    "pq_delete_sec": "PQ tombstone delete, same batch",
    "pq_purge_sec": "PQ purge (∝ index)",
    "bloom_build_sec": "Bloom artifact build (full corpus)",
    "bloom_merge_sec": "Bloom merge, FIXED 200-doc batch",
    "bm25_build_sec": "BM25 index build (full corpus)",
    "bm25_append_sec": "BM25 df-merge append, FIXED 200-doc batch",
    "bm25_hot_serve_sec": "BM25 hot-term serve (max-score pruned)",
    "bm25_hot_exhaustive_sec": "BM25 hot-term serve (exhaustive ref)",
    "bm25_hot_matched_rows": "BM25 hot-term MATCHED posting rows",
    "bm25_hot_scored_rows": "BM25 hot-term SCORED rows (pruned)",
    "bm25_compact_sec": "BM25 postings compaction (epoch rewrite)",
    "bm25_compact_files_before": "BM25 part-files before compaction",
    "bm25_compact_files_after": "BM25 part-files after compaction",
    "bm25_ledger_compact_sec": "BM25 ids-ledger compaction",
    "bm25_ledger_files_before": "ledger part-files before",
    "bm25_ledger_files_after": "ledger part-files after",
    "bm25_delete_sec": "BM25 tombstone delete, FIXED 200-doc batch",
    "bm25_purge_sec": "BM25 purge (∝ index)",
    "neardup_build_sec": "near-dup index build (full corpus)",
    "neardup_append_sec": "near-dup append, FIXED 200-doc batch",
    "neardup_delete_sec": "near-dup tombstone delete, same batch",
    "neardup_purge_sec": "near-dup purge (∝ index)",
    "substring_build_sec": "substring index build (full corpus)",
    "substring_append_sec": "substring append, FIXED 200-doc batch",
    "substring_summary_sec": "substring compaction + dup summary mint",
    "substring_serve_sec": "substring serve vs COMPACTED index, same batch",
    "substring_serve_delta_sec": "substring serve with delta batch present",
    "substring_delete_sec": "substring tombstone delete, same batch",
    "substring_compact_sec": "substring summing re-compaction (∝ index)",
    "substring_rows_before": "segment rows before re-compaction",
    "substring_rows_after": "segment rows after re-compaction",
    "cms_build_sec": "CMS artifact build (full corpus)",
    "cms_merge_sec": "CMS merge, FIXED 200-doc batch",
    "bpe_train_sec": "BPE train 64 merges (incremental pair counts)",
    "bpe_train_recount_sec": "BPE train 64 merges (retired full recount)",
    "bpe_affected_rows": "BPE rows exploded, incremental (Σ affected)",
    "bpe_recount_rows": "BPE rows exploded, recount (rounds × vocab)",
}

COUNTER_LABELS = {
    "docs": "docs",
    "minhash_cand": "MinHash candidates",
    "simhash_cand": "SimHash candidates",
    "jaccard_pairs": "exact τ=0.8 Jaccard pairs (truth)",
    "passage_dup_volume": "duplicated passages (truth)",
    "containment_pairs": "containment pairs ≥0.9 (truth)",
    "neardup_lsh_cand_fixed": "sign-LSH candidates, FIXED cap",
    "neardup_lsh_cand_scaled": "sign-LSH candidates, SCALE-derived",
    "neardup_true_pairs": "exact τ=0.9 near-dup pairs (truth)",
    "ivf_cand": "IVF candidates (10 queries)",
    "ivf_corpus": "IVF corpus (clustered fixture)",
}


def main(path):
    rec = json.loads(open(path).read())
    m = rec["mult"]
    print(f"passes recorded: {rec.get('npasses', '?')}\n")
    print("| query | 1× s | %d× s | wall ratio | passes 1× | passes %d× |"
          % (m, m))
    print("|---|---|---|---|---|---|")
    for key, label in LABELS.items():
        q = rec["queries"].get(key)
        if not q:
            continue
        t1, tm = q["t1x"], q[f"t{m}x"]
        p1 = "/".join(f"{x:.2f}" for x in q.get("passes1x", []))
        pm = "/".join(f"{x:.2f}" for x in q.get(f"passes{m}x", []))
        print(f"| {label} | {t1:.2f} | {tm:.2f} | {tm / t1:.2f} "
              f"| {p1} | {pm} |")
    print()
    print("| counter | 1× | %d× | growth |" % m)
    print("|---|---|---|---|")
    for key, label in COUNTER_LABELS.items():
        c = rec["counters"].get(key)
        if not c:
            continue
        c1, cm = c["c1x"], c[f"c{m}x"]
        print(f"| {label} | {c1:,} | {cm:,} | {cm / max(c1, 1):.1f}× |")
    maint = rec.get("maintenance")
    if maint:
        print()
        print("| maintenance op | 1× corpus s | %d× corpus s | ratio |" % m)
        print("|---|---|---|---|")
        for key, label in MAINT_LABELS.items():
            v = maint.get(key)
            if not v:
                continue
            t1, tm = v["t1x"], v[f"t{m}x"]
            print(f"| {label} | {t1:.2f} | {tm:.2f} "
                  f"| {tm / max(t1, 1e-9):.2f} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SCALEBENCH.json")
