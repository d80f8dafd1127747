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


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SCALEBENCH.json")
