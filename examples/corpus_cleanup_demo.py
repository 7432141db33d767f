"""End-to-end training-corpus cleanup: the LLM-data pipeline this engine
is for, as one streaming Ray Data graph.

  read documents
    → normalize (lowercase/collapse)          [stages/text.normalize_text]
    → redact PII spans                        [stages/text.redact_pii]
    → quality gates (C4/Gopher-style)         [stages/text.add_quality_score]
    → exact dedup on md5 fingerprint          [stages/dedup.exact_dedup]
    → MinHash+LSH near-dup pair removal       [stages/neardup, distributed verify]
    → tokenize → pack into 512-token rows     [pipelines.materialize, stages/pack]
    → write partitioned parquet + per-stage metrics JSONL

Run: python examples/corpus_cleanup_demo.py [sf_dir] (default sf0.01).
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import ray


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    from sous_chef_ray.pipelines.materialize import tokenize_documents
    from sous_chef_ray.stages.dedup import exact_dedup
    from sous_chef_ray.stages.neardup import (
        connected_components,
        jaccard_verify_distributed,
        minhash_lsh_candidates,
    )
    from sous_chef_ray.stages.pack import pack_sequences
    from sous_chef_ray.stages.text import (
        add_quality_score,
        normalize_text,
        redact_pii,
    )
    from sous_chef_ray.state.metrics import record_stats

    out_dir = os.path.join(tempfile.gettempdir(), "sous_chef_corpus_demo")
    metrics = os.path.join(out_dir, "metrics.jsonl")

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    n0 = docs.count()

    cleaned = redact_pii(normalize_text(docs, "text", name="text2"),
                         "text2", name="clean_text")

    def keep_clean(t):
        import pyarrow as pa

        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "text": t["clean_text"]})

    cleaned = cleaned.map_batches(keep_clean, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # quality gates: drop docs under 5 words or mostly non-alphanumeric
    scored = add_quality_score(cleaned, "text")

    def gate(t):
        import pyarrow.compute as pc

        mask = pc.and_(pc.greater_equal(t["n_words"], 5),
                       pc.greater_equal(t["alnum_ratio"], 0.5))
        return t.filter(mask).select(["doc_id", "source", "text"])

    gated = scored.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)

    deduped = exact_dedup(gated, "text", keep_by="doc_id")
    n_exact = deduped.count()

    cand = minhash_lsh_candidates(deduped, "doc_id", "text", k=3,
                                  num_hashes=64, bands=16, concurrency=2)
    verified = jaccard_verify_distributed(
        cand, deduped, "doc_id", "text", k=3, threshold=0.8,
        num_partitions=8, concurrency=2,
    ).to_pandas()
    comp = connected_components(verified)
    # drop every near-dup that is not its cluster's representative (min id)
    losers = {k for k, root in comp.items() if root != k}

    def drop_losers(t):
        import numpy as np
        import pyarrow as pa

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, list(losers)) if losers else np.ones(len(t), bool)
        return t.filter(pa.array(keep))

    final_docs = deduped.map_batches(drop_losers, batch_format="pyarrow",
                                     zero_copy_batch=True)

    packed = pack_sequences(tokenize_documents(final_docs), "tokens",
                            seq_len=512, eos_id=50256)
    packed.write_parquet(os.path.join(out_dir, "packed"))

    # metrics: re-consume a light pass to capture stats of the final graph
    rec = record_stats(packed, metrics, stage="corpus_cleanup",
                       extra={"sf_dir": sf_dir})
    import json

    import pyarrow.parquet as pq

    n_seq = pq.read_table(os.path.join(out_dir, "packed")).num_rows
    print(json.dumps({
        "input_docs": n0,
        "after_exact_dedup": n_exact,
        "near_dup_losers": len(losers),
        "packed_sequences": n_seq,
        "metrics_operators": len(rec["operators"]),
        "out_dir": out_dir,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
