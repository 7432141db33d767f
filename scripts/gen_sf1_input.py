"""Generate the sf1 (10×) bench input: 160M-row token table + 4M spine.

Chunked generation (sources/synth.write_token_dataset chunk_rows path)
bounds driver memory at one 5M-row chunk — the one-shot 16M generator
would need ~60 GB of heap at this scale. The spine draws its (doc_id,
event_ts) picks from chunk 0 (regenerated, deterministic), which is
sufficient for the throughput proof: tie/between/before/unknown spine
semantics all still occur.

Writes the caches bench.py's ensure_input() looks for, so
  BENCH_TOKEN_ROWS=160000000 BENCH_SPINE_ROWS=4000000 python bench.py
runs the headline + partitioned as-of at sf1 with no further setup.
No Ray session needed here (pure numpy/pyarrow).
"""

import os
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sous_chef_ray.sources.synth import spine_table, token_table, write_token_dataset

N = int(os.environ.get("BENCH_TOKEN_ROWS", 160_000_000))
SPINE = int(os.environ.get("BENCH_SPINE_ROWS", 4_000_000))
CHUNK = 5_000_000
TOKEN_CACHE = f"/tmp/sous_chef_bench/tokens_{N}"
SPINE_CACHE = f"/tmp/sous_chef_bench/spine_{N}_{SPINE}.parquet"


def main() -> None:
    t0 = time.time()
    if not os.path.exists(TOKEN_CACHE):
        write_token_dataset(TOKEN_CACHE, N, seed=42, chunk_rows=CHUNK)
        print(f"tokens written: {TOKEN_CACHE} ({time.time() - t0:.0f}s)",
              flush=True)
    if not os.path.exists(SPINE_CACHE):
        feats = token_table(min(CHUNK, N), seed=42, n_docs=max(1, N // 20),
                            ts_offset_rows=0)  # == chunk 0, deterministic
        spine = spine_table(feats, SPINE, seed=43)
        pq.write_table(spine, SPINE_CACHE)
        print(f"spine written: {SPINE_CACHE}", flush=True)
    print(f"done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
