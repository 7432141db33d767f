"""Isolate the broadcast as-of phase; print per-stage timing breakdown."""
import sys
import time

sys.path.insert(0, "/root/repo")
import pandas as pd
import pyarrow.parquet as pq

import ray
import ray.data as rd

NCPU = int(sys.argv[1])
ROWS = sys.argv[2] if len(sys.argv) > 2 else "4000000"
TOKEN_CACHE = f"/tmp/sous_chef_bench/tokens_{ROWS}"
SPINE = f"/tmp/sous_chef_bench/spine_{ROWS}_400000.parquet"

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from sous_chef_ray.pipelines.materialize import materialize_features  # noqa: E402

spine = pq.read_table(SPINE)
rd.read_parquet(TOKEN_CACHE).count()  # warm everything incl. tokens

t0 = time.time()
tok = rd.read_parquet(TOKEN_CACHE)
tok_slim = rd.read_parquet(TOKEN_CACHE, columns=["doc_id", "event_ts", "created_ts"])
res = materialize_features(tok, spine, ttl=pd.Timedelta(days=365),
                           concurrency=max(2, NCPU // 2), batch_size=262144,
                           token_slim_ds=tok_slim)
print(f"RESULT ncpu={NCPU} asof_sec={time.time()-t0:.2f} out_rows={len(res)}")
ray.shutdown()
