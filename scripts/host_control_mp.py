"""Host scaling control: the EXACT per-shard SPIMI kernel driven by raw
multiprocessing (no Spark, no JVM, no Arrow sockets) at N and 4N procs.

Purpose (north_rule evidence): separates what the algorithmic
decomposition can scale from what this sandbox VM lets a Spark job
scale. The kernel below is byte-identical work to
operators/build.py:_make_spimi_writer (tokenize → factorize → lexsort →
run-length → varint encode) over the same 15k-doc shards the size-tiered
build uses. On a real cluster each executor runs ≤ its-cores worth of
these kernels against its own OS kernel — the multiprocessing number is
the per-host profile that replicates.

Prints one JSON line. Usage: python scripts/host_control_mp.py
(env: SPARK_GRAFT_CONTROL_DOCS=300000, procs pinned 2 vs 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHARD_DOCS = 15_000


def _gen_shard(args) -> "object":
    lo, hi = args
    import pandas as pd

    from semantic_search_engine_spark.fixtures.webtext import _doc_fields

    rows = [_doc_fields(i) for i in range(lo, hi)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])[["url", "text"]]


def _shard_job(args) -> float:
    """Generate the shard's docs locally (feed = bounds only — no
    parent-side serialization bottleneck), then run the exact kernel."""
    pdf = _gen_shard(args)
    return _kernel(pdf)


def _kernel(pdf) -> float:
    import numpy as np
    import pandas as pd

    from semantic_search_engine_spark.functions.tokenizer import tokenize_series
    from semantic_search_engine_spark.operators.codec import encode_segment_blocks

    t0 = time.time()
    order = np.argsort(pdf["url"].to_numpy(), kind="stable")
    pdf = pdf.iloc[order]
    docids = np.arange(len(pdf), dtype=np.int64)
    tokens = tokenize_series(pdf["text"])
    lens = tokens.str.len().to_numpy().astype(np.int64)
    docids_rep = np.repeat(docids, lens)
    dls_rep = np.repeat(lens, lens)
    terms = np.concatenate([np.asarray(t, dtype=object) for t in tokens])
    codes, uniques = pd.factorize(terms, sort=True)
    o2 = np.lexsort((docids_rep, codes))
    tc, dc, lc = codes[o2], docids_rep[o2], dls_rep[o2]
    is_new = np.empty(tc.size, dtype=bool)
    is_new[0] = True
    import numpy as _np

    _np.logical_or(tc[1:] != tc[:-1], dc[1:] != dc[:-1], out=is_new[1:])
    starts = _np.flatnonzero(is_new)
    tf = _np.diff(_np.concatenate([starts, [tc.size]]))
    encode_segment_blocks(tc[starts], dc[starts], tf, lc[starts])
    return time.time() - t0


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_CONTROL_DOCS", 480_000))
    bounds = [(lo, min(lo + SHARD_DOCS, n)) for lo in range(0, n, SHARD_DOCS)]
    out = {"metric": "mp_spimi_kernel_control", "docs": n, "shards": len(bounds)}
    for procs in (2, 8):
        with mp.Pool(procs) as pool:
            pool.map(_shard_job, bounds[:2])  # warm
            t0 = time.time()
            pool.map(_shard_job, bounds)
            out[f"wall_p{procs}"] = round(time.time() - t0, 1)
    out["speedup_2_to_8"] = round(out["wall_p2"] / out["wall_p8"], 2)
    out["efficiency"] = round(out["speedup_2_to_8"] / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
