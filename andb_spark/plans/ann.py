"""Access-path selection for vector top-k search.

The direct analog of the reference's scan-path chooser — given a query,
pick an index scan when one pays, else sequential scan (andb/executor/
operator/logical/implementations.py:80-142, which extracts equality
predicates, matches them to a B+tree prefix, prefers a covering index,
and falls back to TableScan) — applied to the access structure the
reference only promised: vector search ("we will support vector index
in the future here", implementations.py:108).

Paths:
- ``exact``  — brute-force scan + TakeOrderedAndProject (recall 1.0).
- ``lsh``    — sign-LSH bucket probe (operators/similarity.py::
  signlsh_topk): a scan filter that a bucket-partitioned layout turns
  into partition pruning; recall < 1.

Rule + cost model (``choose_topk_path``): forced modes win; ``auto``
consults table statistics (plans/stats.py) — below ``exact_row_cap``
rows the full scan is cheaper than any pruning (every path must read
the parquet footer anyway, and TakeOrderedAndProject never sorts the
full input), above it the LSH probe reads ~``(bits+1)/2^bits`` of the
data with a partitioned layout. This mirrors the shape of the
reference's rule ("prefer covered index, else shortest index, else seq
scan") with the one number Spark can't know: that the caller tolerates
approximate recall. Approximation is therefore OPT-IN — ``auto`` is
only reachable through an explicit session setting (SET andb.ann_mode),
exactly like the recall/latency trade every ANN system exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from andb_spark.operators import similarity as SIM

MODES = ("exact", "lsh", "auto")

# Below this many rows a brute-force scan beats any pruned path on a
# warm cluster (single-stage, no probe bookkeeping). One parquet
# row-group is ~128 MB ≈ 1e6 short rows; pruning starts paying once the
# scan spans multiple splits per executor.
EXACT_ROW_CAP = 1_000_000


def choose_topk_path(
    mode: str, stats: dict | None, exact_row_cap: int = EXACT_ROW_CAP
) -> str:
    """Resolve a session mode + table statistics to a concrete path."""
    if mode not in MODES:
        raise ValueError(f"ann_mode must be one of {MODES}, got {mode!r}")
    if mode != "auto":
        return mode
    rows = (stats or {}).get("rows")
    if rows is None:
        # No statistics (table never ANALYZEd): stay exact — the only
        # path whose answer is correct by construction. Same safety
        # default as the reference falling back to seq scan when no
        # index matches (implementations.py:135-142).
        return "exact"
    return "exact" if rows <= exact_row_cap else "lsh"


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    mode: str = "exact",
    stats: dict | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    bits: int = 4,
    max_hamming: int = 1,
) -> tuple[DataFrame, str]:
    """Plan + build a cosine top-k query. Returns (DataFrame, chosen
    path) so callers (and EXPLAIN output) can surface the decision."""
    path = choose_topk_path(mode, stats)
    if path == "exact":
        df = SIM.cosine_topk(
            embeddings, query_vec, k, id_col=id_col, vec_col=vec_col,
            exclude_id=exclude_id,
        )
    else:
        df = SIM.signlsh_topk(
            embeddings, query_vec, k, bits=bits, max_hamming=max_hamming,
            id_col=id_col, vec_col=vec_col, exclude_id=exclude_id,
        )
    return df, path
