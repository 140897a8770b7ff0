"""Aspect-ratio bucketing for image-training batch formation.

Diffusion/vision training batches must share one (w, h) to stack into a
tensor; naive center-crop to a square destroys composition. The standard
fix (SDXL-style aspect-ratio bucketing) snaps every image to the nearest
bucket from a fixed resolution ladder of ~constant pixel budget, then
batches within buckets. The reference repo has no training-side operators
— this extends the engine's image pipeline (decode -> curate -> dedup ->
pack) with the bucket-assignment stage; downstream per-bucket batch/shard
formation reuses ``seq_pack``/``shard_pack``.

Engine design (the 100-TB shape): the ladder is a 13-entry STATIC
constant, so the nearest-bucket argmin is emitted as a pure scan-side
codegen expression — 13 integer cost terms folded through LEAST() and a
first-match CASE chain. No join (not even a broadcast), no shuffle, no
Python: assignment cost is one whole-stage-codegen projection over the
scan, and Parquet column pruning means only (image_id, w, h) is read.

Cross-engine determinism: the distance |log(w/h) - log(bw/bh)| is
monotone in max(w*bh, h*bw) / min(w*bh, h*bw), so the argmin is computed
on ``(1e6 * max) intdiv min`` — exact BIGINT arithmetic, bit-identical in
Spark (``DIV``) and DuckDB (``//``; both floor for positive operands).
Ties after the 1e6-scale floor break to the EARLIEST ladder entry (CASE
evaluates in order in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (bucket_id, bw, bh): square first, then alternating landscape/portrait
# by increasing elongation — the published SDXL ladder shape at a 1024px
# budget. Order is the tie-break order and is part of the contract.
LADDER = [
    (1, 1024, 1024),
    (2, 1152, 896), (3, 896, 1152),
    (4, 1216, 832), (5, 832, 1216),
    (6, 1344, 768), (7, 768, 1344),
    (8, 1536, 640), (9, 640, 1536),
    (10, 1792, 576), (11, 576, 1792),
    (12, 2048, 512), (13, 512, 2048),
]

_SCALE = 1_000_000


def _cost_sql(wcol: str, hcol: str, bw: int, bh: int, dialect: str) -> str:
    """Integerized aspect distance to bucket (bw, bh) as a BIGINT."""
    a = f"(CAST({wcol} AS BIGINT) * {bh})"
    b = f"(CAST({hcol} AS BIGINT) * {bw})"
    div = "//" if dialect == "duckdb" else "DIV"
    return f"(({_SCALE} * GREATEST({a}, {b})) {div} LEAST({a}, {b}))"


def ar_bucket_select_sql(wcol: str, hcol: str, dialect: str) -> dict[str, str]:
    """The four assignment expressions keyed by output column name.

    ``cost_u`` is LEAST over the 13 costs; ``bucket_id``/``bw``/``bh`` are
    first-match CASE chains against it. All-integer; identical text shape
    in both dialects (only the intdiv token differs via ``_cost_sql``).
    """
    costs = [(bid, bw, bh, _cost_sql(wcol, hcol, bw, bh, dialect)) for bid, bw, bh in LADDER]
    least = "LEAST(" + ", ".join(c for _, _, _, c in costs) + ")"

    def chain(pick) -> str:
        whens = " ".join(
            f"WHEN {c} = {least} THEN {pick(bid, bw, bh)}" for bid, bw, bh, c in costs
        )
        return f"(CASE {whens} END)"

    return {
        "bucket_id": f"CAST({chain(lambda bid, bw, bh: bid)} AS INT)",
        "bw": f"CAST({chain(lambda bid, bw, bh: bw)} AS INT)",
        "bh": f"CAST({chain(lambda bid, bw, bh: bh)} AS INT)",
        "cost_u": f"CAST({least} AS BIGINT)",
    }


def assign_ar_buckets(
    images: DataFrame, w: str = "w", h: str = "h", carry: tuple[str, ...] = ()
) -> DataFrame:
    """Per-image bucket assignment: (image_id, *carry, bucket_id, bw, bh,
    cost_u). Zero-exchange — one codegen projection over the scan."""
    exprs = ar_bucket_select_sql(w, h, "spark")
    cols = [F.col("image_id"), *[F.col(c) for c in carry]]
    cols += [F.expr(sql).alias(name) for name, sql in exprs.items()]
    return images.select(*cols)


def assign_ar_buckets_py(w: int, h: int) -> tuple[int, int, int, int]:
    """Pure-Python oracle of the assignment (exact ints, same tie-break)."""
    best = None
    for bid, bw, bh in LADDER:
        a, b = w * bh, h * bw
        cost = (_SCALE * max(a, b)) // min(a, b)
        if best is None or cost < best[3]:
            best = (bid, bw, bh, cost)
    return best
