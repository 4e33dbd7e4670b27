"""Z-order clustered writes — multi-dimensional data skipping, the
storage-layout operator next to ``skew.write_bucketed``.

A table sorted by one column prunes parquet row-groups/files on that
column only: min/max footer statistics for every OTHER column span
the whole domain in every file, so a filter on them reads everything.
Interleaving the bits of several columns' normalized values (Morton /
Z-order) and range-partitioning + sorting by that key gives every
file a small hyper-rectangle of the combined domain — min/max stats
prune on ANY of the z-columns. At 100 TB this is the difference
between "point lookups on (user, day) read one file" and "read the
table"; it is exactly the layout Delta's OPTIMIZE ZORDER BY produces,
built here from stock Spark primitives:

1. Normalize each z-column to ``bits``-bit integers by linear min/max
   scaling — the (min, max) pairs come from ONE bounded 1-row collect
   (the centroid rule). Linear scaling is skew-sensitive (a heavy hub
   value crowds the others into few codes); for heavily skewed
   columns pre-transform (log, rank-bucket) before z-ordering —
   documented, not hidden.
2. Interleave the bits (pure integer Column arithmetic — no UDF).
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the key, drop
   it, write. The key never lands in the files; the LAYOUT is the
   artifact, and readers need no special support — Spark's stock
   parquet scan uses the footer stats.

Determinism: the scaling bounds are data-derived literals; rows with
NULL in any z-column take a NULL key and are range-partitioned
together (kept, not dropped — pinned); a constant column contributes
zero bits (guarded division). STORE CONTRACT: (cols, bits, bounds)
describe the layout only — rewriting with different settings changes
nothing semantically, just pruning quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(us: list[Column], bits: int) -> Column:
    """Morton key: bit i of normalized column c lands at position
    i * n_cols + c. Flat integer expression — each term is one
    shift/mask of an already-projected normalized column."""
    n = len(us)
    terms = []
    for c, u in enumerate(us):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(u, i).bitwiseAND(F.lit(1)), i * n + c
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_col: str = "__zkey",
) -> DataFrame:
    """``df`` plus the Morton key column over ``cols`` (numeric,
    date, or timestamp — dates normalize via their epoch-day number,
    timestamps via epoch seconds). One 1-row bounds collect; NULL in
    any z-column => NULL key."""
    if bits < 1 or not cols or len(cols) * bits > 63:
        raise ValueError(
            f"zorder: need bits >= 1 and 1..{63 // max(bits, 1)} "
            f"columns at {bits} bits (got {len(cols)} cols, {bits} bits)"
        )
    dtypes = dict(df.dtypes)

    def scalar(c: str) -> Column:
        # DATE cannot cast to double directly (ANSI); days/seconds
        # since epoch are monotone, which is all scaling needs
        if dtypes.get(c) == "date":
            return F.unix_date(F.col(c)).cast("double")
        if dtypes.get(c, "").startswith("timestamp"):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(scalar(c)).alias(f"__mn_{c}"),
                F.max(scalar(c)).alias(f"__mx_{c}"),
            )
        ]
    ).collect()[0]
    top = (1 << bits) - 1
    us = []
    proj = df
    for c in cols:
        mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        if mn is None or mx is None or mx == mn:
            # empty input or constant column: zero bits of information
            u = F.when(F.col(c).isNotNull(), F.lit(0)).cast("long")
        else:
            u = F.floor(
                (scalar(c) - F.lit(float(mn)))
                / F.lit(float(mx - mn))
                * F.lit(float(top))
            ).cast("long")
        name = f"__u_{c}"
        proj = proj.withColumn(name, u)
        us.append(F.col(name))
    return proj.withColumn(key_col, _interleave(us, bits)).drop(
        *[f"__u_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partitioned on the key (each output file owns a contiguous
    key range = a small hyper-rectangle of the combined domain) and
    sorted within partitions (tight row-group stats). The key column
    is dropped before writing — the layout IS the artifact; readers
    prune via stock footer statistics on the original columns."""
    if num_files is not None and num_files < 1:
        raise ValueError(f"zorder: num_files must be >= 1 (got {num_files})")
    keyed = with_zorder_key(df, cols, bits)
    parted = (
        keyed.repartitionByRange(num_files, "__zkey")
        if num_files is not None
        else keyed.repartitionByRange("__zkey")
    )
    parted.sortWithinPartitions("__zkey").drop("__zkey").write.mode(
        "overwrite"
    ).parquet(path)
