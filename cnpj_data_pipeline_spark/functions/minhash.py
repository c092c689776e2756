"""MinHash banding primitives over an arbitrary (id, text) DataFrame.

Shared by the corpus queries (queries/text.py) and the incremental near-dup
index job (plans/neardup.py) so both compute bit-identical signatures.

Determinism contract (the reason these are NOT plain string hashes): the
shingle id is the leading 60 bits of md5(shingle) reduced mod 2^31-1 — md5 is
bit-identical in Spark and DuckDB, the mod keeps ``sid * a + b`` inside int64
for the Carter-Wegman permutations, and nothing needs a global-sort
dictionary (every row hashes independently — fully parallel at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = N_HASHES // 2  # 2 hashes per band
MERSENNE = (1 << 31) - 1
HASH_A = [2654435761, 2246822519, 3266489917, 668265263, 374761393, 2654435789, 2246822579, 3266489939]
HASH_B = [1779033703, 3144134277, 1013904242, 2773480762, 1359893119, 2600822924, 528734635, 1541459225]


def tokens(col="text"):
    return F.split(F.col(col), " ")


def shingles(col="text", k: int = 3):
    """Word k-shingles: positions 0..n-k of consecutive-token joins; a doc
    shorter than k tokens contributes its whole text as one shingle."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingle_id(col):
    """shingle string -> 31-bit integer id (see module docstring)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MERSENNE
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, text[, carry...]) -> (id[, carry...], mh_0..mh_{N_HASHES-1}).
    ``carry`` columns must be constant per id (e.g. the change envelope's
    op/lsn) — they ride through the aggregation as group keys."""
    carry = carry or []
    sh = df.select(id_col, *carry, F.explode(shingles(text_col)).alias("shingle"))
    sh = sh.withColumn("sid", shingle_id("shingle"))
    aggs = [
        F.min((F.col("sid") * HASH_A[h] + HASH_B[h]) % MERSENNE).alias(f"mh_{h}")
        for h in range(N_HASHES)
    ]
    return sh.groupBy(id_col, *carry).agg(*aggs)


def band_rows(
    sig: DataFrame, id_col: str = "doc_id", carry: list[str] | None = None
) -> DataFrame:
    """Signature -> one row per band: (id[, carry...], band, h1, h2), via a
    one-pass stack() (a N_BANDS-way union would re-evaluate the signature
    aggregation once per band)."""
    carry = carry or []
    stack_args = ", ".join(
        f"{band}, mh_{2 * band}, mh_{2 * band + 1}" for band in range(N_BANDS)
    )
    return sig.selectExpr(
        id_col, *carry, f"stack({N_BANDS}, {stack_args}) AS (band, h1, h2)"
    )
