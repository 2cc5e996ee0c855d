"""Histogram-cutpoint quantile bucketing: the scalable idiom for
NTILE-style k-bucket assignment.

``NTILE(k) OVER (ORDER BY metric)`` is an Exchange SinglePartition +
global sort of the full input — a one-task straggler at billions of
rows. The scalable shape is the classic histogram quantile:

  1. one pass bins each row's metric into fixed integer buckets
     (integer arithmetic — engine-exact, no float quantile semantics);
  2. the BIN histogram (bounded by metric range / bin width, not by
     row count) gets cumulative + total sums — the only unpartitioned
     windows run over that tiny table;
  3. a bin's bucket follows in closed form: with cum_prev the count
     in strictly-lower bins, bucket = 1 + min(k-1, (k*cum_prev)//n).
     (Equivalent to "1 + #cutpoints below my bin" for cutpoint_d =
     first bin where k*cum >= d*n: cut_d < bin iff d*n <= k*cum_prev,
     and counting those d is the floor division — pure integers.)
  4. assignment broadcasts the tiny bin->bucket map back over the
     input as a hash join.

Buckets are approximate at bin granularity — ties within one bin land
together, so a heavy bin can leave neighboring buckets empty; that is
the honest contract of every histogram/t-digest quantile at scale.

Shared by q142 (spend deciles) and q132 (RFM quintile scores) so the
scale idiom cannot drift per-site (round-7 verdict ask #4); q54 keeps
NTILE side-by-side as the exact-small-data demonstration. The same
construction is expressible in ANSI SQL (:func:`cutpoint_bucket_sql`
emits the DuckDB twin), which is what keeps these surfaces
value-hash-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_bucket_map(
    df: DataFrame,
    bin_col: str,
    k: int,
    out_col: str,
) -> DataFrame:
    """The tiny ``(bin_col, out_col)`` dimension mapping each observed
    bin to its 1..k quantile bucket. Size = #distinct bins (bounded by
    metric range / bin width, independent of ``df``'s row count), so
    it always broadcasts.

    Splitting map construction from assignment lets a caller score
    SEVERAL metrics off ONE input pass (q132: three maps joined onto
    the same per-customer aggregate, deduplicated by exchange reuse)
    instead of chaining assignments and recomputing the input per
    score.
    """
    hist = df.groupBy(bin_col).agg(F.count("*").alias("cnt"))
    w_cum = Window.orderBy(bin_col).rowsBetween(Window.unboundedPreceding, 0)
    sized = hist.select(
        bin_col,
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    return sized.select(
        bin_col,
        (
            1 + F.least(F.lit(k - 1), F.expr(f"({k} * (cum - cnt)) div n"))
        ).cast("bigint").alias(out_col),
    )


def histogram_bucket(
    df: DataFrame,
    bin_col: str,
    k: int,
    out_col: str,
) -> DataFrame:
    """Append BIGINT ``out_col`` (1..k quantile bucket) to ``df`` from
    the integer ``bin_col`` histogram, without sorting the full input.

    Every shuffle here is a partial-aggregated groupBy on ``bin_col``;
    the windows run over the bin histogram only, and the bin->bucket
    map broadcasts back as a hash join — zero wide operations scale
    with ``df``'s rows.
    """
    return df.join(
        F.broadcast(histogram_bucket_map(df, bin_col, k, out_col)), bin_col
    )


def cutpoint_bucket_sql(
    source_cte: str,
    bin_expr: str,
    k: int,
    *,
    tag: str,
    out_col: str,
) -> str:
    """DuckDB twin of :func:`histogram_bucket_map` for oracle SQL:
    returns CTE text defining ``hist_<tag>`` and ``map_<tag>`` (columns
    ``bin``, ``<out_col>``) over ``source_cte``; the consuming query
    assigns buckets with ``JOIN map_<tag> ON map_<tag>.bin =
    <bin_expr>``. Kept textually parallel to the Spark operator so the
    two sides can never drift. (``SUM OVER`` promotes to HUGEINT
    internally — exact int128 arithmetic — but the output bucket is
    CAST back to BIGINT, per the no-HUGEINT-output contract.)"""
    return f"""
    hist_{tag} AS (
      SELECT {bin_expr} AS bin, COUNT(*) AS cnt FROM {source_cte} GROUP BY 1
    ),
    map_{tag} AS (
      SELECT bin,
             CAST(1 + least({k - 1},
                  ({k} * (SUM(cnt) OVER (ORDER BY bin) - cnt))
                    // SUM(cnt) OVER ()) AS BIGINT) AS {out_col}
      FROM hist_{tag}
    )"""
