"""Cardinality / frequency sketches, built from deterministic md5
arithmetic so the DuckDB oracle replays every register bit.

- :func:`hll_distinct_report` — HyperLogLog (Flajolet et al. 2007,
  "HyperLogLog: the analysis of a near-optimal cardinality estimation
  algorithm"): distinct-token estimate per source from m=2^p 6-bit-ish
  registers.  THE way to count distincts at 100 TB: the shuffle carries
  at most m rows per source (register maxima partial-aggregate
  map-side), vs countDistinct's full token universe.
- :func:`cms_heavy_hitters_report` — Count-Min sketch (Cormode &
  Muthukrishnan 2005): d hash rows × w counters, point estimate =
  min over rows, always ≥ the true count.  The bounded-memory
  frequency table for heavy-hitter tracking on unbounded streams.

Spark's built-ins (approx_count_distinct, CountMinSketch) use
implementation-defined hashing an external oracle cannot reproduce;
these reimplement the public algorithms on the repo's portable 56-bit
md5 hash, trading a little speed for bit-exact cross-engine
verifiability — the register/counter STRUCTURE and cost shape are the
real deliverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import persist_tracked
from .hashing import md5_56

HLL_P = 8                 # 2^8 = 256 registers
HLL_ALPHA_256 = 0.7213 / (1 + 1.079 / 256)  # Flajolet's alpha_m, m=256

CMS_D = 4                 # hash rows
CMS_W = 256               # counters per row
CMS_TOP = 10              # tracked heavy hitters


def _tokens(docs: DataFrame) -> DataFrame:
    from .dedup import ensure_scan_parallelism

    return ensure_scan_parallelism(docs).select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
        ).alias("tok"),
    )


def hll_distinct_report(docs: DataFrame, p: int = HLL_P) -> DataFrame:
    """Per-source distinct-token estimate from an m=2^p-register HLL,
    reported against the exact count (computable at this scale) with
    the relative error — the calibration table that justifies shipping
    the sketch instead of countDistinct at 10^12 tokens.

    Register arithmetic is EXACT integer: bucket = the hash's top p
    bits (div), rank = leading-zero count of the remaining 56-p bits
    via BIT LENGTH (never float log2).  The estimate applies Flajolet's
    small-range linear-counting correction when E ≤ 2.5m and empty
    registers exist.  Cost: one (source, bucket) agg whose output is
    ≤ m rows per source + one tiny fold — the token stream shuffles
    once, registers partial-aggregate map-side."""
    m = 1 << p
    rest_bits = 56 - p
    toks = _tokens(docs)
    # rank = leading zeros of `rest` in (56-p) bits, + 1
    rank = F.when(
        F.col("rest") > 0,
        F.lit(rest_bits) - F.length(F.bin("rest")) + 1,
    ).otherwise(F.lit(rest_bits + 1))
    regs = (
        toks.select("source", md5_56(F.col("tok")).alias("h"))
        .select(
            "source",
            F.expr(f"div(h, {1 << rest_bits})").alias("bucket"),
            (F.col("h") % F.lit(1 << rest_bits)).alias("rest"),
        )
        .withColumn("rank", rank)
        .groupBy("source", "bucket")
        .agg(F.max("rank").alias("mx"))
    )
    folded = regs.groupBy("source").agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_present"),
    )
    # empty registers contribute 2^0 = 1 each; V = empties for the
    # linear-counting branch
    v = F.lit(m) - F.col("n_present")
    raw = F.lit(HLL_ALPHA_256 * m * m) / (F.col("s_present") + v)
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    exact = _tokens(docs).groupBy("source").agg(
        F.count_distinct("tok").cast("bigint").alias("exact_distinct")
    )
    return (
        folded.join(exact, "source")
        .select(
            "source",
            v.cast("bigint").alias("n_empty_registers"),
            F.round(est, 2).alias("hll_estimate"),
            "exact_distinct",
            F.round((est - F.col("exact_distinct"))
                    / F.col("exact_distinct"), 4).alias("rel_err"),
        )
        .orderBy("source")
    )


def cms_heavy_hitters_report(
    docs: DataFrame, d: int = CMS_D, w: int = CMS_W, top: int = CMS_TOP
) -> DataFrame:
    """Count-Min point estimates for the corpus's top tokens, against
    their true counts: est = min over the d hash rows of counter[h_i(tok)],
    with the one-sided guarantee est ≥ true (collisions only inflate).

    Cost shape: ONE token-count agg feeds both the sketch and the
    truth; the sketch itself is d bounded aggs over (row, cell) —
    output ≤ d·w rows total, a broadcastable frequency table for any
    corpus size.  Hash row i keys ``md5(i || ':' || tok)`` so the d
    rows are independent and the oracle replays them."""
    counts = (
        _tokens(docs).groupBy("tok").agg(F.count("*").alias("cnt"))
    )
    counts = persist_tracked(counts)  # feeds sketch + truth + top-k
    rows = None
    for i in range(d):
        cell = md5_56(F.concat(F.lit(f"{i}:"), F.col("tok"))) % w
        r = counts.select(
            F.lit(i).alias("hrow"), cell.alias("cell"), "cnt"
        )
        rows = r if rows is None else rows.unionByName(r)
    cms = rows.groupBy("hrow", "cell").agg(F.sum("cnt").alias("c"))

    top_toks = counts.orderBy(F.col("cnt").desc(), "tok").limit(top)
    probes = None
    for i in range(d):
        cell = md5_56(F.concat(F.lit(f"{i}:"), F.col("tok"))) % w
        pr = top_toks.select(
            "tok", "cnt", F.lit(i).alias("hrow"), cell.alias("cell")
        )
        probes = pr if probes is None else probes.unionByName(pr)
    est = (
        probes.join(F.broadcast(cms), ["hrow", "cell"])
        .groupBy("tok", "cnt")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
    )
    out = est.select(
        "tok",
        F.col("cnt").cast("bigint").alias("true_count"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("cnt")).cast("bigint").alias(
            "overcount"
        ),
    ).orderBy(F.col("true_count").desc(), "tok")
    return out
