"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` draws a DIFFERENT subset every run (seeded RNG over
partition layout), which breaks reproducible corpus construction and
can't be verified against another engine. These operators derive the
keep/drop decision from a content hash of the row's key, so:

* the same key always lands on the same side — re-runs, retries, and
  other engines agree row-for-row;
* joining two tables sampled on the same key keeps referential
  integrity (both sides keep the same keys);
* changing ``salt`` yields an independent resample.

The bucket is the first 8 hex chars of md5(key ∥ salt) compared
lexicographically against a threshold — pure narrow projection +
filter, no shuffle, pushes through any plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SEP = "\x1f"
_SPACE = 16**8  # 8 hex chars


def _bucket(key_cols: list[str], salt: str) -> Column:
    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    return F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 8)


def hash_threshold(fraction: float) -> str:
    """Lowercase 8-hex-digit threshold: bucket < threshold keeps
    ~``fraction`` of keys (exact to 1/16^8 ≈ 6e-10 granularity).

    ``fraction >= 1.0`` returns ``"g"``, which sorts after every hex
    bucket, so keep-all really keeps ALL rows (a clamp to
    ``"ffffffff"`` would drop keys whose bucket is exactly that)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _SPACE), "08x")


def hash_sample(
    df: DataFrame, key_cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key hash."""
    return df.filter(_bucket(key_cols, salt) < F.lit(hash_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible analogue of
    ``df.sampleBy``): each stratum value gets its own keep-fraction,
    e.g. downsample web crawl but keep all curated documents."""
    thr = F.lit(hash_threshold(default_fraction))
    for value, frac in fractions.items():
        thr = (
            F.when(
                F.col(stratum_col) == F.lit(value), F.lit(hash_threshold(frac))
            ).otherwise(thr)
        )
    return df.filter(_bucket(key_cols, salt) < thr)


def weighted_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, top-``n``
    by the Efraimidis–Spirakis A-Res key (VLDB '06): each row draws
    ``u = uniform(0,1]`` from its content hash and ranks by
    ``u^(1/w)`` — the global top-``n`` is a weighted sample where a
    row's inclusion probability is proportional to its weight.

    Same determinism contract as ``hash_sample``: ``u`` comes from
    md5(key ∥ salt), so re-runs and other engines select identical
    rows. Rows with non-positive or null weight never qualify.

    Scale: ``orderBy(...).limit(n)`` compiles to TakeOrderedAndProject
    — each partition keeps its local top-``n`` and only those tiny
    heaps reach the driver; no global sort materializes.
    """
    u = (
        F.conv(_bucket(key_cols, salt), 16, 10).cast("double") + 0.5
    ) / float(_SPACE)
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.pow(u, 1.0 / w)).otherwise(F.lit(None))
    return (
        df.withColumn("_ares_key", key)
        .filter(F.col("_ares_key").isNotNull())
        .orderBy(
            F.desc("_ares_key"),
            *[F.col(c) for c in key_cols],  # total order for ties
        )
        .limit(n)
        .drop("_ares_key")
    )


def split_assign(
    df: DataFrame,
    key_cols: list[str],
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, leak-free train/val/test assignment: each key's
    md5 bucket lands in one of the consecutive [0, 1) intervals defined
    by ``fractions`` (insertion order = interval order), and the row
    gets that split's name in ``split_col``.

    Leak-free by construction: rows sharing the SAME key always land
    in the same split (dedup/decontaminate first, or key on the dedup
    component id), re-runs and other engines agree row-for-row, and
    growing the corpus never moves an existing key between splits.
    If the fractions sum to < 1 the remaining keys get NULL
    (unassigned — an explicit holdout pool); summing to > 1 raises.

    Pure narrow projection — no shuffle, pushes through any plan.
    """
    total = 0.0
    bounds: list[tuple[str, str]] = []
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction {frac} for split {name!r} outside [0, 1]")
        total += frac
        # float accumulation guard: 0.8+0.1+0.1 = 0.9999999999999999,
        # which would leave bucket 'ffffffff' keys NULL — snap to 1.0
        eff = 1.0 if total >= 1.0 - 1e-9 else total
        bounds.append((hash_threshold(min(eff, 1.0)), name))
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = _bucket(key_cols, salt)
    col = F.lit(None).cast("string")
    for thr, name in reversed(bounds):
        col = F.when(bucket < F.lit(thr), F.lit(name)).otherwise(col)
    return df.withColumn(split_col, col)


def mixture_resample(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    text_col: str = "text",
    target_tokens: int = 1_000_000,
    alpha: float = 0.7,
    salt: str = "",
) -> DataFrame:
    """Resample a corpus toward a token budget under temperature-scaled
    domain weights — the step that turns :func:`textstats.domain_mixture`'s
    PLAN into an actual training mix.

    Per domain, the keep-fraction is
    ``min(1, round(sample_weight, 6) * target_tokens / n_tokens)``
    (domains whose weighted share exceeds their size keep everything —
    upsampling is left to epoch repetition, not row duplication), and
    rows are kept by the same deterministic md5-bucket rule as
    :func:`hash_sample`, so the mix is reproducible row-for-row across
    runs and engines.

    Scale shape: one aggregation for the mixture table (tiny — one row
    per domain), broadcast back onto the corpus, then a pure
    projection+filter — no shuffle of the corpus itself. Returns the
    kept rows of ``df`` unchanged.
    """
    from curw_flo2d_data_manager_spark.operators.textstats import domain_mixture

    mix = domain_mixture(df, group_cols, text_col, alpha)
    # A domain whose every text normalizes to empty has n_tokens = 0:
    # the division would be NULL (÷0 → NULL without ANSI), silently
    # dropping the whole domain (round-5 advice). Such rows cost
    # nothing against the token budget, so keep them all — explicit,
    # not an arithmetic accident.
    rates = mix.select(
        *group_cols,
        F.when(
            F.col("n_tokens") > 0,
            F.least(
                F.lit(1.0),
                F.col("sample_weight")
                * F.lit(float(target_tokens))
                / F.col("n_tokens"),
            ),
        )
        .otherwise(F.lit(1.0))
        .alias("_keep_frac"),
    )
    # Column-expression form of hash_threshold: frac >= 1 -> "g" (sorts
    # after every hex bucket, keep-all); else 8-hex truncation.
    thr = F.when(F.col("_keep_frac") >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.hex((F.col("_keep_frac") * F.lit(_SPACE)).cast("bigint"))),
            8,
            "0",
        )
    )
    return (
        df.join(F.broadcast(rates), group_cols)
        .filter(_bucket(key_cols, salt) < thr)
        .select(*df.columns)
    )


def _thr_col(frac: Column) -> Column:
    """Column form of :func:`hash_threshold`: frac >= 1 -> 'g' (sorts
    after every hex bucket, keep-all); else 8-hex truncation."""
    return F.when(frac >= 1.0, F.lit("g")).otherwise(
        F.lpad(F.lower(F.hex((frac * F.lit(_SPACE)).cast("bigint"))), 8, "0")
    )


def materialize_mixture(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    text_col: str = "text",
    target_tokens: int = 1_000_000,
    alpha: float = 0.7,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize :func:`textstats.epoch_plan` into the PHYSICAL
    training mix: oversized domains keep a deterministic md5-selected
    subset once; undersized domains repeat whole — ⌊epochs⌋ full
    passes plus an md5-selected fractional pass — and every output row
    carries its 1-based ``epoch_col``, so downstream chunk/pack stages
    see exactly the token mass the plan prescribed.

    Determinism contract as everywhere in this module: the selected
    sets derive from md5 of the row's keys (the fractional-epoch draw
    salts the key with ':epoch' so it is independent of the
    downsampling draw); re-runs and other engines agree row-for-row.

    Scale shape: the per-domain plan is a tiny broadcast; copies per
    row is a Column expression and the only data movement is the
    explode of at most ⌈epochs⌉ copies — no shuffle of the corpus.
    """
    from curw_flo2d_data_manager_spark.operators.textstats import epoch_plan

    plan = epoch_plan(df, group_cols, text_col, target_tokens, alpha)
    rates = plan.select(*group_cols, "keep_fraction", "epochs")
    joined = df.join(F.broadcast(rates), group_cols)
    sel_keep = _bucket(key_cols, salt) < _thr_col(F.col("keep_fraction"))
    frac = F.col("epochs") - F.floor(F.col("epochs"))
    sel_extra = _bucket(key_cols, salt + ":epoch") < _thr_col(frac)
    copies = (
        F.when(F.col("keep_fraction") < 1.0, sel_keep.cast("int"))
        .otherwise(F.floor("epochs").cast("int") + sel_extra.cast("int"))
    )
    return (
        joined.withColumn(
            epoch_col,
            F.explode(
                F.when(
                    copies >= 1, F.sequence(F.lit(1), copies)
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .select(*df.columns, epoch_col)
    )


def domain_cap(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    cap: int,
    keep_only: bool = True,
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Per-domain document cap — the crawl-pipeline step that stops a
    handful of giant hosts from dominating a training mix: keep at
    most ``cap`` rows per ``group_cols`` group, best-first by
    ``order_cols`` (e.g. a quality score descending, id ascending for
    determinism).

    Scale shape: the ``row_number() <= cap`` pattern triggers Spark's
    InferWindowGroupLimit — a Partial WindowGroupLimit BELOW the
    exchange cuts each map partition to its own top-``cap`` per
    domain, so a skewed domain with 10⁹ pages ships at most
    cap·num_partitions rows into its reducer instead of all of them.
    With ``keep_only=False`` every row survives, annotated with
    ``rank_col`` (NULL-free; rows past the cap keep their true rank)
    — note the annotate path ranks ALL rows, so the group-limit
    pruning applies only when ``keep_only=True``.
    """
    if cap < 1:
        raise ValueError(f"need cap >= 1, got {cap}")
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    if keep_only:
        return ranked.filter(F.col(rank_col) <= cap).drop(rank_col)
    return ranked.withColumn("over_cap", F.col(rank_col) > cap)


def quantile_normalize(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    out_col: str = "score_norm",
) -> DataFrame:
    """Per-domain quantile normalization of a quality score — the
    cross-source calibration step of a filtering pipeline: a raw
    score's scale differs by domain (a fastText classifier runs hot
    on web text, cold on code), so thresholding the RAW score skews
    the mix. ``out_col`` is the score's percent rank WITHIN its
    domain (0 = worst, 1 = best, ``percent_rank`` semantics: ties
    share the rank of their first row), so one global threshold keeps
    the same quantile of every domain.

    Scale shape: one shuffle on the domain key and a streaming rank —
    no per-group materialization. NULL scores get a NULL rank AND are
    excluded from the denominator/offsets, so the normalized values
    of the real scores are identical whether or not unscored rows are
    present (a naive ``percent_rank`` would let NULLs — which sort
    first — shift every rank).

    The rank orders by the score ALONE — deliberately no tiebreak
    column: tied scores share a rank only when the ORDER BY treats
    them as equal, which is both what calibration wants (equal
    quality ⇒ equal normalized score) and what makes the output
    deterministic under any partitioning. A single-scored-row domain
    normalizes to 0.0 (``percent_rank`` convention).
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(score_col))
    wp = Window.partitionBy(*group_cols)
    n_nulls = F.count(F.when(F.col(score_col).isNull(), 1)).over(wp)
    n_valid = F.count(score_col).over(wp)
    # NULLs sort first (Spark ASC default), occupying ranks 1..n_nulls:
    # subtract them so ranks run 1..n_valid over the scored rows only
    pr = F.coalesce(
        F.try_divide(F.rank().over(w) - n_nulls - 1, n_valid - 1),
        F.lit(0.0),
    )
    return df.withColumn(
        out_col, F.when(F.col(score_col).isNotNull(), pr)
    )


def zscore_normalize(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    out_col: str = "score_z",
) -> DataFrame:
    """Per-domain z-score calibration — the parametric sibling of
    :func:`quantile_normalize`: ``z = (x − μ_g) / σ_g`` with the
    group's population mean/stddev. Useful when the downstream
    threshold is expressed in standard deviations ("keep everything
    above −1σ of its own domain") rather than quantiles.

    Scale shape: one partial aggregate to |groups| rows, broadcast
    back onto the UNSHUFFLED fact — the corpus never moves (the
    seasonal_baseline pattern), vs. a window formulation that would
    shuffle every row on the domain key. Degenerate groups (σ = 0 or
    a single row) and NULL scores yield NULL.
    """
    stats = df.groupBy(*group_cols).agg(
        F.avg(score_col).alias("_mu"),
        F.stddev_pop(score_col).alias("_sigma"),
    )
    z = F.when(
        F.col("_sigma") > 0.0,
        (F.col(score_col) - F.col("_mu")) / F.col("_sigma"),
    )
    return (
        df.join(F.broadcast(stats), group_cols, "left")
        .withColumn(out_col, z)
        .drop("_mu", "_sigma")
    )


def robust_scale(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    out_col: str = "score_robust",
) -> DataFrame:
    """Per-domain median/MAD calibration — the outlier-resistant
    sibling of :func:`zscore_normalize`: ``r = (x − median_g) /
    MAD_g`` with the group's exact median and median absolute
    deviation. A handful of pathological documents (one 10 MB page in
    a small domain) drag μ and σ arbitrarily far; the median/MAD pair
    has a 50% breakdown point, so the calibration a filter threshold
    sees is the one the TYPICAL document defines.

    Scale shape: two partial aggregates (the median, then the median
    of absolute deviations around it), each reduced to |groups| rows
    and broadcast back onto the UNSHUFFLED fact — the corpus never
    moves. Exact medians use Spark's ``percentile`` buffer (a
    value→count map merged across partitions), so the aggregate's
    shuffle cost scales with DISTINCT score values per group, not
    rows — bounded for integer-ish signals (lengths, token counts);
    for continuous scores at extreme cardinality, quantize first or
    fall back to :func:`quantile_normalize`'s rank formulation.
    Degenerate groups (MAD = 0) and NULL scores yield NULL.
    """
    v = F.col(score_col).cast("double")
    med = df.groupBy(*group_cols).agg(F.median(v).alias("_med"))
    with_med = df.join(F.broadcast(med), group_cols, "left")
    mad = with_med.groupBy(*group_cols).agg(
        F.median(F.abs(v - F.col("_med"))).alias("_mad")
    )
    r = F.when(F.col("_mad") > 0.0, (v - F.col("_med")) / F.col("_mad"))
    return (
        with_med.join(F.broadcast(mad), group_cols, "left")
        .withColumn(out_col, r)
        .drop("_med", "_mad")
    )
