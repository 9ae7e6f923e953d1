"""Deterministic corpus sampling / splitting for training-data pipelines.

``df.sample()`` is seed-stable only for a FIXED partitioning — a
repartition, AQE re-plan, or file-split change reshuffles which rows
the Bernoulli draw hits, so two runs of "the same 10% sample" diverge.
Training pipelines need content-addressed sampling: membership decided
by a pure function of the ROW KEY, independent of physical layout, so
a sample is reproducible across runs, engines, cluster sizes, and
incremental re-ingests (a new file never changes which OLD rows are
in-sample).

Mechanics: Park–Miller/Lehmer hash ``(key * 48271) % (2^31 - 1)``,
then a basis-point threshold.  Pure int64 arithmetic — exact in Spark
(ANSI-safe for keys < ~1.9e14) and in any SQL engine, which is what
makes the DuckDB oracle bit-exact.  The multiplier is a full-period
MLCG root, so consecutive keys land uniformly: per-stratum realized
rates converge to the requested basis points.

At 100 TB this is the cheapest possible operator: one scan, a filter
of two integer ops pushed into whole-stage codegen, no shuffle.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEHMER_MULT = 48271
LEHMER_MOD = 2_147_483_647  # 2^31 - 1, Park–Miller modulus
BPS_SCALE = 10_000


def _salt_mult(salt: int) -> int:
    """Per-salt multiplier ``48271^(salt+1) mod p``.  The salt must
    enter MULTIPLICATIVELY: any affine-in-key variation (adding
    ``salt·C`` anywhere) makes two salted draws differ by a CONSTANT
    mod p, i.e. a pure rotation — composed threshold sets would be
    deterministically shifted (e.g. a 10% sample and a 10% test split
    perfectly disjoint or perfectly nested), not independent.  A
    different full-period multiplier per salt scrambles the low
    digits (measured pairwise correlation ~1e-4, joint rate =
    product rate)."""
    return pow(LEHMER_MULT, salt + 1, LEHMER_MOD)


def lehmer_hash(key: Column, salt: int = 0) -> Column:
    """Full-range Lehmer draw in [0, 2^31-1) — the pre-basis-point
    value :func:`sample_hash` reduces.  Exposed for uses that need a
    uniform modulus other than 10^4 (e.g. shard assignment in
    :func:`pack_sequences`, where ``draw % shards`` must be uniform
    for any shard count, not only divisors of 10^4)."""
    return (key.cast("long") % LEHMER_MOD) * _salt_mult(salt) % LEHMER_MOD


def dd_lehmer_hash(key: str, salt: int = 0) -> str:
    return f"((({key} % {LEHMER_MOD}) * {_salt_mult(salt)}) % {LEHMER_MOD})"


def sample_hash(key: Column, salt: int = 0) -> Column:
    """Layout-independent per-row draw in [0, 10000) from a
    non-negative integer key.  The key is reduced mod p BEFORE the
    multiply, so the arithmetic fits int64 for any i64 key under ANSI
    mode (keys differing by exactly p = 2^31-1 share a draw — harmless
    for rate-based selection).

    ``salt`` decorrelates INDEPENDENT uses of the draw on the same key
    space (see :func:`_salt_mult`): :func:`deterministic_sample`
    defaults to salt 0, :func:`train_test_split` to salt 1, so
    splitting a sample is not degenerate."""
    return lehmer_hash(key, salt) % BPS_SCALE


def dd_sample_hash(key: str, salt: int = 0) -> str:
    """DuckDB twin of :func:`sample_hash` (identical int arithmetic)."""
    return f"({dd_lehmer_hash(key, salt)} % {BPS_SCALE})"


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate_bps: int = 1000,
    strata_col: Optional[str] = None,
    strata_bps: Optional[Mapping[str, int]] = None,
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff its key-hash draw falls under the rate.

    ``rate_bps``: flat rate in basis points (1000 = 10%).  With
    ``strata_col`` + ``strata_bps`` the rate is per stratum (e.g.
    downsample dominant languages harder: ``{"en": 500, "de": 2000}``),
    unlisted strata falling back to ``rate_bps`` — the standard
    rebalancing step before training-corpus assembly.  Pass distinct
    ``salt`` values when composing several samples over one key space
    (see :func:`sample_hash`)."""
    draw = sample_hash(F.col(key_col), salt)
    if strata_col is None:
        return df.filter(draw < rate_bps)
    thr: Column = F.lit(rate_bps)
    for value, bps in sorted((strata_bps or {}).items()):
        thr = F.when(F.col(strata_col) == value, F.lit(bps)).otherwise(thr)
    return df.filter(draw < thr)


def dd_deterministic_sample(
    select_cols: str,
    from_table: str,
    key: str,
    rate_bps: int,
    strata_col: Optional[str] = None,
    strata_bps: Optional[Mapping[str, int]] = None,
    salt: int = 0,
) -> str:
    """DuckDB twin of :func:`deterministic_sample` as a full SELECT."""
    draw = dd_sample_hash(key, salt)
    # `not strata_bps` mirrors the Spark twin: strata_col with an
    # empty/None rate map degrades to the flat rate there, while a
    # zero-WHEN CASE here would be invalid SQL
    if strata_col is None or not strata_bps:
        thr = str(rate_bps)
    else:
        whens = " ".join(
            f"WHEN {strata_col} = '{v}' THEN {b}"
            for v, b in sorted((strata_bps or {}).items())
        )
        thr = f"(CASE {whens} ELSE {rate_bps} END)"
    return f"SELECT {select_cols} FROM {from_table} WHERE {draw} < {thr}"


def train_test_split(
    df: DataFrame, key_col: str, test_bps: int = 1000, salt: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, leakage-free (train, test) split: the draw is a
    pure key function, so the same document can never migrate between
    splits across runs or repartitions (the property random splits
    lose the moment the pipeline is re-run on appended data).

    Default ``salt=1`` ≠ deterministic_sample's 0, so splitting a
    deterministic sample is NOT degenerate (with a shared salt the
    test split would be exactly the sample's low-draw rows)."""
    draw = sample_hash(F.col(key_col), salt)
    return df.filter(draw >= test_bps), df.filter(draw < test_bps)


def cap_per_domain(
    pages: DataFrame,
    k: int,
    key_col: str = "page_key",
    url_col: str = "url",
) -> DataFrame:
    """Repetition control: keep at most ``k`` pages per domain —
    the standard guard against a single crawl domain dominating the
    corpus.  Selection is deterministic and layout-independent: the
    kept pages are the ``k`` lowest key-hash draws (salt 2 — composes
    with sampling/splitting, see :func:`sample_hash`), key tie-break.

    Scale shape: draw-threshold top-k (hexspark.topk
    ``topk_per_key_by_draw``) keyed on the domain — the per-domain
    count agg broadcasts a draw threshold back as a codegen filter, so
    the exchange carries ~``safety × k`` rows per domain instead of the
    whole corpus, and a mega-domain's pages never funnel into one
    reducer the way a ``row_number().over(partitionBy(domain))``
    window would.  Falls back to the plain two-phase form past the
    counts broadcast budget.  Returns (domain, rank, key)."""
    from .text import domain_of
    from .topk import topk_per_key_by_draw

    df = pages.withColumn("domain", domain_of(F.col(url_col)))
    return topk_per_key_by_draw(
        df,
        keys=["domain"],
        draw=sample_hash(F.col(key_col), salt=2),
        order_tail=[F.col(key_col)],
        payload=[key_col],
        k=k,
    )


PACK_SALT = 3  # composes with sample(0) / split(1) / cap(2)


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: Column,
    budget: int,
    shards: int = 64,
    salt: int = PACK_SALT,
) -> DataFrame:
    """Token-budget sequence packing — the pretraining assembly step:
    concatenate documents in a deterministic order and cut the token
    stream into ``budget``-sized training sequences.  Returns
    ``(key_col, shard, seq_id, tok_start, toks)`` where ``tok_start``
    is the document's offset in its shard's token stream and
    ``seq_id = tok_start DIV budget`` — exactly the
    concat-then-chunk semantics (a document may straddle sequences;
    its seq is where it STARTS), in pure int64.

    Scale shape: a global concatenation order would serialize 10^12
    docs through one reducer's running sum, so the stream is split
    into ``shards`` independent streams by a salted Lehmer draw on the
    key (layout-independent → the packing is reproducible across
    runs/engines/cluster sizes).  Each shard's cumulative sum is ONE
    window per shard — pick ``shards`` ≈ a few × cluster parallelism
    so a shard's rows fit a task (the window sorts only within its
    shard).  Within a shard the order is ascending key: deterministic
    and stable under re-partitioning."""
    from pyspark.sql import Window

    shard = (lehmer_hash(F.col(key_col), salt) % shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(F.col(key_col), tokens_col.alias("toks"), shard)
    out = out.withColumn("tok_end", F.sum("toks").over(w))
    tok_start = (F.col("tok_end") - F.col("toks")).alias("tok_start")
    return out.select(
        key_col,
        "shard",
        F.expr(f"(tok_end - toks) DIV {budget}").alias("seq_id"),
        tok_start,
        "toks",
    )


def dd_pack_sequences(
    source_sql: str,
    key: str,
    toks_expr: str,
    budget: int,
    shards: int = 64,
    salt: int = PACK_SALT,
) -> str:
    """DuckDB twin of :func:`pack_sequences` (``source_sql`` is a
    relation exposing ``key``; SUM OVER returns HUGEINT in DuckDB —
    cast back to BIGINT before the integer division)."""
    shard = f"({dd_lehmer_hash(key, salt)} % {shards})"
    return f"""
        WITH src AS (
            SELECT {key}, {toks_expr} AS toks, {shard} AS shard
            FROM ({source_sql})
        ),
        cum AS (
            SELECT {key}, toks, shard,
                   CAST(SUM(toks) OVER (
                     PARTITION BY shard ORDER BY {key}
                     ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS tok_end
            FROM src
        )
        SELECT {key}, shard, (tok_end - toks) // {budget} AS seq_id,
               tok_end - toks AS tok_start, toks
        FROM cum
    """


def filter_blocklist(
    pages: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose URL host is on a domain blocklist (spam /
    adult / malware lists — the first cut of crawl curation).
    ``blocked_domains`` must expose a ``domain`` column.

    Scale shape: blocklists are 10^4-10^6 domains against a 10^12-page
    corpus — broadcast LEFT ANTI join, the corpus never shuffles and
    the filter runs map-side.  The domain is parsed once with the
    native regex (codegen) before the join."""
    from .text import domain_of

    df = pages.withColumn("domain", domain_of(F.col(url_col)))
    return df.join(
        F.broadcast(blocked_domains.select("domain").distinct()),
        on="domain",
        how="left_anti",
    )


def dd_cap_per_domain(pages_cte: str, k: int, key: str = "page_key") -> str:
    """DuckDB twin of :func:`cap_per_domain` (ROW_NUMBER form — valid
    as an oracle, wrong as the engine plan; see the two-phase note)."""
    from .text import dd_domain_of

    draw = dd_sample_hash(key, salt=2)
    dom = dd_domain_of("url")
    return f"""
        WITH pages AS ({pages_cte})
        SELECT domain, rank, {key} FROM (
            SELECT {dom} AS domain, {key},
                   ROW_NUMBER() OVER (
                     PARTITION BY {dom} ORDER BY {draw} ASC, {key} ASC
                   ) AS rank
            FROM pages
        ) WHERE rank <= {k}
    """


def mix_by_token_budget(
    docs: DataFrame,
    key_col: str,
    group_col: str,
    token_col: "str | Column",
    weights_bps: Mapping[str, int],
    salt: int = 3,
) -> DataFrame:
    """Corpus mixing: downsample groups so the KEPT token mass hits the
    target mixture ``weights_bps`` (basis points per group), keeping
    the LARGEST corpus achievable by pure downsampling — the
    mixture-assembly step of training-corpus construction (the
    fixed-weight setting of DoReMi, Xie et al. 2023; standard practice
    since GPT-3/Pile, public).

    Mechanics (exact int64 arithmetic → bit-exact oracle): measure the
    per-group token mass ``T_g``; the achievable total budget is
    ``B = min_g (T_g · 10^4 DIV w_g)`` (the binding group — the one
    scarcest relative to its target — is kept in full); each group's
    keep rate is ``rate_g = min(10^4, B · w_g DIV T_g)`` basis points,
    applied with the layout-independent Lehmer draw on ``key_col``.
    Expected kept mass per group is ``B·w_g/10^4`` — proportions match
    the targets up to sampling noise.  Groups absent from
    ``weights_bps`` (or weighted 0) are DROPPED; groups named in the
    weights but absent from the corpus are ignored by the min.
    Int64 bound: raises past ``T_g · 10^4 > 9.2e18`` (a group holding
    >9·10^14 tokens — beyond any current corpus; switch the budget
    arithmetic to double there).

    Scale shape: ONE map-side-combinable groupBy on the (tiny-
    cardinality) group key — partial sums collapse per map task, so a
    dominant group cannot skew a reducer; the rates relation is
    |groups| rows, broadcast back — the corpus itself never shuffles,
    and the final filter is codegen-resident.  ``salt=3`` is the
    reserved mixing draw (0 sample / 1 split / 2 per-domain cap)."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w: Column = F.lit(None).cast("long")
    for value, bps in sorted(weights_bps.items()):
        w = F.when(F.col(group_col) == value, F.lit(bps)).otherwise(w)
    tot = (
        docs.groupBy(group_col)
        .agg(F.sum(tok.cast("long")).alias("t"))
        .withColumn("w", w)
        .filter(F.col("w").isNotNull() & (F.col("w") > 0) & (F.col("t") > 0))
    )
    budget = tot.agg(
        F.min(F.expr(f"t * {BPS_SCALE} DIV w")).alias("budget")
    )
    rates = tot.crossJoin(F.broadcast(budget)).select(
        group_col,
        F.least(
            F.lit(BPS_SCALE).cast("long"), F.expr("budget * w DIV t")
        ).alias("rate_bps"),
    )
    draw = sample_hash(F.col(key_col), salt)
    return (
        docs.join(F.broadcast(rates), on=group_col, how="inner")
        .filter(draw < F.col("rate_bps"))
        .drop("rate_bps")
    )


def dd_mix_by_token_budget(
    select_cols: str,
    from_table: str,
    key: str,
    group_expr: str,
    token_expr: str,
    weights_bps: Mapping[str, int],
    salt: int = 3,
) -> str:
    """DuckDB twin of :func:`mix_by_token_budget` (SUM(BIGINT) is
    HUGEINT in DuckDB — cast back before the integer division so //
    matches Spark's int64 DIV)."""
    whens = " ".join(
        f"WHEN '{v}' THEN {b}" for v, b in sorted(weights_bps.items())
    )
    draw = dd_sample_hash(key, salt)
    return f"""
        WITH src AS (SELECT *, {group_expr} AS grp FROM {from_table}),
        tot AS (
            SELECT grp, CAST(SUM({token_expr}) AS BIGINT) AS t,
                   (CASE grp {whens} ELSE NULL END) AS w
            FROM src GROUP BY 1
        ),
        tw AS (SELECT * FROM tot WHERE w IS NOT NULL AND w > 0 AND t > 0),
        b AS (SELECT MIN(t * {BPS_SCALE} // w) AS budget FROM tw),
        rates AS (
            SELECT grp, LEAST({BPS_SCALE}, budget * w // t) AS rate_bps
            FROM tw, b
        )
        SELECT {select_cols} FROM src d JOIN rates r USING (grp)
        WHERE {draw} < r.rate_bps
    """


def group_quantile_filter(
    df: DataFrame,
    score: Column,
    p_bps: int,
    group_col: str = "source",
    mode: str = "exact",
) -> DataFrame:
    """Per-group quantile gate: keep rows whose ``score`` is at or
    above their group's p-th quantile (``p_bps`` in basis points;
    5000 = median) — the 'drop the worst X% of every domain' curation
    filter, applied per group so one high-quality domain can't crowd
    out another.

    ``mode='exact'``: ``percentile()`` (exact interpolated — Spark's
    and DuckDB's quantile_cont share the 1+(n-1)p definition, and the
    threshold is rounded to 6 before the compare so the twin is
    hash-stable).  Exact percentile buffers each group's values in the
    aggregation state — bounded by the largest single GROUP, fine for
    domain-sized groups.  ``mode='approx'``: approx_percentile
    (KLL-sketch, fixed-size state, map-side combinable) — the 100-TB
    path when groups can be corpus-scale; not oracle-exact by nature.

    One combinable-or-sketch groupBy over the scored relation + a
    group-keyed join back (group cardinality ≪ rows — AQE broadcasts);
    the data relation never shuffles.
    """
    from .skew import widen_input

    scored = widen_input(df).withColumn("__score", score)
    p = p_bps / 10000.0
    if mode == "exact":
        agg = F.expr(f"percentile(__score, {p!r})")
    elif mode == "approx":
        agg = F.expr(f"approx_percentile(__score, {p!r})")
    else:
        raise ValueError(f"unknown mode {mode!r}")
    thr = scored.groupBy(group_col).agg(
        F.round(agg.cast("double"), 6).alias("__thr")
    )
    return (
        scored.join(thr, on=group_col)
        .filter(F.col("__score") >= F.col("__thr"))
        .withColumnRenamed("__score", "score")
        .withColumnRenamed("__thr", "group_thr")
    )


def dd_group_quantile_filter(
    select_cols: str,
    from_table: str,
    score_expr: str,
    p_bps: int,
    group_expr: str,
) -> str:
    """DuckDB twin of :func:`group_quantile_filter` (mode='exact')."""
    p = p_bps / 10000.0
    return f"""
        WITH src AS (
            SELECT *, {score_expr} AS score, {group_expr} AS grp
            FROM {from_table}
        ),
        thr AS (
            SELECT grp,
                   ROUND(CAST(quantile_cont(score, {p!r}) AS DOUBLE), 6)
                     AS group_thr
            FROM src GROUP BY 1
        )
        SELECT {select_cols} FROM src JOIN thr USING (grp)
        WHERE score >= group_thr
    """


CAP_TILE_SALT = 4  # composes with sample(0) / split(1) / cap(2) / pack(3)


def cap_per_tile(
    pages: DataFrame,
    k: int,
    tile_res: int,
    key_col: str = "page_key",
    cell_col: str = "cell",
) -> DataFrame:
    """Spatial density cap: keep at most ``k`` pages per res-
    ``tile_res`` tile — the geospatial analogue of
    :func:`cap_per_domain` (a spatially balanced training subset: a
    metro tile with 10^7 pages can't drown the long tail of sparse
    tiles).  Deterministic and layout-independent: the kept pages are
    the ``k`` lowest key-hash draws (salt 4 — composes with the other
    deterministic selectors), key tie-break.

    Same scale shape as the domain cap: draw-threshold top-k
    (``topk_per_key_by_draw``) keyed on the tile — the tile relation
    is bounded (≤ cells at ``tile_res``), so the count broadcast always
    fits and the exchange carries ~``safety × k`` rows per tile instead
    of the whole corpus; a mega-tile never funnels into one reducer.
    Returns (tile, rank, key).
    """
    from . import cells as cx
    from .topk import topk_per_key_by_draw

    from .geo import GRID_DIM

    df = pages.withColumn("tile", cx.to_parent(cell_col, tile_res))
    return topk_per_key_by_draw(
        df,
        keys=["tile"],
        draw=sample_hash(F.col(key_col), salt=CAP_TILE_SALT),
        order_tail=[F.col(key_col)],
        payload=[key_col],
        k=k,
        # static lattice bound on distinct tiles skips the gating
        # count() pass; full-suite A/B measured 5.65-5.72s with it vs
        # 6.7-7.3s without across seven runs (prefix-context runs
        # flipped the sign — position-dependent; the full suite is the
        # driver's measurement, so the bound stays)
        n_keys_bound=(GRID_DIM * GRID_DIM) * 7 ** tile_res,
    )


def dd_cap_per_tile(
    pages_cte: str, k: int, tile_res: int, key: str = "page_key"
) -> str:
    """DuckDB twin of :func:`cap_per_tile` (ROW_NUMBER oracle form)."""
    from . import synth

    draw = dd_sample_hash(key, salt=CAP_TILE_SALT)
    tile = synth.dd_to_parent("cell", tile_res)
    return f"""
        WITH pages AS ({pages_cte})
        SELECT tile, rank, {key} FROM (
            SELECT {tile} AS tile, {key},
                   ROW_NUMBER() OVER (
                     PARTITION BY {tile} ORDER BY {draw} ASC, {key} ASC
                   ) AS rank
            FROM pages
        ) WHERE rank <= {k}
    """
