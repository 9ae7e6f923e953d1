"""Deterministic sampling: layout independence, rates, split hygiene."""

from pyspark.sql import functions as F

from hexspark.sample import (
    BPS_SCALE, deterministic_sample, sample_hash, train_test_split,
)


def test_sample_layout_independent(spark):
    """Membership is a pure key function: any repartitioning yields
    the IDENTICAL sample (the property df.sample() lacks)."""
    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    s1 = {r["k"] for r in deterministic_sample(df, "k", 1000).collect()}
    s2 = {
        r["k"]
        for r in deterministic_sample(df.repartition(13), "k", 1000).collect()
    }
    assert s1 == s2 and s1
    # realized rate within 10% relative of 10%
    assert abs(len(s1) / 20000 - 0.10) < 0.01


def test_stratified_rates(spark):
    df = spark.range(0, 30000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("other").alias("lang"),
    )
    out = deterministic_sample(
        df, "k", rate_bps=2000, strata_col="lang", strata_bps={"en": 500}
    )
    rates = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["en"] / 10000 - 0.05) < 0.01
    assert abs(rates["other"] / 20000 - 0.20) < 0.015


def test_train_test_split_partition_and_stability(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    train, test = train_test_split(df, "k", test_bps=2000)
    tr = {r["k"] for r in train.collect()}
    te = {r["k"] for r in test.collect()}
    assert tr | te == set(range(5000)) and not (tr & te)
    # appending rows never moves old rows between splits
    df2 = spark.range(0, 6000).select(F.col("id").alias("k"))
    _, te2 = train_test_split(df2, "k", test_bps=2000)
    assert {k for k in te2.toPandas()["k"] if k < 5000} == te


def test_sample_then_split_not_degenerate(spark):
    """Composing sample → split must NOT be degenerate: with the old
    shared draw, test_bps <= rate_bps put 100% of the sample in test.
    Distinct default salts decorrelate the two selections."""
    from hexspark.sample import deterministic_sample, train_test_split

    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    sampled = deterministic_sample(df, "k", rate_bps=1000)  # salt 0
    train, test = train_test_split(sampled, "k", test_bps=1000)  # salt 1
    n_s, n_tr, n_te = sampled.count(), train.count(), test.count()
    assert n_tr + n_te == n_s
    # test share of the sample ≈ 10%, not 100%
    assert 0.05 < n_te / n_s < 0.20
    # explicit same-salt composition IS degenerate (documented hazard)
    _, te_same = train_test_split(sampled, "k", test_bps=1000, salt=0)
    assert te_same.count() == n_s


def test_sample_hash_range(spark):
    mx = spark.range(0, 100000).select(
        F.max(sample_hash(F.col("id"))).alias("mx"),
        F.min(sample_hash(F.col("id"))).alias("mn"),
    ).collect()[0]
    assert 0 <= mx["mn"] and mx["mx"] < BPS_SCALE


# ---------------------------------------------------------------------------
# sequence packing / blocklist
# ---------------------------------------------------------------------------

def test_pack_sequences_invariants(spark):
    """Per-shard stream is gapless and seq ids are exact chunk math."""
    from hexspark.sample import pack_sequences

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") % 37) + 1).alias("toks")
    )
    out = pack_sequences(
        df, key_col="k", tokens_col=F.col("toks"), budget=64, shards=4
    ).collect()
    assert len(out) == 500
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["k"])):
        # gapless concatenation: each doc starts where the previous ended
        assert r["tok_start"] == by_shard.get(r["shard"], 0)
        by_shard[r["shard"]] = r["tok_start"] + r["toks"]
        assert r["seq_id"] == r["tok_start"] // 64
    assert set(by_shard) == {0, 1, 2, 3}


def test_pack_sequences_layout_independent(spark):
    """Packing is a pure key function: repartitioning must not move a
    single document to a different shard/sequence/offset."""
    from hexspark.sample import pack_sequences

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 50 + 1).alias("toks")
    )
    a = pack_sequences(df, "k", F.col("toks"), budget=128, shards=8)
    b = pack_sequences(
        df.repartition(13, "toks"), "k", F.col("toks"), budget=128, shards=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_filter_blocklist_anti_join(spark):
    """Blocked domains vanish, everything else survives untouched, and
    the executed plan broadcasts the blocklist (corpus side must not
    shuffle for a 10^4-domain list)."""
    from hexspark.sample import filter_blocklist

    pages = spark.range(0, 300).select(
        F.col("id").alias("page_key"),
        F.concat(
            F.lit("https://src"), (F.col("id") % 10).cast("string"),
            F.lit(".example.org/p/"), F.col("id").cast("string"),
        ).alias("url"),
    )
    blocked = spark.createDataFrame(
        [("src2.example.org",), ("src7.example.org",)], ["domain"]
    )
    kept = filter_blocklist(pages, blocked)
    rows = kept.collect()
    assert len(rows) == 300 - 60
    assert not {r["domain"] for r in rows} & {
        "src2.example.org", "src7.example.org"
    }
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def _draw(key: int, salt: int = 3) -> int:
    from hexspark.sample import LEHMER_MOD, BPS_SCALE, _salt_mult

    return (key % LEHMER_MOD) * _salt_mult(salt) % LEHMER_MOD % BPS_SCALE


def test_mix_by_token_budget_hand_computed(spark):
    """Two equal-weight groups, 10:1 token imbalance: the scarce group
    is binding (kept in FULL), the big one keeps exactly the rate that
    equalizes kept mass; membership matches the pure-python draw."""
    from hexspark.sample import mix_by_token_budget

    rows = [(i, "A", 10) for i in range(10)]          # T_A = 100
    rows += [(100 + i, "B", 10) for i in range(100)]  # T_B = 1000
    df = spark.createDataFrame(rows, ["doc_id", "grp", "toks"])
    out = mix_by_token_budget(
        df, "doc_id", "grp", "toks", {"A": 5000, "B": 5000}
    )
    got = {(r["doc_id"], r["grp"]) for r in out.collect()}
    # budget = min(100*10^4 DIV 5000, 1000*10^4 DIV 5000) = 200
    # rate_A = 200*5000 DIV 100 = 10000 (all); rate_B = ... DIV 1000 = 1000
    expect = {(i, "A") for i in range(10)}
    expect |= {(k, "B") for k in range(100, 200) if _draw(k) < 1000}
    assert got == expect
    assert len({g for _, g in got if g == "B"}) > 0  # rate not degenerate


def test_mix_by_token_budget_drops_unweighted_groups(spark):
    """Groups missing from the weights (or weighted 0) vanish; a
    weighted group absent from the corpus doesn't poison the budget."""
    from hexspark.sample import mix_by_token_budget

    rows = [(i, ["keep", "junk", "zero"][i % 3], 5) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "toks"])
    out = mix_by_token_budget(
        df, "doc_id", "grp", "toks",
        {"keep": 10000, "zero": 0, "ghost": 4000},
    )
    rows_out = out.collect()
    assert {r["grp"] for r in rows_out} == {"keep"}
    # keep is the only participating group → binding → kept in full
    assert len(rows_out) == 20


def test_group_quantile_filter_planted(spark):
    """Per-group median gate: each group keeps its upper half
    (inclusive of the interpolated threshold); groups don't interact."""
    from hexspark.sample import group_quantile_filter

    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "a", 40),
        (5, "b", 1), (6, "b", 100),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "q"])
    got = {
        r["doc_id"]: r
        for r in group_quantile_filter(
            df, F.col("q").cast("long"), 5000, "source"
        ).collect()
    }
    # group a: median = 25 -> keep 30, 40; group b: median 50.5 -> keep 100
    assert set(got) == {3, 4, 6}
    assert got[3]["group_thr"] == 25.0 and got[6]["group_thr"] == 50.5
    # approx mode runs and returns a subset containing the clear keeps
    ap = {
        r["doc_id"]
        for r in group_quantile_filter(
            df, F.col("q").cast("long"), 5000, "source", mode="approx"
        ).collect()
    }
    assert {4, 6} <= ap


def test_cap_per_tile_planted(spark):
    """At most k keys per tile, deterministic under repartition, and
    the kept set is the k lowest draws."""
    from hexspark.sample import cap_per_tile, sample_hash, CAP_TILE_SALT
    from hexspark import synth

    pages = spark.range(500).select(
        F.col("id").alias("page_key"),
        synth.cell_from_key(F.col("id") % 7, 6).alias("cell"),
    )
    got = cap_per_tile(pages, k=3, tile_res=2).collect()
    by_tile = {}
    for r in got:
        by_tile.setdefault(r["tile"], []).append(r["page_key"])
    assert all(len(v) <= 3 for v in by_tile.values())
    assert len(got) > 0
    # layout independence
    again = cap_per_tile(pages.repartition(13), k=3, tile_res=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # kept = lowest draws within each tile
    full = pages.select(
        synth.cell_from_key(F.col("page_key") % 7, 6).alias("c"),
        "page_key",
        sample_hash(F.col("page_key"), salt=CAP_TILE_SALT).alias("d"),
    ).collect()
    from hexspark import cells_np as cnp
    import numpy as np
    want = {}
    for r in full:
        t = int(cnp.to_parent(np.array([r["c"]]), 2)[0])
        want.setdefault(t, []).append((r["d"], r["page_key"]))
    for t, lst in want.items():
        keep = [k for _, k in sorted(lst)[:3]]
        assert sorted(by_tile[t]) == sorted(keep)
