"""Stage checkpointing with per-partition lineage + metrics, resumable.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics".  Each pipeline stage materializes to Parquet next to a
manifest JSON recording per-partition (file) row/byte counts and the
stage's input lineage; a re-entrant run skips stages whose manifest is
complete.  No Spark internals — stage boundaries are plain
``df.write.parquet``, per-partition metrics come from the Parquet
footers (zero extra passes), and skipping is a manifest check.

Quarantine rows (invalid cells — the ``Error::Index`` analogue,
/root/reference/src/error.rs:7-10) are counted into the manifest when a
stage declares them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_hexspark_manifest.json"


def _partition_metrics(spark: SparkSession, path: str) -> list[dict]:
    """Per-partition lineage from the written Parquet files themselves."""
    jvm_files = [
        f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith("_")
    ]
    out = []
    import pyarrow.parquet as pq

    for f in sorted(jvm_files):
        p = os.path.join(path, f)
        md = pq.ParquetFile(p).metadata
        out.append({
            "file": f,
            "rows": md.num_rows,
            "bytes": os.path.getsize(p),
            "row_groups": md.num_row_groups,
        })
    return out


class Checkpointer:
    """Re-entrant stage runner.

    >>> ck = Checkpointer(spark, "/tmp/pipe1")
    >>> pages = ck.stage("pages", lambda: synth_pages(...))
    >>> joined = ck.stage("assign", lambda: assign_regions(pages, ...),
    ...                   inputs=["pages"])

    A completed stage (manifest present + ``complete``) is *read back*
    instead of recomputed; a crashed run resumes at the first
    incomplete stage.  Write-then-rename of the manifest makes stage
    completion atomic at the filesystem level.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        d = os.path.join(self.root, name)
        return d, os.path.join(d, MANIFEST)

    def is_complete(self, name: str) -> bool:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            return json.load(f).get("complete", False)

    def manifest(self, name: str) -> Optional[dict]:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        inputs: Optional[list[str]] = None,
        quarantine_fn: Optional[Callable[[], DataFrame]] = None,
        mode: str = "overwrite",
    ) -> DataFrame:
        d, mpath = self._paths(name)
        if self.is_complete(name):
            return self.spark.read.parquet(d)
        t0 = time.time()
        df = fn()
        df.write.mode(mode).parquet(d)
        parts = _partition_metrics(self.spark, d)
        quarantined = None
        if quarantine_fn is not None:
            qd = os.path.join(self.root, f"{name}__quarantine")
            qdf = quarantine_fn()
            qdf.write.mode(mode).parquet(qd)
            quarantined = sum(m["rows"] for m in _partition_metrics(self.spark, qd))
        man = {
            "stage": name,
            "inputs": inputs or [],
            "complete": True,
            "wall_sec": round(time.time() - t0, 3),
            "rows": sum(m["rows"] for m in parts),
            "bytes": sum(m["bytes"] for m in parts),
            "n_partitions": len(parts),
            "partitions": parts,
            "quarantined_rows": quarantined,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, mpath)  # atomic completion marker
        return self.spark.read.parquet(d)

    def lineage(self) -> dict[str, dict]:
        """All stage manifests keyed by stage name."""
        out = {}
        for name in sorted(os.listdir(self.root)):
            m = self.manifest(name)
            if m:
                out[name] = m
        return out
