"""Versioned table IO — the engine's replacement for the reference's SDFS
(sdfs/sdfs.go, operators B1–B5 in SURVEY.md §2B).

The reference hand-rolls replicated blob storage: PUT with write-quorum 2
(sdfs/sdfs-graph.go:15-61), GET picking the newest timestamp
(sdfs/sdfs.go:282-299), a 60 s write-write conflict window
(sdfs/sdfs.go:1004-1024). All of that is the table format's job. This module
targets an Iceberg catalog when one is configured and otherwise falls back to
a minimal snapshot-versioned Parquet layout:

    <root>/<name>/v=<k>/part-*.parquet      immutable snapshot k
    <root>/<name>/_latest                   atomic pointer (rename) to k

Readers always see a complete snapshot (last-write-wins on the pointer —
the same semantics the reference approximates with PUT timestamps);
``load(version=...)`` gives the reference's nowhere-implemented read-repair
story a strictly stronger time-travel answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog  # e.g. an Iceberg catalog name, when available

    # -- helpers ------------------------------------------------------------

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._dir(name), "_latest")

    def latest_version(self, name: str) -> int | None:
        ptr = self._pointer(name)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def versions(self, name: str) -> list[int]:
        d = self._dir(name)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(x.split("=")[1]) for x in os.listdir(d) if x.startswith("v=")
        )

    # -- SDFS op parity: PUT / GET / DELETE / LS ------------------------------

    def save(self, df: DataFrame, name: str) -> int:
        """PUT: write a new immutable snapshot, then atomically advance the
        pointer (rename — the quorum/conflict-window machinery collapses to
        one atomic metadata op)."""
        if self.catalog:
            df.writeTo(f"{self.catalog}.{name}").createOrReplace()
            return -1
        # next k from the RETAINED snapshot set, not the pointer: after a
        # rollback the pointer is older than the newest snapshot, and a new
        # PUT must not clobber a retained (immutable) version
        existing = self.versions(name)
        k = (existing[-1] if existing else 0) + 1
        path = os.path.join(self._dir(name), f"v={k}")
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer(name) + ".tmp"
        os.makedirs(self._dir(name), exist_ok=True)
        with open(tmp, "w") as f:
            f.write(str(k))
        os.replace(tmp, self._pointer(name))
        return k

    def load(self, name: str, version: int | None = None) -> DataFrame:
        """GET: newest snapshot by default; any retained snapshot by number.
        On the catalog branch, ``version`` maps to Spark's DSv2 time-travel
        read option (``versionAsOf`` — the ``VERSION AS OF`` SQL form), so
        both branches answer the same time-travel contract."""
        if self.catalog:
            reader = self.spark.read
            if version is not None:
                reader = reader.option("versionAsOf", version)
            return reader.table(f"{self.catalog}.{name}")
        k = version if version is not None else self.latest_version(name)
        if k is None:
            raise FileNotFoundError(f"table {name!r} has no snapshots under {self.root}")
        return self.spark.read.parquet(os.path.join(self._dir(name), f"v={k}"))

    def drop(self, name: str) -> None:
        """DELETE."""
        import shutil

        if self.catalog:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{name}")
            return
        shutil.rmtree(self._dir(name), ignore_errors=True)

    def snapshots(self, name: str) -> DataFrame:
        """Snapshot history, SAME ``(version, is_current)`` schema on BOTH
        branches (the SDFS design has no history at all — the table format's
        snapshot log is the strictly stronger answer). Catalog branch:
        Iceberg's ``<table>.snapshots`` metadata table normalized to the
        contract (``version`` = snapshot_id, ``is_current`` = matches the
        ``main`` branch ref), so a ``version`` read here is ALWAYS a valid
        ``rollback`` argument regardless of branch. Fallback: one row per
        retained ``v=<k>`` directory."""
        if self.catalog:
            t = f"{self.catalog}.{name}"
            return self.spark.sql(
                f"SELECT s.snapshot_id AS version, "
                f"s.snapshot_id = (SELECT r.snapshot_id FROM {t}.refs r "
                f"WHERE r.name = 'main') AS is_current "
                f"FROM {t}.snapshots s ORDER BY s.committed_at"
            )
        cur = self.latest_version(name)
        rows = [(k, k == cur) for k in self.versions(name)]
        return self.spark.createDataFrame(rows, "version long, is_current boolean")

    def rollback(self, name: str, version: int) -> None:
        """Roll the table's CURRENT pointer back to an older retained
        snapshot — metadata-only on both branches (snapshots are immutable).
        Catalog branch: Iceberg's ``rollback_to_snapshot`` procedure, after
        validating the snapshot_id actually exists in the table's snapshot
        log (same no-such-snapshot ValueError as the fallback, instead of a
        procedure-side failure with an Iceberg stack trace); fallback:
        atomically rewrite the ``_latest`` pointer. ``version`` means the
        SAME identifier ``snapshots()`` returned on the SAME branch."""
        if self.catalog:
            known = {r.version for r in self.snapshots(name).collect()}
            if version not in known:
                raise ValueError(f"table {name!r} has no snapshot v={version}")
            parts = self.catalog.split(".", 1)
            ns = parts[1] + "." if len(parts) > 1 else ""
            self.spark.sql(
                f"CALL {parts[0]}.system.rollback_to_snapshot"
                f"('{ns}{name}', {int(version)})"
            )
            return
        if version not in self.versions(name):
            raise ValueError(f"table {name!r} has no snapshot v={version}")
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(name))

    # -- bucketed edge tables (at-rest co-location) ---------------------------

    def save_bucketed_edges(
        self, edges: DataFrame, name: str, buckets: int = 32
    ) -> None:
        """Persist an edge table hash-bucketed AND sorted by ``src`` in the
        session catalog. A scan of this table already satisfies
        HashPartitioning(src) — the superstep scatter join and degree
        aggregation start WITHOUT the initial repartition shuffle (the
        at-rest analogue of Graph.edges_sym's repartition+sort; on a real
        deployment this is the Iceberg bucket transform)."""
        (
            edges.write.mode("overwrite")
            .bucketBy(buckets, "src")
            .sortBy("src")
            .format("parquet")
            .saveAsTable(name)
        )

    def load_bucketed_edges(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def list_tables(self) -> list[str]:
        """LS/STORE."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(self._dir(d))
        )
