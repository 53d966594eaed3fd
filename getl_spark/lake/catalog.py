"""LakeCatalog — a warehouse directory of LakeTables.

Reference parity: getl's repository of named connections/datasets
(/root/reference/src/main/groovy/getl/lang/Getl.groovy:491-551) and
catalog verbs retrieveObjects/exists
(/root/reference/src/main/groovy/getl/jdbc/TableDataset.groovy:176-191).
In production this is an Iceberg catalog (Hadoop/REST/Glue); the API
is the same four verbs.
"""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from getl_spark.lake.table import LakeTable, PartitionSpec


class LakeCatalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _loc(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def create_table(
        self,
        name: str,
        schema: StructType,
        partition_spec: PartitionSpec | None = None,
        properties: dict | None = None,
        if_not_exists: bool = False,
        primary_key: list[str] | None = None,
    ) -> LakeTable:
        """``primary_key`` (or ``isKey`` field metadata on the schema —
        getl Field keys, data/Field.groovy:137-178) is stored in table
        properties; MERGE then defaults its ON clause to it."""
        if if_not_exists and self.table_exists(name):
            return self.load_table(name)
        props = dict(properties or {})
        import time as _time
        if primary_key is None:
            from getl_spark.schema import key_columns

            primary_key = key_columns(schema) or None
        if primary_key:
            missing = [k for k in primary_key if k not in schema.fieldNames()]
            if missing:
                raise ValueError(f"primary_key columns not in schema: {missing}")
            props.setdefault("primary.key", ",".join(primary_key))
        try:
            return LakeTable.create(self._loc(name), schema, partition_spec, props, name=name)
        except FileExistsError:
            if not if_not_exists:
                raise
            # lost a concurrent-creation race (both saw not-exists):
            # wait out the winner's VERSION write and load
            for _ in range(50):
                if self.table_exists(name):
                    return self.load_table(name)
                _time.sleep(0.01)
            raise

    def load_table(self, name: str) -> LakeTable:
        return LakeTable.load(self._loc(name))

    def table_exists(self, name: str) -> bool:
        return LakeTable.exists(self._loc(name))

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse) if LakeTable.exists(self._loc(d))
        )

    def drop_table(self, name: str) -> None:
        if self.table_exists(name):
            self.load_table(name).drop()

    def register_views(self, spark, names: list[str] | None = None) -> list[str]:
        """Expose lake tables as temp views so users run plain
        ``spark.sql`` over them (getl's sql/QueryDataset surface,
        /root/reference/src/main/groovy/getl/jdbc/QueryDataset.groovy:37-73).
        Views are snapshot-consistent: they bind the file set at
        registration time; call again to refresh."""
        out = []
        for name in names or self.list_tables():
            df = self.load_table(name).read(spark)
            view = name.lstrip("_")
            df.createOrReplaceTempView(view)
            out.append(view)
        return out
