"""getl_spark.lake — an Iceberg-style lake table format on parquet.

This sandbox image ships no Iceberg/Delta runtime jar, so the engine
implements the minimal slice of an ACID table format it needs,
API-shaped like Iceberg so production deployment is a catalog swap:

- table metadata = versioned JSON (``metadata/v{N}.metadata.json``)
  with a ``VERSION`` hint file updated via atomic rename
- snapshots carry a full data-file listing with per-file partition
  (bucket) value + row/byte counts -> driver-side partition pruning,
  exactly what Iceberg manifests do
- commits are optimistic (O_EXCL create of the next metadata version);
  concurrent appends rebase and retry, conflicting overwrites fail
- snapshot summaries carry ``pipeline``/``epoch`` -> idempotent
  epoch commits (the exactly-once guard)
- schema evolution (add / widen / rename) is transactional: a new
  schema version in a new metadata version; old data files are read
  through a per-file select that upgrades them to the current schema

Reference parity: getl's Dataset create/drop/truncate + schema
persistence (/root/reference/src/main/groovy/getl/data/Dataset.groovy:569-627,
1101-1231) and updateFields merge policies (:449-485).
"""

from getl_spark.lake.table import LakeTable, PartitionSpec  # noqa: F401
from getl_spark.lake.catalog import LakeCatalog  # noqa: F401
