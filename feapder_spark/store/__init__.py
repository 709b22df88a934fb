from feapder_spark.store.snapshot import SnapshotStore, SnapshotTable

__all__ = ["SnapshotStore", "SnapshotTable"]
