from .sharded_ba import ba_sharded, partition_edges_by_source  # noqa: F401
