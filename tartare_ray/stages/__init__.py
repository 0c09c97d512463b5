from .kernels import add_hash_partition_column, latest_per_key  # noqa: F401
