from .manifest import Manifest, PartitionLineage, load_current, commit_manifest  # noqa: F401
