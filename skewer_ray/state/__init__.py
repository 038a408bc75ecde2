from .manifest import (PartitionManifest, load_manifests, run_partitioned,
                       retry_rejected)

__all__ = ["PartitionManifest", "load_manifests", "run_partitioned",
           "retry_rejected"]
