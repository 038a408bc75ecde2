"""skewer_ray — a Ray-Data-native log/telemetry pipeline engine.

Brand-new implementation of the data-processing capabilities of
stephane-martin/skewer (syslog gateway) as a batch
parse → enrich → route → aggregate job over Parquet transcript tables,
built on ray.data.Dataset / map_batches / actor pools. See SURVEY.md for
the full blueprint with reference file:line citations.
"""

__version__ = "0.1.0"
