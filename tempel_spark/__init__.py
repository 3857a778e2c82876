"""tempel_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query/data-processing capabilities of the reference
(klimzaporojets/TempEL, NeurIPS 2022 D&B) as an idiomatic Spark
blocking → pairwise-scoring → transitive-clustering record-linkage
pipeline over tables of multi-turn conversation transcripts.

Nothing here is a port: the reference is a single-node pandas /
multiprocessing system; this package declares logical plans with the
DataFrame API and lets Catalyst/Tungsten/AQE pick physical strategy.
See SURVEY.md for the operator-by-operator mapping (§2) and the build
plan (§7).
"""

__version__ = "0.1.0"

from tempel_spark.session import get_spark  # noqa: F401
