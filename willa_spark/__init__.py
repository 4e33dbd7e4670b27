"""willa_spark — a PySpark-native streaming-topology analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference topology DSL (DaveWM/willa, studied at /root/reference),
re-designed Spark-first:

- topology-as-data: plain dicts {entities, workflow, joins}
- two interchangeable compilers over one operator library:
  batch (``willa_spark.batch``) and Structured Streaming
  (``willa_spark.streaming``), congruity-tested against each other
- Column-expression transforms (Catalyst-optimizable) with Pandas-UDF
  escape hatches for arbitrary Python logic
- large-scale extensions: dedup, similarity search, text analysis,
  multimodal columns (``willa_spark.operators``/``functions``)
"""

from . import model
from .batch import TopologyRunner, collect_records, run_topology, seed_records
from .model import GLOBAL_KTABLE, KEY, KSTREAM, KTABLE, TIMESTAMP, TOPIC, VALUE
from .operators import Aggregate, HoppingWindow, SessionWindow, TumblingWindow
from .transforms import (
    Compose,
    FilterRecords,
    FlatMapRecords,
    FlatMapValues,
    MapKey,
    MapRecord,
    MapValues,
    PandasTransform,
    ValueOnly,
    filter_keys,
    filter_values,
    map_values_udf,
)
from .validate import TopologyError, validate

__version__ = "0.1.0"
