"""hadoop_20_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of facebookarchive/hadoop-20.

The reference (Facebook's Hadoop 0.20 fork) expresses every query as a
hand-built MapReduce physical plan: InputFormat -> Mapper -> (Combiner) ->
shuffle-sort -> Reducer -> OutputFormat.  This package re-expresses that
entire operator surface Spark-first: the DataFrame/SQL API is the logical
plan, Catalyst+Tungsten pick the physical strategy, and the MapReduce
runtime machinery (JobTracker scheduling, spill/merge shuffle, commit
protocol, speculative execution) maps 1:1 onto the Spark runtime itself
(see SURVEY.md §3-§4) — so the library code here is the *semantics* layer:

- ``session``    SparkSession factory tuned for the target posture
- ``catalog``    fixture/table loader (TESTDATA.md parquet star schema)
- ``operators``  relational ops, joins (incl. override join), aggregation
                 descriptor DSL, sort/secondary-sort/top-k, set ops,
                 dedup (exact/minhash/simhash/jaccard), similarity search,
                 text analysis, multimodal column plumbing, pipe UDFs
- ``sources``    readers/writers incl. k/v-text compat, demux (partitionBy)
                 writes, small-file compaction
- ``functions``  the scalar function surface (hashing, strings, json, ...)
- ``streaming``  Structured Streaming analogs (windows, watermarks, state)

Reference citations in docstrings use repo-relative anchors like
``src/mapred/org/apache/hadoop/mapred/JobConf.java#setCombinerClass``.
"""

__version__ = "0.1.0"

from hadoop_20_spark.session import get_spark  # noqa: F401
from hadoop_20_spark.catalog import load_table, load_tables, TABLES  # noqa: F401
