"""Hadoop-streaming pipe protocol (SURVEY §2.11, §3.2).

Reference: contrib/streaming — ``st/PipeMapRed.java`` forks the user
binary, writes ``key \\t value \\n`` lines to its stdin, and parses its
stdout back into k/v at the FIRST tab (no tab → whole line is key, empty
value: ``st/StreamKeyValUtil.java#splitKeyVal``).  Field separator and
key-field count are configurable (``stream.map.output.field.separator``,
``stream.num.map.output.key.fields``).

Spark realization: ``rdd.pipe(cmd)`` reproduces the fork+line-protocol
exactly (same per-partition process model as PipeMapper).  ``pipe_map``
wraps it with the tab-framing contract; prefer ``mapInPandas`` for new
code (Arrow-batched, ~10-100× less serde) — ``pipe_map_pandas`` shows
that shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def frame_kv(df: DataFrame, key: str, value: str, separator: str = "\t") -> DataFrame:
    """Serialize rows to the streaming line protocol ``key<sep>value``."""
    return df.select(
        F.concat_ws(
            separator, F.col(key).cast("string"), F.col(value).cast("string")
        ).alias("line")
    )


def split_kv(
    lines_df: DataFrame,
    separator: str = "\t",
    num_key_fields: int = 1,
) -> DataFrame:
    """Parse protocol lines back to (key, value) — splitting at the
    ``num_key_fields``-th separator; no separator → (line, "")."""
    line = F.col("line")
    # F.split takes a REGEX — escape so literal separators like '|' or
    # '.' round-trip with frame_kv (which writes them literally).
    parts = F.split(line, re.escape(separator))
    key = F.array_join(F.slice(parts, 1, num_key_fields), separator)
    val = F.when(
        F.size(parts) > num_key_fields,
        F.array_join(
            F.slice(parts, num_key_fields + 1, F.size(parts)), separator
        ),
    ).otherwise(F.lit(""))
    return lines_df.select(key.alias("key"), val.alias("value"))


def pipe_map(
    df: DataFrame,
    cmd: str,
    key: str,
    value: str,
    separator: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
) -> DataFrame:
    """PipeMapper: run ``cmd`` once per partition, stream framed rows
    through its stdin, parse stdout lines as k/v.  The child process sees
    exactly the hadoop-streaming contract (tab-framed lines, env passed
    through), so existing streaming scripts run unchanged.

    Scale: one process per partition (same as one per map task in the
    reference); no shuffle is introduced.
    """
    spark = df.sparkSession
    framed = frame_kv(df, key, value, separator)
    piped = framed.rdd.map(lambda r: r["line"]).pipe(cmd, env=env or {})
    out = spark.createDataFrame(piped.map(lambda line: (line,)), "line string")
    return split_kv(out, separator, num_key_fields)


def pipe_map_pandas(
    df: DataFrame,
    fn,
    out_schema: str,
) -> DataFrame:
    """The modern replacement PipeMapRed users should migrate to:
    ``mapInPandas`` — Arrow batches instead of a line protocol, no
    process fork per task, no string re-parsing."""
    return df.mapInPandas(fn, out_schema)


def script_wordcount(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """End-to-end demo of the streaming-script pattern (the WordCount
    any-language job of §3.2): a python child process tokenizes and emits
    ``token \\t 1`` lines; Spark aggregates — mapper in the script,
    combiner/reducer in the engine, exactly the reference job split."""
    mapper = (
        "python3 -c \""
        "import sys\n"
        "for line in sys.stdin:\n"
        "    parts = line.rstrip('\\n').split('\\t', 1)\n"
        "    text = parts[1] if len(parts) > 1 else ''\n"
        "    for tok in text.split():\n"
        "        sys.stdout.write(tok + '\\t1\\n')\""
    )
    kv = pipe_map(docs, mapper, key="doc_id", value="text")
    return (
        kv.groupBy(F.col("key").alias("token"))
        .agg(F.sum(F.col("value").cast("long")).alias("token_count"))
    )
