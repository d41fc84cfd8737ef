"""JSON-lines source/sink — the lingua franca of training-data
interchange.

Always pass an explicit schema on read: schema inference is a full extra
pass over the data (prohibitive at 100 TB) and silently unions
conflicting types. Writes go through the native JSON datasource
(JVM-side serialization, splittable output with one file per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema. Corrupt lines
    land in the standard `_corrupt_record` column under PERMISSIVE mode
    rather than failing the job (set columnNameOfCorruptRecord to keep
    them; the default drops unparseable fields to null)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write newline-delimited JSON, gzip-compressed by default (JSONL is
    ~10× the size of parquet uncompressed; gzip keeps interchange files
    shippable while staying splittable at the file level)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
