"""Table sources.

Production target is Iceberg (``spark.read.format("iceberg")``); this
sandbox uses parquet with the same logical schema — ``read_table``
switches on format so jobs are storage-agnostic.  The CSV reader
implements the reference's typed-column system
(aloha-core/.../plugin/csv/CsvTypes.scala:12-42): 7 base types
{enum,boolean,int,long,float,double,string} x {required,optional} x
{scalar,vector}, field separator ``fs`` (default TAB), intra-field
vector separator ``ifs`` (default ","), empty-string-is-missing
(CsvLines.scala:85-88).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)

_BASE_TYPES = {
    "e": StringType(),   # enum decodes to its name string
    "b": BooleanType(),
    "i": IntegerType(),
    "l": LongType(),
    "f": FloatType(),
    "d": DoubleType(),
    "s": StringType(),
}


def read_table(spark: SparkSession, path_or_name: str,
               fmt: str = "parquet") -> DataFrame:
    """Storage-agnostic table read: parquet path | iceberg table name."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_name)
    return spark.read.format(fmt).load(path_or_name)


def parse_csv_type(code: str):
    """Aloha type code -> (spark type, optional?, vector?).

    Codes: ``i``=required int, ``oi``=optional int, ``vi``=vector of int,
    ``voi``=vector of optional int, etc. (CsvTypes.scala:12-42)."""
    c = code
    vector = c.startswith("v")
    if vector:
        c = c[1:]
    optional = c.startswith("o")
    if optional:
        c = c[1:]
    if c not in _BASE_TYPES:
        raise ValueError(f"unknown aloha csv type code: {code}")
    return _BASE_TYPES[c], optional, vector


def read_aloha_csv(spark: SparkSession, path: str,
                   column_types: dict[str, str],
                   fs: str = "\t", ifs: str = ",",
                   missing: str = "") -> DataFrame:
    """Read a delimited file with an Aloha column-types mapping.

    All fields land as strings first (lazy parse analog of
    CsvLineImpl), then cast; vector fields split on ``ifs``; the
    missing-marker becomes NULL (EmptyStringIsMissing default)."""
    names = list(column_types.keys())
    raw = spark.read.csv(path, sep=fs, header=False, inferSchema=False)
    for i, name in enumerate(names):
        raw = raw.withColumnRenamed(f"_c{i}", name)
    out = raw
    for name, code in column_types.items():
        t, optional, vector = parse_csv_type(code)
        col = F.col(name)
        col = F.when(col == missing, None).otherwise(col)
        if vector:
            col = F.when(col.isNull(), None).otherwise(
                F.transform(F.split(col, F.lit(ifs).cast("string")),
                            lambda x: x.cast(t)))
        else:
            col = col.cast(t)
        out = out.withColumn(name, col)
    return out
