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

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
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
    """Storage-agnostic table read: parquet path | iceberg table name |
    bucketed catalog table (``fmt="bucketed"`` — scans through the
    session catalog so the bucket layout survives and downstream
    conv_id windows/joins plan exchange-free, see sources/bucketed.py)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_name)
    if fmt == "bucketed":
        return spark.table(path_or_name)
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


@dataclass
class AlohaEnum:
    """Declared-value enum for 'e'-typed CSV columns (reference
    plugin/csv/enum.scala:19-60: constants carry a (name, number) pair;
    ordinal = declaration position; unknown constant -> the
    IllegalArgumentException message ``No enum const class <cls>.<v>``).

    Decodes to ``struct<name string, ordinal int, number int>`` so spec
    accessors reach the parts as ``${gender.number}`` /
    ``${gender.name}`` through the engine's path grammar."""
    class_name: str
    constants: Sequence[tuple[str, int]]

    def __post_init__(self):
        nums = [n for _, n in self.constants]
        if len(set(nums)) != len(nums):
            raise ValueError(
                "no enum constants should have the same associated number")

    def decode(self, raw: Column, strict: bool = False) -> Column:
        mapping = F.create_map(*[
            x for ordinal, (name, number) in enumerate(self.constants)
            for x in (F.lit(name),
                      F.struct(F.lit(name).alias("name"),
                               F.lit(ordinal).alias("ordinal"),
                               F.lit(number).alias("number")))])
        # try_element_at: NULL on unknown constant even under ANSI mode
        decoded = F.try_element_at(mapping, raw)
        if strict:
            stype = "struct<name:string,ordinal:int,number:int>"
            err = F.raise_error(F.concat(
                F.lit(f"No enum const class {self.class_name}."), raw))
            decoded = F.when(raw.isNull(), F.lit(None).cast(stype)) \
                .otherwise(F.coalesce(decoded, err.cast(stype)))
        return decoded


def read_aloha_csv(spark: SparkSession, path: str,
                   column_types: dict[str, str],
                   fs: str = "\t", ifs: str = ",",
                   missing: str = "",
                   enums: Optional[dict[str, AlohaEnum]] = None,
                   strict_enums: bool = False) -> DataFrame:
    """Read a delimited file with an Aloha column-types mapping.

    All fields land as strings first (lazy parse analog of
    CsvLineImpl), then cast; vector fields split on ``ifs``; the
    missing-marker becomes NULL (EmptyStringIsMissing default).

    ``enums`` maps 'e'-typed column names to their declared
    :class:`AlohaEnum`; those columns decode to
    ``struct<name, ordinal, number>`` (vectors: array of that struct).
    An undeclared constant decodes to NULL, or raises with the
    reference's IllegalArgumentException message when
    ``strict_enums=True``.  An 'e' column with no declared enum keeps
    the raw string (legacy behavior)."""
    names = list(column_types.keys())
    raw = spark.read.csv(path, sep=fs, header=False, inferSchema=False)
    for i, name in enumerate(names):
        raw = raw.withColumnRenamed(f"_c{i}", name)
    out = raw
    enums = enums or {}
    for name, code in column_types.items():
        t, optional, vector = parse_csv_type(code)
        base = code.lstrip("vo")
        enum = enums.get(name) if base == "e" else None
        col = F.col(name)
        col = F.when(col == missing, None).otherwise(col)
        if vector:
            items = F.split(col, F.lit(ifs).cast("string"))
            if enum is not None:
                cast = F.transform(
                    items, lambda x: enum.decode(
                        F.when(x == missing, None).otherwise(x),
                        strict_enums))
            else:
                # per-element missing-marker -> NULL, same as the enum
                # branch (CsvLineImpl.scala:78 maps each element through
                # the missing handler before conversion); without it an
                # empty element in a string vector stays '' instead of
                # NULL, and a numeric cast of '' aborts under ANSI
                cast = F.transform(
                    items,
                    lambda x: F.when(x == missing, None)
                               .otherwise(x).cast(t))
            col = F.when(col.isNull(), None).otherwise(cast)
        elif enum is not None:
            col = enum.decode(col, strict_enums)
        else:
            col = col.cast(t)
        out = out.withColumn(name, col)
    return out
