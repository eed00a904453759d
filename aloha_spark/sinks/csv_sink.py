"""CSV dataset sinks: row-oriented (S12) and columnar with categorical
encodings (S13/F19).

Reference semantics:
* CsvRowCreator (aloha-core/.../dataset/csv/CsvRowCreator.scala:24-34):
  dense stringified columns joined by a separator, with a header string;
  missing -> configurable nullValue (docs golden `MALE,NULL,3`,
  docs/dataset.md:180-181).
* CsvColumnarRowCreator (CsvColumnarRowCreator.scala:19-36): each
  feature expands to 1..n typed columns.
* Encodings (csv/encoding/encodings.scala:38-158):
  - regular: identity-or-null (:126-158)
  - hotOne:  one 0/1 column per declared enum value (:65-124)
  - thermometer: declared but unimplemented in the reference — also
    unimplemented here (raises), for parity.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def regular_encoding(col: Column) -> list[tuple[str, Column]]:
    return [("", col)]


def hot_one_encoding(col: Column, values: Sequence[str]) -> list[tuple[str, Column]]:
    """One 0/1 column per declared value (suffix `_<value>`)."""
    return [(f"_{v}", F.when(col == F.lit(v), F.lit(1)).otherwise(F.lit(0)))
            for v in values]


def thermometer_encoding(*_args, **_kw):
    raise NotImplementedError(
        "thermometer encoding is declared but unimplemented in the "
        "reference (encodings.scala:38-63); kept unimplemented for parity")


def csv_columns(df: DataFrame, features: Sequence[dict]) -> DataFrame:
    """Columnar CSV: each feature = {"name", "column", "encoding"?,
    "values"? (hotOne), "type"?}."""
    cols: list[Column] = []
    for f in features:
        src = F.col(f["column"])
        enc = f.get("encoding", "regular")
        if enc == "regular":
            pairs = regular_encoding(src)
        elif enc == "hotOne":
            pairs = hot_one_encoding(src, f["values"])
        elif enc == "thermometer":
            thermometer_encoding()
        else:
            raise ValueError(f"unknown encoding {enc}")
        t = f.get("type")
        for suffix, c in pairs:
            if t:
                c = c.cast(t)
            cols.append(c.alias(f["name"] + suffix))
    return df.select(*cols)


def csv_lines(df: DataFrame, features: Sequence[dict],
              separator: str = ",", null_value: str = "NULL",
              out_col: str = "csv_line") -> tuple[DataFrame, str]:
    """Row CSV: returns (df with line column, header string)."""
    wide = csv_columns(df, features)
    names = wide.columns
    header = separator.join(names)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(null_value))
             for c in names]
    line = F.concat_ws(separator, *parts)
    # concat_ws skips NULLs, so coalesce above is what preserves the slot
    return wide.withColumn(out_col, line), header
