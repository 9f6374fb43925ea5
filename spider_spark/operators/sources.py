"""Sources & sinks (SURVEY.md §2.1 S-family) as library functions.

Each replaces a reference file-I/O pattern with a partition-parallel Spark
read/write; tests in tests/test_sources.py exercise round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_source(
    spark: SparkSession, path: str, encoding: str = "UTF-8", header: bool = True
) -> DataFrame:
    """S9 — CSV source with explicit encoding (the reference reads GBK
    CSVs, /root/reference/getGeocode.py:19-26). Spark 4 gates non-UTF
    charsets (GBK etc.) behind the legacy-javaCharsets flag."""
    if encoding.lower() not in (
        "utf-8", "us-ascii", "iso-8859-1", "utf-16", "utf-16be", "utf-16le", "utf-32",
    ):
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    return (
        spark.read.option("header", header)
        .option("encoding", encoding)
        .option("inferSchema", True)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """S13a — JSONL sink (/root/reference/zjj_sz_gov_cn.py:27-30):
    one JSON object per line, partition-parallel."""
    df.write.mode("overwrite").json(path)


def jsonl_to_csv(spark: SparkSession, jsonl_path: str, csv_path: str) -> DataFrame:
    """S13b — the json2csv converter (/root/reference/zjj_sz_gov_cn.py:34-61):
    the reference unions headers across records and fills missing with ''.
    spark.read.json does the schema union automatically; na.fill replaces
    the manual '' fill; returns the unified frame (also written as CSV)."""
    df = spark.read.json(jsonl_path)
    filled = df.na.fill("")
    filled.write.mode("overwrite").option("header", True).csv(csv_path)
    return filled


def write_hourly_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """S16 — per-hour directory sink (/root/reference/getRJWData.py:31-39
    builds y/m/d/h dirs with a race-guarded mkdir;
    /root/reference/getRJWData2.py:36-44): a partitioned write IS the
    mutex-free replacement."""
    (
        df.withColumn("y", F.year(ts_col))
        .withColumn("m", F.month(ts_col))
        .withColumn("d", F.dayofmonth(ts_col))
        .withColumn("h", F.hour(ts_col))
        .write.mode("overwrite")
        .partitionBy("y", "m", "d", "h")
        .parquet(path)
    )


def esri_field_to_spark(esri_type: str) -> T.DataType:
    """S11 — the reference's remote-type → sink-type dictionary
    (parseTypeField, /root/reference/suplicmap_vector.py:372-389),
    re-targeted at Spark types."""
    mapping: dict[str, T.DataType] = {
        "esriFieldTypeSmallInteger": T.IntegerType(),
        "esriFieldTypeInteger": T.IntegerType(),
        "esriFieldTypeSingle": T.DoubleType(),
        "esriFieldTypeDouble": T.DoubleType(),
        "esriFieldTypeString": T.StringType(),
        "esriFieldTypeDate": T.TimestampType(),
        "esriFieldTypeOID": T.LongType(),
        "esriFieldTypeGUID": T.StringType(),
        "esriFieldTypeGlobalID": T.StringType(),
        "esriFieldTypeXML": T.StringType(),
        "esriFieldTypeBlob": T.BinaryType(),
        "esriFieldTypeGeometry": T.BinaryType(),
    }
    return mapping.get(esri_type, T.StringType())


def sanitize_field_name(name: str) -> str:
    """check_name (/root/reference/suplicmap_vector.py:273-277): punctuation
    → '_', spaces removed — applied at schema-build time."""
    import re

    return re.sub(r"""[-!&<>"'?@=$~^`#%*()/\\:;{}\[\]|+.]""", "_", name).replace(
        " ", ""
    )


def schema_from_service_fields(fields: list[dict]) -> T.StructType:
    """S11 — schema-first sink creation (createFileGDB,
    /root/reference/suplicmap_vector.py:194-270): introspected remote
    fields → a StructType, names sanitized, OID column first."""
    out = []
    for f in fields:
        out.append(
            T.StructField(sanitize_field_name(f["name"]), esri_field_to_spark(f["type"]))
        )
    return T.StructType(out)


def write_schema_first(
    spark: SparkSession,
    rows: list[tuple],
    fields: list[dict],
    path: str,
    table_properties: dict[str, str] | None = None,
) -> DataFrame:
    """Create the sink from the introspected schema, then append rows —
    layer-alias metadata (/root/reference/suplicmap_vector2.py:280-288)
    becomes schema field metadata persisted in the parquet footer."""
    schema = schema_from_service_fields(fields)
    if table_properties:
        schema = T.StructType(
            [
                T.StructField(f.name, f.dataType, f.nullable, metadata=table_properties)
                for f in schema.fields
            ]
        )
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").parquet(path)
    return df


def write_geojson_feature_collection(
    df: DataFrame, path: str, geometry_col: str = "geometry", props: list[str] | None = None
) -> None:
    """S12 — GeoJSON FeatureCollection single-file export
    (/root/reference/suplicmap_pnr_sz.py:47-73 accumulates a features list
    and dumps once): to_json(collect_list(struct)) builds the document
    distributed, only the final assembled string lands on one writer."""
    props = props or [c for c in df.columns if c != geometry_col]
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(*[F.col(p) for p in props]).alias("properties"),
        F.col(geometry_col).alias("geometry"),
    )
    fc = df.agg(
        F.to_json(
            F.struct(
                F.lit("FeatureCollection").alias("type"),
                F.collect_list(feature).alias("features"),
            )
        ).alias("fc")
    )
    fc.coalesce(1).write.mode("overwrite").text(path)


def read_xls(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """S10 — XLS(X) source (/root/reference/getDirection.py:62-120 via
    xlrd). No excel reader ships in this container: gated behind an
    import-try on openpyxl/xlrd through pandas; raises NotImplementedError
    with the wiring documented otherwise."""
    try:
        import pandas as _pd

        pdf = _pd.read_excel(path, sheet_name=sheet)  # needs openpyxl/xlrd
    except ImportError as e:  # pragma: no cover - container lacks excel libs
        raise NotImplementedError(
            "XLS source needs openpyxl/xlrd (pandas.read_excel); convert to "
            "CSV upstream or add the dependency"
        ) from e
    return spark.createDataFrame(pdf)


def write_binary_tiles(df: DataFrame, path: str) -> None:
    """S14 — PNG-tile-per-key sink (/root/reference/suplicmap_tilemap.py:136-145):
    binary column + (level,row) partitioned layout replaces one-file-per-tile."""
    df.write.mode("overwrite").partitionBy("level", "row").parquet(path)
