"""Sources & sinks (SURVEY.md §2.1 S-family) as library functions.

Each replaces a reference file-I/O pattern with a partition-parallel Spark
read/write; tests in tests/test_sources.py exercise round-trips.
"""

from __future__ import annotations

from zipfile import BadZipFile as zipfile_BadZipFile

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


def read_xls(
    spark: SparkSession, path: str, sheet: int | str = 0, header: bool = True
) -> DataFrame:
    """S10 — XLS(X) source (/root/reference/getDirection.py:62-120,
    /root/reference/getGeocode.py:56-99 via xlrd). ``.xlsx`` is a ZIP of
    SpreadsheetML XML, read by the stdlib reader in
    :mod:`spider_spark.operators.xlsx` (zipfile + ElementTree); legacy
    binary ``.xls`` is OLE2+BIFF8, read by the stdlib reader in
    :mod:`spider_spark.operators.xls_biff` (struct only) — no excel lib
    needed for either. Files beyond the minimal profiles (encrypted
    workbooks, BIFF5) fall back to pandas.read_excel (openpyxl/xlrd) when
    importable."""
    from spider_spark.operators.xls_biff import read_xls_rows
    from spider_spark.operators.xlsx import read_xlsx_rows

    rows = None
    if path.lower().endswith((".xlsx", ".xlsm")):
        try:
            rows = read_xlsx_rows(path, sheet)
        except (zipfile_BadZipFile, KeyError, ValueError):
            rows = None
    elif path.lower().endswith(".xls"):
        try:
            rows = read_xls_rows(path, sheet)
        except ValueError:
            rows = None
    if rows is None:
        try:
            import pandas as _pd

            pdf = _pd.read_excel(path, sheet_name=sheet)  # needs openpyxl/xlrd
        except ImportError as e:  # pragma: no cover - container lacks excel libs
            raise NotImplementedError(
                "workbook beyond the stdlib profiles (encrypted / BIFF5 / "
                "exotic .xlsx) needs openpyxl/xlrd via pandas.read_excel"
            ) from e
        return spark.createDataFrame(pdf)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    if header:
        names = [str(c) if c is not None else f"_c{i}" for i, c in enumerate(rows[0])]
        data = rows[1:]
    else:
        names = [f"_c{i}" for i in range(len(rows[0]))]
        data = rows
    # mixed int/float columns -> promote to float so Spark infers one type
    ncols = len(names)
    col_has_float = [
        any(isinstance(r[i], float) for r in data) for i in range(ncols)
    ]
    promoted = [
        [
            float(v) if col_has_float[i] and isinstance(v, int) and not isinstance(v, bool) else v
            for i, v in enumerate(r)
        ]
        for r in data
    ]
    return spark.createDataFrame(promoted, names)


def write_xls_sink(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """S10 write side — the reference writes geocoded results back out as a
    workbook (xlwt outbook, /root/reference/getDirection.py:69-118). A
    workbook is one file, so like the GeoJSON sink this is a deliberate
    single-file sink: stream rows driver-side (toLocalIterator — no full
    collect) into the stdlib writer. Excel caps sheets at ~1M rows, so the
    single-file shape is inherent to the format, not a scale compromise.
    A ``.xls`` path gets the legacy BIFF8 writer (the reference's xlwt
    format); anything else the zip-XML ``.xlsx`` writer."""
    from spider_spark.operators.xls_biff import write_xls
    from spider_spark.operators.xlsx import write_xlsx

    rows: list[list] = [list(df.columns)]
    for r in df.toLocalIterator():
        rows.append([r[c] for c in df.columns])
    if path.lower().endswith(".xls"):
        write_xls(path, rows, sheet_name=sheet_name)
    else:
        write_xlsx(path, rows, sheet_name=sheet_name)


def write_binary_tiles(df: DataFrame, path: str) -> None:
    """S14 — PNG-tile-per-key sink (/root/reference/suplicmap_tilemap.py:136-145):
    binary column + (level,row) partitioned layout replaces one-file-per-tile."""
    df.write.mode("overwrite").partitionBy("level", "row").parquet(path)


def mosaic_placement(
    min_col: int,
    max_col: int,
    min_row: int,
    max_row: int,
    bounds: tuple[float, float, float, float],
    origin: tuple[float, float],
    resolution: float,
    tilesize: int = 256,
) -> dict:
    """S15 — pure placement + 4-GCP georeference math of the GTiff mosaic
    (/root/reference/merge_tiles.py:66-129), GDAL-free so it is unit-testable
    in this container.

    ``bounds`` = (minX, minY, maxX, maxY) of the target extent; ``origin`` =
    (originX, originY) of the tile scheme. Returns canvas size, a
    (row, col) → (px, py) pixel-offset function, and the four ground
    control points as ((geoX, geoY), (pixel, line)) pairs — exactly the
    reference's WriteRaster offsets and gdal.GCP list."""
    import math

    min_x, min_y, max_x, max_y = bounds
    origin_x, origin_y = origin
    tilewidth = max_col - min_col + 1
    tileheight = max_row - min_row + 1
    span = resolution * tilesize

    def offset(row: int, col: int) -> tuple[int, int]:
        # merge_tiles.py:87-92: ((col-min_col)·tilesize, (row-min_row)·tilesize)
        return (col - min_col) * tilesize, (row - min_row) * tilesize

    gcp_x0 = math.floor(((min_x - origin_x) - min_col * span) / resolution)
    gcp_y0 = math.floor(((origin_y - max_y) - min_row * span) / resolution)
    gcp_x1 = tilewidth * tilesize - (
        tilesize - math.floor(((max_x - origin_x) - max_col * span) / resolution)
    )
    gcp_y1 = tileheight * tilesize - (
        tilesize - math.floor(((origin_y - min_y) - max_row * span) / resolution)
    )
    gcps = [
        ((min_x, max_y), (gcp_x0, gcp_y0)),
        ((max_x, max_y), (gcp_x1, gcp_y0)),
        ((min_x, min_y), (gcp_x0, gcp_y1)),
        ((max_x, min_y), (gcp_x1, gcp_y1)),
    ]
    return {
        "width_px": tilewidth * tilesize,
        "height_px": tileheight * tilesize,
        "offset": offset,
        "gcps": gcps,
    }


def write_gtiff_mosaic(
    spark: SparkSession,
    tiles_path: str,
    out_path: str,
    bounds: tuple[float, float, float, float],
    origin: tuple[float, float],
    resolution: float,
    tilesize: int = 256,
    level: int | None = None,
    overview_levels: tuple[int, ...] | None = None,
) -> dict:
    """S15 — georeferenced TIFF mosaic sink over ``write_binary_tiles``
    output (/root/reference/merge_tiles.py:66-129: per-tile WriteRaster
    placement, then gdal.Translate with the 4-GCP list). No GDAL needed:
    the canvas is an uncompressed striped baseline TIFF with GeoTIFF
    ModelTiepoint/ModelPixelScale tags, written by the stdlib
    ``struct``-packed writer in :mod:`spider_spark.operators.tiff`.

    Scale shape: each tile row is one TIFF strip, assembled in an executor
    (``applyInPandas`` groups tiles by row, decodes the PNGs with the
    stdlib codec, and composes the strip). The driver only streams the
    ordered strips to disk — it never holds the canvas, so mosaic size is
    bounded by one strip (width·tilesize·channels), not width·height.
    ``overview_levels`` appends a block-mean reduced-resolution pyramid
    (chained IFDs, NewSubfileType=1) after the base write — the stdlib
    counterpart of the reference's ``BuildOverviews`` post-pass
    (/root/reference/merge_tiles.py:124-129); see
    :func:`spider_spark.operators.tiff.append_overviews`. The remaining
    GDAL-only niceties (LZW, BIGTIFF) are intentionally not replicated;
    the geo placement — what the tests assert — is.

    Returns the placement dict (canvas size + GCPs) for the caller."""
    from spider_spark.operators.png import decode_png
    from spider_spark.operators.tiff import (
        append_overviews,
        tile_rows_to_strips,
        write_baseline_tiff,
    )

    tiles = spark.read.parquet(tiles_path)
    if level is not None:
        tiles = tiles.filter(F.col("level") == level)
    ext = tiles.agg(
        F.min("col").alias("c0"), F.max("col").alias("c1"),
        F.min("row").alias("r0"), F.max("row").alias("r1"),
    ).first()
    if ext is None or ext["c0"] is None:
        raise ValueError(f"no tiles found under {tiles_path}")
    min_col, max_col, min_row, max_row = ext["c0"], ext["c1"], ext["r0"], ext["r1"]
    place = mosaic_placement(
        min_col, max_col, min_row, max_row, bounds, origin, resolution, tilesize
    )
    first = tiles.select("png").first()["png"]
    sample = decode_png(bytes(first))
    channels = 1 if sample.ndim == 2 else sample.shape[2]
    width_px = place["width_px"]

    def _assemble(pdf):
        import numpy as _np

        from spider_spark.operators.png import decode_png as _dec

        canvas = _np.zeros((tilesize, width_px, channels), dtype=_np.uint8)
        for col, png in zip(pdf["col"], pdf["png"]):
            img = _dec(bytes(png))
            if img.ndim == 2:
                img = img[:, :, None]
            x0 = (int(col) - min_col) * tilesize
            h, w = img.shape[:2]
            canvas[:h, x0 : x0 + w, :] = img[:tilesize, :tilesize, :channels]
        import pandas as _pd

        return _pd.DataFrame(
            {"row": [int(pdf["row"].iloc[0])], "strip": [canvas.tobytes()]}
        )

    strips_df = (
        tiles.select("row", "col", "png")
        .groupBy("row")
        .applyInPandas(_assemble, "row int, strip binary")
        .orderBy("row")
    )
    ordered = ((r["row"], bytes(r["strip"])) for r in strips_df.toLocalIterator())
    write_baseline_tiff(
        out_path,
        width_px,
        place["height_px"],
        channels,
        tilesize,
        tile_rows_to_strips(ordered, min_row, max_row, width_px, tilesize, channels),
        pixel_scale=(resolution, resolution, 0.0),
        tiepoints=[
            (float(px), float(ln), float(gx), float(gy))
            for (gx, gy), (px, ln) in place["gcps"]
        ],
    )
    if overview_levels:
        append_overviews(out_path, overview_levels)
    return place


def _tile_extent(spark: SparkSession, tiles_path: str):
    """min/max (col, row) of a binary-tile table — one metadata-cheap agg."""
    from pyspark.sql import functions as F

    r = (
        spark.read.parquet(tiles_path)
        .agg(
            F.min("col").alias("c0"), F.max("col").alias("c1"),
            F.min("row").alias("r0"), F.max("row").alias("r1"),
        )
        .first()
    )
    return int(r["c0"]), int(r["c1"]), int(r["r0"]), int(r["r1"])


def list_files_by_mtime(
    spark: SparkSession, directory: str, pattern: str = "*", descending: bool = True
) -> DataFrame:
    """O4 — newest-first file listing (/root/reference/log4p.py:60-67: the
    reference sorts os.listdir by getmtime to pick the active rotated
    log). The directory stat pass is driver-side metadata — the same
    class of read as a parquet footer or an Iceberg manifest — and the
    result is a DataFrame so the sort/selection composes relationally."""
    import glob as _glob
    import os as _os

    rows = [
        (p, float(_os.path.getmtime(p)), int(_os.path.getsize(p)))
        for p in _glob.glob(_os.path.join(directory, pattern))
        if _os.path.isfile(p)
    ]
    df = spark.createDataFrame(rows, "path string, mtime double, size long")
    order = F.desc("mtime") if descending else F.asc("mtime")
    return df.orderBy(order, "path")


def write_bucketed_store(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key: str,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed + sorted by ``key`` — the open-source
    materialization of the page store the crawl engine assumes
    (`engine/crawler.py`: "an Iceberg table bucketed+sorted by url in
    production"). Two stores bucketed by the same key with the same
    bucket count join WITHOUT any Exchange: each task reads matching
    bucket files from both sides, so the frontier-vs-page-store join —
    the biggest join in a crawl round — never reshuffles the multi-TB
    page side at 10^10-URL scale. ``saveAsTable`` with an explicit
    ``path`` keeps the data external while registering bucket metadata
    in the session catalog (plain ``.parquet()`` writes drop the
    bucket spec; only catalog tables carry it).

    An existing catalog table of the same name is dropped first: on some
    Spark versions ``saveAsTable(mode='overwrite')`` ignores the ``path``
    option when the table already exists, so data would silently land at
    the OLD registered location. Dropping re-registers the table at
    ``path`` unambiguously (the external data at the old location is not
    deleted by DROP — same as Iceberg's external-table semantics)."""
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        spark.sql(f"DROP TABLE {table}")
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )
