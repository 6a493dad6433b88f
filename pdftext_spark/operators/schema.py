"""Spark schemas for the extraction output.

Mirrors the reference's dictionary_output contract (README.md:50-71,
SURVEY.md §1.4) as nested struct/array columns. Char-level structs omit
the per-char font (it is always identical to the span font — span breaks
on any font change, pages.py:102-104).
"""

from __future__ import annotations

from pyspark.sql import types as T

FONT = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("flags", T.IntegerType()),
    T.StructField("size", T.DoubleType()),
    T.StructField("weight", T.IntegerType()),
])

CHAR = T.StructType([
    T.StructField("bbox", T.ArrayType(T.DoubleType())),
    T.StructField("char", T.StringType()),
    T.StructField("rotation", T.DoubleType()),
    T.StructField("char_idx", T.IntegerType()),
])

SPAN = T.StructType([
    T.StructField("bbox", T.ArrayType(T.DoubleType())),
    T.StructField("text", T.StringType()),
    T.StructField("font", FONT),
    T.StructField("char_start_idx", T.IntegerType()),
    T.StructField("char_end_idx", T.IntegerType()),
    T.StructField("rotation", T.DoubleType()),
    T.StructField("url", T.StringType()),
    T.StructField("superscript", T.BooleanType()),
    T.StructField("subscript", T.BooleanType()),
    T.StructField("chars", T.ArrayType(CHAR)),
])

LINE = T.StructType([
    T.StructField("bbox", T.ArrayType(T.DoubleType())),
    T.StructField("spans", T.ArrayType(SPAN)),
])

BLOCK = T.StructType([
    T.StructField("bbox", T.ArrayType(T.DoubleType())),
    T.StructField("lines", T.ArrayType(LINE)),
])

REF = T.StructType([
    T.StructField("idx", T.IntegerType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("coord", T.ArrayType(T.DoubleType())),
    T.StructField("ref", T.StringType()),
    T.StructField("url", T.StringType()),
])

PAGE = T.StructType([
    T.StructField("page", T.IntegerType()),
    T.StructField("bbox", T.ArrayType(T.DoubleType())),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("rotation", T.IntegerType()),
    T.StructField("blocks", T.ArrayType(BLOCK)),
    T.StructField("refs", T.ArrayType(REF)),
])

TABLE_CELL = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("bbox", T.ArrayType(T.DoubleType())),
])

LINK_DEST = T.StructType([
    T.StructField("ord", T.IntegerType()),
    T.StructField("gid", T.IntegerType()),
    T.StructField("dest_page", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
])

EXTRACTED = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
    T.StructField("is_html", T.BooleanType()),
    T.StructField("page", PAGE),
    T.StructField("tables", T.ArrayType(T.ArrayType(TABLE_CELL))),
    T.StructField("link_dests", T.ArrayType(LINK_DEST)),
    T.StructField("error", T.StringType()),
    T.StructField("n_chars", T.IntegerType()),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("n_blocks", T.IntegerType()),
])

TRANSCRIPT = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
