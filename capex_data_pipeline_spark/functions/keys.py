"""Composite-key column builders.

The reference builds two key shapes over (RequestNo, AssetItemName,
VendorName):

- *strict* 3-part ``a|b|c`` with nulls mapped to '' and values trimmed
  (``create_composite_primary_key``, process_capex.py:1245-1270) — note
  an empty vendor yields a trailing ``|``;
- *robust*: 3-part when the vendor is non-empty (after mapping the
  literal string ``'nan'`` to ''), else 2-part ``a|b``
  (``_build_robust_key_series``, process_capex.py:168-179).

Both are pure string expressions — JVM-side, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _part(col: Column) -> Column:
    return F.trim(F.coalesce(col.cast("string"), F.lit("")))


def strict_composite_key(
    request_no: Column, item_name: Column, vendor_name: Column
) -> Column:
    """``RequestNo|AssetItemName|VendorName`` (empty vendor keeps the
    trailing separator, matching process_capex.py:1267-1269)."""
    return F.concat_ws("|", _part(request_no), _part(item_name), _part(vendor_name))


def _astype_str_part(col: Column) -> Column:
    """pandas ``astype(str)``-first rendering: null -> literal 'nan'
    (the subsequent ``fillna('')`` in the reference is a no-op because
    astype already stringified the NaN)."""
    return F.trim(F.when(col.isNull(), F.lit("nan")).otherwise(col.cast("string")))


def robust_key(request_no: Column, item_name: Column, vendor_name: Column) -> Column:
    """3-part key when vendor present, else 2-part (process_capex.py:168-179).

    The reference runs ``astype(str)`` *before* ``fillna``, so null
    RequestNo/AssetItemName render as the literal ``'nan'`` in the key;
    only VendorName's 'nan' is cleaned back to '' (``replace({'nan': ''})``).
    """
    req = _astype_str_part(request_no)
    item = _astype_str_part(item_name)
    vendor = _part(vendor_name)
    vendor = F.when(vendor == "nan", F.lit("")).otherwise(vendor)
    short = F.concat_ws("|", req, item)
    full = F.concat_ws("|", req, item, vendor)
    return F.when(vendor != "", full).otherwise(short)
