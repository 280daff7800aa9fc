"""Final per-url assembly: join extracted structures, emit canonical
JSON + report (reference O1-O7) via one Arrow-batched UDF.

All joins key on url; the dimension sides (arrays/combos/monthly
aggregates) are tiny per url, so AQE turns these into broadcast or
well-packed shuffle joins.  The UDF itself is O(arrays × inverters) per
document — negligible next to the decode/regex stages.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .document import build_document

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("extracted_json", T.StringType()),
        T.StructField("report_text", T.StringType()),
    ]
)


def _arrays_agg(fields_df: DataFrame) -> DataFrame:
    struct_cols = [c for c in fields_df.columns if c != "url"]
    return fields_df.groupBy("url").agg(
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("arrays")
    )


def _combos_agg(combos_df: DataFrame) -> DataFrame:
    # parsed_inverter_count rides the SAME aggregation (A14 metric) —
    # a separate groupBy+join would re-execute the whole expand/gap-fill
    # subtree (measured ~40% pipeline slowdown)
    return combos_df.groupBy("url").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "combo_seq", "array_id", "inverter", "mppt", "original_notation"
                )
            )
        ).alias("combos"),
        F.countDistinct("inverter").alias("parsed_inverter_count"),
    )


def assembly_frame(
    doc_df: DataFrame,
    fields_df: DataFrame,
    combos_df: DataFrame,
) -> DataFrame:
    """One row per url with every structure the document builder needs.

    doc_df already carries the fused section/monthly/equipment columns;
    only the exploded array/combo paths join back (both tiny per url,
    url-keyed)."""
    return doc_df.join(_arrays_agg(fields_df), "url", "left").join(
        _combos_agg(combos_df), "url", "left"
    )


_DOC_FIELDS = [
    "n_sections",
    "losses_content",
    "total_modules_line",
    "module_manufacturer",
    "module_model",
    "module_power_raw",
    "inverter_manufacturer",
    "inverter_model",
    "inverter_power_raw",
]


def _py(v):
    """numpy scalar → python scalar (json.dumps-safe)."""
    if v is None or isinstance(v, (str, bool)):
        return v
    if isinstance(v, float):
        return None if v != v else v  # NaN → None
    if hasattr(v, "item"):
        return v.item()
    return v


def _int(v):
    """Nullable-int fields surface as pandas floats through Arrow struct
    conversion — coerce back to exact Python ints."""
    v = _py(v)
    if v is None:
        return None
    return int(v)


# integer-typed fields that must not leak as floats into the JSON
_ARRAY_INT_FIELDS = {
    "rank",
    "mppt_total_endpoints",
    "mppt_count",
    "orientation_id",
    "number_of_modules",
    "strings",
    "modules_in_series",
    "inferred_mppt_per_inverter",
    "inferred_strings_per_mppt_max",
    "inferred_inverters_reported",
    "inferred_inverters_required",
    "inferred_inverters_used",
}
_DOC_INT_FIELDS = {"n_sections", "total_modules_line"}


def _is_empty(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float):
        return v != v  # NaN (null array column)
    return False


@F.pandas_udf(RESULT_SCHEMA)
def _assemble_udf(rows: pd.DataFrame) -> pd.DataFrame:
    jsons, reports = [], []
    for row in rows.to_dict("records"):
        doc = {
            k: (_int(row.get(k)) if k in _DOC_INT_FIELDS else _py(row.get(k)))
            for k in _DOC_FIELDS
        }
        doc["oris"] = [
            (o["ori_id"], _py(o["pos"]))
            for o in (row.get("oris") if not _is_empty(row.get("oris")) else [])
        ]
        doc["tilts"] = [
            (_py(t["pos"]), _py(t["tilt"]), _py(t["az_pv"]))
            for t in (row.get("tilts") if not _is_empty(row.get("tilts")) else [])
        ]
        doc["monthly_rows"] = [
            (_py(m["line_seq"]), m["month"], _py(m["globhor"]), _py(m["e_grid"]))
            for m in (
                row.get("monthly_rows")
                if not _is_empty(row.get("monthly_rows"))
                else []
            )
        ]
        arrays = []
        for a in row.get("arrays") if not _is_empty(row.get("arrays")) else []:
            d = {}
            for k, v in a.items():
                if k in ("inverter_ids", "mppt_ids"):
                    d[k] = None if v is None else [str(x) for x in v]
                elif k in _ARRAY_INT_FIELDS:
                    d[k] = _int(v)
                else:
                    d[k] = _py(v)
            arrays.append(d)
        doc["arrays"] = arrays
        doc["combos"] = [
            {
                "array_id": c["array_id"],
                "inverter": c["inverter"],
                "mppt": c["mppt"],
                "original_notation": c["original_notation"],
            }
            for c in (row.get("combos") if not _is_empty(row.get("combos")) else [])
        ]
        j, r = build_document(doc)
        jsons.append(j)
        reports.append(r)
    return pd.DataFrame({"extracted_json": jsons, "report_text": reports})


def assemble_documents(
    assembly_df: DataFrame, extra_cols: list[str] | None = None
) -> DataFrame:
    """(url, ..., extracted_json, report_text[, extra metric cols]).

    ``extra_cols`` pass through untouched (diagnostics/metrics columns —
    they never enter the canonical JSON)."""
    cols = F.struct(
        *_DOC_FIELDS, "oris", "tilts", "monthly_rows", "arrays", "combos"
    )
    return assembly_df.withColumn("result", _assemble_udf(cols)).select(
        "url",
        "kind",
        "n_pages",
        F.col("result.extracted_json").alias("extracted_json"),
        F.col("result.report_text").alias("report_text"),
        *(extra_cols or []),
    )
