"""Catalog / schema / report file formats (SURVEY §2.1 S5, S11, S12; §2.9 X2).

* id catalog — ``all_classes_report.<WS>.txt(.gz)``: the expected per-class
  counts from the ACeDB side (``runcommand.py:38-60``).
* QA report CSV — QUOTE_ALL dialect (``pseudoace.py:147-148``), desc-sorted
  by count (``util.py:86``).
* annotated models file — the per-release schema
  (``pseudoace.py:14-53``): class/attribute/type/cardinality lines feeding
  typed casts (X2/X3).
* markdown/HTML rendering of the report (S13, ``util.py:74-99``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_id_catalog(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-separated ``class count`` lines (gzip transparent, S5) →
    (class_name, expected_count)."""
    lines = spark.read.text(path).filter(F.trim("value") != "")
    return lines.select(
        F.regexp_extract("value", r"^\s*(\S+)\s+(\d+)\s*$", 1).alias("class_name"),
        F.regexp_extract("value", r"^\s*(\S+)\s+(\d+)\s*$", 2)
        .cast("long")
        .alias("expected_count"),
    ).filter(F.col("class_name") != "")


def write_qa_report_csv(report: DataFrame, path: str) -> None:
    """S12: quoted CSV sink, desc by the first count column (util.py:86).
    coalesce(1) mirrors the reference's single report file — the report is
    O(#classes) rows, so one task is correct even at 100 TB input."""
    count_cols = [c for c, t in report.dtypes if t in ("bigint", "int")]
    out = report.orderBy(F.desc(count_cols[0])) if count_cols else report
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(path)
    )


def read_models_schema(
    spark: SparkSession, path: str, release: str = ""
) -> DataFrame:
    """X2: simplified annotated-models parser → schema DataFrame
    (class, attribute, value_type, cardinality, release) per FIXTURES.md §3.

    Line grammar (one attribute per line, ``?Class`` headers):

        ?Gene
          Identity  UNIQUE Text
          CGC_name  Text
          Lives_at  REF Location

    UNIQUE → cardinality 'one', else 'many' (the ACeDB default).
    """
    lines = [
        r.value
        for r in spark.read.text(path).collect()  # schema files are tiny
    ]
    rows = []
    cls = None
    for ln in lines:
        s = ln.strip()
        if not s or s.startswith("//"):
            continue
        if s.startswith("?"):
            cls = s.split()[0][1:]
            parts = s.split()[1:]
        else:
            parts = s.split()
        if cls is None or not parts:
            continue
        attr = parts[0]
        rest = [p for p in parts[1:]]
        unique = "UNIQUE" in rest
        rest = [p for p in rest if p != "UNIQUE"]
        vtype = (rest[0] if rest else "Text").lower()
        vtype = {"text": "string", "int": "long", "float": "double",
                 "datetype": "timestamp", "ref": "ref"}.get(vtype, vtype)
        rows.append((cls, attr, vtype, "one" if unique else "many", release))
    return spark.createDataFrame(
        rows, "class STRING, attribute STRING, value_type STRING, "
              "cardinality STRING, release STRING"
    )


def report_to_markdown(report: DataFrame, max_rows: int = 1000) -> str:
    """S13 (util.py:74-99): small-report markdown rendering — collect the
    O(#classes) rows and right-justify columns (A2+F5+F6 composition)."""
    rows = report.limit(max_rows).collect()
    cols = report.columns
    cells = [[str(v) if v is not None else "" for v in r] for r in rows]
    widths = [
        max([len(c)] + [len(row[i]) for row in cells]) for i, c in enumerate(cols)
    ]
    def fmt(row):
        return "| " + " | ".join(v.rjust(w) for v, w in zip(row, widths)) + " |"
    sep = "|" + "|".join("-" * (w + 2) for w in widths) + "|"
    return "\n".join([fmt(cols), sep] + [fmt(r) for r in cells])


def report_to_html(report: DataFrame, max_rows: int = 1000) -> str:
    """S13 second half (pseudoace.py:151-158): the QA report as an HTML
    table (the reference renders markdown → HTML for the e-mailed report).
    """
    import html as _html

    rows = report.limit(max_rows).collect()
    cols = report.columns
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = "\n".join(
        "<tr>"
        + "".join(
            f"<td>{'' if v is None else _html.escape(str(v))}</td>" for v in r
        )
        + "</tr>"
        for r in rows
    )
    return (
        "<table>\n<thead><tr>" + head + "</tr></thead>\n<tbody>\n"
        + body
        + "\n</tbody>\n</table>"
    )
