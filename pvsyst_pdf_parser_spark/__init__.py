"""PySpark-native document-extraction engine.

A from-scratch, Spark-first reimplementation of the query/data-processing
capabilities of ``dsd-hamsa/PVsyst-PDF-Parser`` (reference, read-only at
/root/reference) as a distributed pipeline over a Common-Crawl-style
``pages(url, warc_ts, html BINARY, text, lang)`` table.

Not a port: the reference is a single-threaded CPython PDF parser; this
package decomposes its fixed extraction DAG into DataFrame operators
(see SURVEY.md §2) with vectorized Arrow/pandas UDFs only where Spark
lacks a primitive (match-position regex scans, canonical JSON assembly).
"""

__version__ = "0.1.0"
