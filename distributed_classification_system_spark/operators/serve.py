"""Serving-path queries (SURVEY.md §3.2, §2.2, §2.7).

The reference serves job listings and point reads from DynamoDB with
hand-written scan + filter + bubble-sort + limit
(backend-service/services/dynamo.go:119-165, handlers/handlers.go:498-538);
these are their Catalyst-native equivalents over columnar tables —
predicate pushdown, column pruning and Tungsten sort replace all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def list_jobs(orders: DataFrame, status: str = "O", limit: int = 100) -> DataFrame:
    """P3 status filter + O1 sort desc + O2 limit (filter-then-limit — the
    sane semantics; DynamoDB applies Limit pre-filter)."""
    return (
        orders.filter(F.col("o_orderstatus") == status)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(limit)
    )


def point_read(orders: DataFrame, key: int = 42) -> DataFrame:
    """S7 point read (GetItem by job_id → WHERE pk = ?)."""
    return orders.filter(F.col("o_orderkey") == key).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"
    )


def status_counts(orders: DataFrame) -> DataFrame:
    """A7 count-all per lifecycle status."""
    return orders.groupBy("o_orderstatus").agg(F.count("*").alias("n_jobs"))


def whitelist_filter(events: DataFrame, allowed: tuple[str, ...] = ("click", "view")) -> DataFrame:
    """P1 whitelist predicate (reference: extension whitelist,
    handlers.go:429-455) + A7 counts."""
    return (
        events.filter(F.col("event_type").isin(*allowed))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def prefix_filter(documents: DataFrame, prefix: str = "src1") -> DataFrame:
    """P2 explicit prefix filter (reference: S3 ListObjects prefix,
    services/s3.go:69-71) — `startswith` pushes to the scan as a
    StringStartsWith filter."""
    return (
        documents.filter(F.col("source").startswith(prefix))
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def conjunction_filter(orders: DataFrame, status: str = "O", priority: str = "1-URGENT") -> DataFrame:
    """P4 status + job_type conjunction filter (streamlit-app/
    app.py:733-738) — two pushed predicates, then a count."""
    return (
        orders.filter((F.col("o_orderstatus") == status) & (F.col("o_orderpriority") == priority))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.min("o_orderdate").alias("first_date"), F.max("o_orderdate").alias("last_date"))
    )


def substring_search(documents: DataFrame, term: str = "spark") -> DataFrame:
    """P5 case-insensitive substring search (streamlit-app/app.py:304-312)."""
    return (
        documents.filter(F.lower(F.col("text")).contains(term.lower()))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def json_extract(events: DataFrame) -> DataFrame:
    """JSON unmarshal of message payloads (services/sqs.go:27-31 →
    from_json/get_json_object)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k"),
    ).filter(F.col("event_id") < 1000)


def threshold_relabel(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """P6 threshold relabel predicate shape on the events stand-in."""
    return events.groupBy(
        F.when(F.col("value") < threshold, F.lit("unknown"))
        .otherwise(F.col("event_type"))
        .alias("label")
    ).agg(F.count("*").alias("n"))


def summary_projection(documents: DataFrame) -> DataFrame:
    """P7 projection-to-summary + derived size (handlers.go:521-532:
    NumImages = len(S3Keys) → num_tokens = len(tokens))."""
    return documents.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("num_tokens"),
    )


def sanitize_keys(documents: DataFrame) -> DataFrame:
    """P8/P9: filename extraction + sanitization + deterministic unique-key
    synthesis (reference handlers.go:385-397 uses timestamp+uuid8; we derive
    the suffix from sha2(content) for reproducibility)."""
    path = F.concat_ws("/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt")))
    filename = F.element_at(F.split(path, "/"), -1)
    sanitized = F.regexp_replace(F.regexp_replace(F.col("lang"), " ", "_"), "/", "_")
    return documents.select(
        "doc_id",
        path.alias("s3_key"),
        filename.alias("filename"),
        sanitized.alias("sanitized_lang"),
        F.concat(F.substring(F.sha2(F.col("text"), 256), 1, 8), F.lit("-"), filename).alias("unique_key"),
    )


def display_topn(documents: DataFrame, n: int = 10) -> DataFrame:
    """A13/W11: per-group display truncation — first n members plus an
    'and K more' count (streamlit-app/app.py:637-650)."""
    return (
        documents.groupBy("lang")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .select(
            "lang",
            F.size("ids").alias("n_docs"),
            F.concat_ws(",", F.transform(F.slice("ids", 1, n), lambda x: x.cast("string"))).alias("first_ids"),
            F.greatest(F.lit(0), F.size("ids") - n).alias("n_more"),
        )
    )


def content_type_map(documents: DataFrame) -> DataFrame:
    """P11 extension→MIME mapping shape (load-tests/utils/s3_helper.py:70-81)
    as a CASE map over the source column."""
    mime = (
        F.when(F.col("source") == "src0", F.lit("image/jpeg"))
        .when(F.col("source") == "src1", F.lit("image/png"))
        .when(F.col("source") == "src2", F.lit("image/gif"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return documents.groupBy(mime.alias("content_type")).agg(F.count("*").alias("n"))
