"""Explicit StructType schemas.

The reference fixes its schemas as SQLAlchemy declarative ORM classes
(reference: generate_decisions_summaries.py:27-28, reconstructed in
SURVEY.md §1.2). Spark-native equivalent: StructType constants used for
schema-enforced reads and for createDataFrame of local collections.

Two families:
 A. driver corpus tables (/root/testdata/sf*/ — FIXTURES.md §A)
 B. document-warehouse entities mirroring the reference ORM
    (Document/Body/Block/Paragraph/Table/Decision — FIXTURES.md §B),
    used by unit fixtures and by the DOCX-ingestion source stub.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# --- family A: driver corpus -------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampNTZType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampNTZType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

CORPUS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- family B: reference document-warehouse entities (SURVEY.md §1.2) --------
# The reference models order-significant 1:N relations relationally
# (DocumentCore.blocks, Decision.decision_blocks_map); we carry an explicit
# (parent_id, seq) because Spark never guarantees row order.

BODY = StructType(
    [
        StructField("body_id", IntegerType()),
        StructField("symbol", StringType()),  # "COP" | "CMA" | "CMP" | "SBI" | "SBSTA"
    ]
)

DOCUMENT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("symbol", StringType()),
        StructField("body_id", IntegerType()),
    ]
)

# Block is a tagged union: paragraph XOR table XOR empty
# (reference: generate_decisions_summaries.py:50-57 — `if block.paragraph:
# ... elif block.table:`; paragraph takes precedence when both present).
BLOCK = StructType(
    [
        StructField("block_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("seq", LongType()),
        StructField("numbering", StringType(), nullable=True),
        StructField("block_type", StringType()),  # "paragraph" | "table" | "empty"
    ]
)

PARAGRAPH = StructType(
    [
        StructField("block_id", LongType()),
        StructField("text", StringType()),
    ]
)

TABLE_PAYLOAD = StructType(
    [
        StructField("block_id", LongType()),
        StructField("caption", StringType(), nullable=True),
        StructField("cells_text", StringType()),
    ]
)

DECISION = StructType(
    [
        StructField("decision_id", LongType()),
        StructField("symbol", StringType()),  # e.g. "1/CMA.1"
    ]
)

DECISION_BLOCK_MAP = StructType(
    [
        StructField("decision_id", LongType()),
        StructField("block_id", LongType()),
        StructField("seq", LongType()),
    ]
)

# --- multimodal (north-star L5): opaque binary payload + typed metadata ------

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # "image" | "audio" | "video"
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)
