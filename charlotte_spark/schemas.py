"""Explicit schemas for every table the engine reads or writes.

SURVEY §1.3: never infer schemas in production paths. Batch test tables
match FIXTURES.md §A; the charlotte-domain schemas (alerts, decoded
packets, snorby star) match FIXTURES.md §B and the field usage in the
reference (/root/reference/charlotte/__init__.py:466-526, 543-608).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# A. Relational test tables (FIXTURES.md §A)
# --------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampType()),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

TABLES: dict[str, T.StructType] = {
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

# --------------------------------------------------------------------------
# B. Charlotte-domain schemas (FIXTURES.md §B)
# --------------------------------------------------------------------------

# B1: parsed unified2 alert (analog of the idstools event dict consumed at
# /root/reference/charlotte/__init__.py:466-584)
ALERT = T.StructType([
    T.StructField("sensor_name", T.StringType()),
    T.StructField("event_second", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("signature_id", T.IntegerType()),
    T.StructField("generator_id", T.IntegerType()),
    T.StructField("classification_id", T.IntegerType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField(
        "packets",
        T.ArrayType(T.StructType([T.StructField("data", T.BinaryType())])),
    ),
    T.StructField(
        "extra_data",
        T.ArrayType(
            T.StructType([
                T.StructField("type", T.IntegerType()),
                T.StructField("data", T.BinaryType()),
            ])
        ),
    ),
])

# B2: decoded packet layers (/root/reference/charlotte/__init__.py:484-526)
IP_STRUCT = T.StructType([
    T.StructField("src", T.StringType()),
    T.StructField("dst", T.StringType()),
    T.StructField("ver", T.IntegerType()),
    T.StructField("hlen", T.IntegerType()),
    T.StructField("tos", T.IntegerType()),
    T.StructField("len", T.IntegerType()),
    T.StructField("id", T.IntegerType()),
    T.StructField("flags", T.IntegerType()),
    T.StructField("off", T.IntegerType()),
    T.StructField("ttl", T.IntegerType()),
    T.StructField("proto", T.IntegerType()),
    T.StructField("csum", T.IntegerType()),
])

TCP_STRUCT = T.StructType([
    T.StructField("sport", T.IntegerType()),
    T.StructField("dport", T.IntegerType()),
    T.StructField("seq", T.LongType()),
    T.StructField("ack", T.LongType()),
    T.StructField("off", T.IntegerType()),
    T.StructField("flags", T.IntegerType()),
    T.StructField("win", T.IntegerType()),
    T.StructField("csum", T.IntegerType()),
    T.StructField("urp", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])

UDP_STRUCT = T.StructType([
    T.StructField("sport", T.IntegerType()),
    T.StructField("dport", T.IntegerType()),
    T.StructField("len", T.IntegerType()),
    T.StructField("csum", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])

ICMP_STRUCT = T.StructType([
    T.StructField("type", T.IntegerType()),
    T.StructField("code", T.IntegerType()),
    T.StructField("csum", T.IntegerType()),
    T.StructField("id", T.IntegerType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])

PACKET_DECODED = T.StructType([
    T.StructField("ip", IP_STRUCT),
    T.StructField("tcp", TCP_STRUCT),
    T.StructField("udp", UDP_STRUCT),
    T.StructField("icmp", ICMP_STRUCT),
])

# B3: dimension maps (Maps class, /root/reference/charlotte/__init__.py:155-211)
SIG_MAP = T.StructType([
    T.StructField("gid", T.IntegerType()),
    T.StructField("sid", T.IntegerType()),
    T.StructField("rev", T.IntegerType()),
    T.StructField("classid", T.IntegerType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField("msg", T.StringType()),
])

CLASS_MAP = T.StructType([
    T.StructField("classid", T.IntegerType()),
    T.StructField("name", T.StringType()),
])
