"""Fixed schemas — the engine never infers.

Warehouse tables mirror the reference's relational model
(GraphQLPersistence.scala:35-147, SecondaryPersistence.scala:64-111 in the
reference): tenant, account, transfer, account_balance_change. Amounts are
exact decimals (the reference parses with BigDecimal.exact —
PrimaryPersistence.scala:256); timestamps are UTC.

Testdata tables (TPC-H-ish star schema + events/documents/embeddings) are
declared too so loads are checked, not inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# money: wide enough for 100 TB-scale sums, scale 2 matches the synthetic data
MONEY = T.DecimalType(18, 2)
MONEY_SUM = T.DecimalType(38, 2)

TENANT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),  # PK
    ]
)

ACCOUNT_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),  # PK1, FK tenant.name
        T.StructField("name", T.StringType(), False),  # PK2
        T.StructField("currency", T.StringType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("last_syn_snapshot", T.IntegerType(), False),  # watermark
        T.StructField("last_syn_event", T.IntegerType(), False),  # watermark
    ]
)

TRANSFER_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),  # PK1
        T.StructField("transaction", T.StringType(), False),  # PK2
        T.StructField("transfer", T.StringType(), False),  # PK3
        T.StructField("status", T.IntegerType(), False),  # 0 queued|1 committed|2 rollbacked
        T.StructField("credit_tenant", T.StringType(), False),
        T.StructField("credit_name", T.StringType(), False),
        T.StructField("debit_tenant", T.StringType(), False),
        T.StructField("debit_name", T.StringType(), False),
        T.StructField("amount", MONEY, False),
        T.StructField("currency", T.StringType(), False),
        T.StructField("value_date", T.TimestampType(), False),  # UTC
    ]
)

# derived: each committed transfer → +amount row (credit acct), -amount row (debit)
# ingestion-grade precision (28,10) per the reference's reconstructed DDL
ACCOUNT_BALANCE_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("value_date", T.TimestampType(), False),
        T.StructField("amount", T.DecimalType(28, 10), False),  # signed
    ]
)

# primary-key columns per warehouse table (drives MERGE / upsert semantics)
PRIMARY_KEYS: dict[str, list[str]] = {
    "tenant": ["name"],
    "account": ["tenant", "name"],
    "transfer": ["tenant", "transaction", "transfer"],
}

WAREHOUSE_SCHEMAS: dict[str, T.StructType] = {
    "tenant": TENANT_SCHEMA,
    "account": ACCOUNT_SCHEMA,
    "transfer": TRANSFER_SCHEMA,
    "account_balance_change": ACCOUNT_BALANCE_CHANGE_SCHEMA,
}

# testdata tables available at $SPARK_GRAFT_SF_DIR (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# transaction status codes (reference: PrimaryPersistence.scala:229-241,
# GraphQLService.scala:38-59)
STATUS_QUEUED = 0
STATUS_COMMITTED = 1
STATUS_ROLLBACKED = 2
STATUS_NAMES = {STATUS_QUEUED: "queued", STATUS_COMMITTED: "committed", STATUS_ROLLBACKED: "rollbacked"}
STATUS_CODES = {v: k for k, v in STATUS_NAMES.items()}
