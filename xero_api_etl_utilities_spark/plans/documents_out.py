"""D2 — output document assembly: charges → Invoice / CreditNote docs.

Re-expresses the reference's per-transaction document construction
(/root/reference/src/DataObject.ts:20-103):

- P9 sign split: amount < 0 → CreditNote, else Invoice
  (src/DataObject.ts:23,49,76)
- P12 GL routing: customer "45678" → account 42010, else 41010
  (src/DataObject.ts:29)
- F6 description template: POS id + local timestamp + txn id
  (src/DataObject.ts:30-40)
- F15 due date from trading terms (src/helpers.ts:228-259)
- P10 required-field validation with an error side-output instead of
  the reference's log-and-skip (src/DataObject.ts:43-46)
- line items as ArrayType(StructType) with abs(amount), serialized
  with to_json only at the sink (src/DataObject.ts:61-70,92)

The fixed ``?? 0`` coalesce is applied BEFORE arithmetic — the
reference's `+totalGst * 11 ?? 0` never fires (src/DataObject.ts:113,
documented bug table in SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.functions.scalars import (
    due_date,
    iso_date,
    local_ts,
    receipt_ref,
)

GL_SPECIAL_CUSTOMER = "45678"
GL_SPECIAL, GL_DEFAULT = "42010", "41010"


def validate_required(charges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P10: rows missing date or amount go to the error side-output
    (the reference logs & skips them, src/DataObject.ts:43-46)."""
    ok = charges.filter(F.col("date").isNotNull() & F.col("amount").isNotNull())
    bad = charges.filter(F.col("date").isNull() | F.col("amount").isNull())
    return ok, bad


def assemble_documents(charges: DataFrame) -> DataFrame:
    """Build invoice/credit documents from verified charge rows.

    Input columns: date, amount, customer_id, seq_no, notes,
    terminal_id, tran_timestamp, xero_id, terms_type, terms_days
    (i.e. J1-verified rows already enriched by the J2 customer join).

    Output: one row per document with a nested line_items array and a
    doc_type tag; `to_json(document)` is applied by the sink, not here.
    """
    is_credit = F.col("amount") < 0
    gl_code = F.when(
        F.col("customer_id") == GL_SPECIAL_CUSTOMER, F.lit(GL_SPECIAL)
    ).otherwise(F.lit(GL_DEFAULT))
    description = F.concat(
        F.lit("POS "), receipt_ref(F.col("terminal_id"), F.col("seq_no")),
        F.lit("\n"), local_ts(F.col("tran_timestamp")),
        F.when(F.col("notes").isNotNull(), F.concat(F.lit("\n"), F.col("notes"))).otherwise(F.lit("")),
    )
    line_item = F.struct(
        description.alias("description"),
        F.lit(1).alias("quantity"),
        F.abs(F.col("amount")).alias("unit_amount"),
        F.lit(0).cast("decimal(12,2)").alias("tax_amount"),
        gl_code.alias("account_code"),
        F.lit("BAS Excluded").alias("tax_type"),
    )
    return charges.select(
        F.when(is_credit, F.lit("ACCRECCREDIT")).otherwise(F.lit("ACCREC")).alias("doc_type"),
        F.col("xero_id").alias("contact_id"),
        iso_date(F.col("date")).alias("doc_date"),
        iso_date(
            due_date(F.col("date"), F.col("terms_type"), F.col("terms_days"))
        ).alias("doc_due_date"),
        receipt_ref(F.col("terminal_id"), F.col("seq_no")).alias("reference"),
        F.lit("SUBMITTED").alias("status"),
        F.array(line_item).alias("line_items"),
    )


def documents_to_json(docs: DataFrame) -> DataFrame:
    """S11/S8 sink prep: serialize each document struct to JSON."""
    return docs.select(
        "doc_type",
        "reference",
        F.to_json(
            F.struct(
                "contact_id", "doc_date", "doc_due_date", "reference",
                "status", "line_items",
            )
        ).alias("payload"),
    )
