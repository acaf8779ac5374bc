"""Explicit Spark schemas for the Nessus domain.

Bronze: the nested scan-run document the reference's ETL emits to S3
(shape from /root/reference/export.py:144-215; see FIXTURES.md §A.2).
Silver: the 7 normalized warehouse tables
(/root/reference/schema.sql; FIXTURES.md §A.1).

Schemas are declared, never inferred — at 100 TB schema inference is a
full extra pass and a correctness hazard (type drift across files).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bronze: nested scan-run document
# ---------------------------------------------------------------------------

# outputs: flattened {port, output} structs (export.py:144-149). The
# raw Nessus payload carries ports as a JSON map keyed by port; the
# raw-shaped variant is PORTS_MAP_SCHEMA below.
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("port", T.StringType()),
        T.StructField("output", T.StringType()),
    ]
)

PLUGIN_ATTRIBUTES_SCHEMA = T.StructType(
    [
        T.StructField("see_also", T.ArrayType(T.StringType())),
        T.StructField("synopsis", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("solution", T.StringType()),
        T.StructField("plugin_publication_date", T.StringType()),
        T.StructField("plugin_modification_date", T.StringType()),
        T.StructField(
            "risk_information",
            T.StructType(
                [
                    T.StructField("cvss_base_score", T.StringType()),
                    T.StructField("cvss3_base_score", T.StringType()),
                    T.StructField("cvss_vector", T.StringType()),
                    T.StructField("cvss3_vector", T.StringType()),
                ]
            ),
        ),
    ]
)

PLUGIN_SCHEMA = T.StructType(
    [
        T.StructField("plugin_id", T.IntegerType()),
        T.StructField("severity", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("pluginattributes", PLUGIN_ATTRIBUTES_SCHEMA),
        T.StructField("ref", T.StringType()),
    ]
)

HOST_VULN_REF_SCHEMA = T.StructType(
    [
        T.StructField("nessus_host_id", T.IntegerType()),
        T.StructField("scan_run_id", T.IntegerType()),
        T.StructField("plugin_id", T.IntegerType()),
    ]
)

VULNERABILITY_SCHEMA = T.StructType(
    [
        T.StructField("plugin", PLUGIN_SCHEMA),
        T.StructField("host_vuln", HOST_VULN_REF_SCHEMA),
        T.StructField("outputs", T.ArrayType(OUTPUT_SCHEMA)),
        # per-host-vuln summary row from the scan detail (severity +
        # count drive the severity pivot, export.py:60-65)
        T.StructField("severity", T.IntegerType()),
        T.StructField("count", T.IntegerType()),
    ]
)

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("host_id", T.IntegerType()),
        T.StructField("history_id", T.IntegerType()),
        T.StructField("scan_id", T.IntegerType()),
        T.StructField("host_ip", T.StringType()),
        T.StructField("host_fqdn", T.StringType()),
        T.StructField("host_start", T.StringType()),
        T.StructField("host_end", T.StringType()),
        T.StructField("os", T.StringType()),
        T.StructField("critical_count", T.IntegerType()),
        T.StructField("high_count", T.IntegerType()),
        T.StructField("medium_count", T.IntegerType()),
        T.StructField("low_count", T.IntegerType()),
        T.StructField("info_count", T.IntegerType()),
        T.StructField("vulnerabilities", T.ArrayType(VULNERABILITY_SCHEMA)),
    ]
)

SCAN_RUN_DOC_SCHEMA = T.StructType(
    [
        T.StructField("history_id", T.IntegerType()),
        T.StructField("scan_id", T.IntegerType()),
        T.StructField("scanner_start", T.LongType()),
        T.StructField("scanner_end", T.LongType()),
        T.StructField("host_count", T.IntegerType()),
        T.StructField("critical_count", T.IntegerType()),
        T.StructField("high_count", T.IntegerType()),
        T.StructField("medium_count", T.IntegerType()),
        T.StructField("low_count", T.IntegerType()),
        T.StructField("info_count", T.IntegerType()),
        T.StructField("targets", T.ArrayType(TARGET_SCHEMA)),
    ]
)

# raw Nessus plugin-output payload BEFORE the reference's flattening
# (export.py:144-149): ports arrives as a map keyed by port string
PORTS_MAP_SCHEMA = T.MapType(T.StringType(), T.StringType())

FOLDER_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

SCAN_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("folder_id", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("last_modification_date", T.LongType()),
        T.StructField(
            "history",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("history_id", T.IntegerType()),
                        T.StructField("status", T.StringType()),
                        T.StructField("last_modification_date", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# Silver: warehouse tables (schema.sql)
# ---------------------------------------------------------------------------

FOLDER_SCHEMA = T.StructType(
    [
        T.StructField("folder_id", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

SCAN_SCHEMA = T.StructType(
    [
        T.StructField("scan_id", T.IntegerType()),
        T.StructField("folder_id", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

SCAN_RUN_SCHEMA = T.StructType(
    [
        T.StructField("scan_run_id", T.IntegerType()),
        T.StructField("scan_id", T.IntegerType()),
        T.StructField("scan_start", T.LongType()),
        T.StructField("scan_end", T.LongType()),
        T.StructField("targets", T.StringType()),
        T.StructField("host_count", T.IntegerType()),
        T.StructField("critical_count", T.IntegerType()),
        T.StructField("high_count", T.IntegerType()),
        T.StructField("medium_count", T.IntegerType()),
        T.StructField("low_count", T.IntegerType()),
        T.StructField("info_count", T.IntegerType()),
    ]
)

HOST_SCHEMA = T.StructType(
    [
        T.StructField("host_id", T.LongType()),
        T.StructField("nessus_host_id", T.IntegerType()),
        T.StructField("scan_run_id", T.IntegerType()),
        T.StructField("scan_id", T.IntegerType()),
        T.StructField("host_ip", T.StringType()),
        T.StructField("host_fqdn", T.StringType()),
        T.StructField("host_start", T.StringType()),
        T.StructField("host_end", T.StringType()),
        T.StructField("os", T.StringType()),
        T.StructField("critical_count", T.IntegerType()),
        T.StructField("high_count", T.IntegerType()),
        T.StructField("medium_count", T.IntegerType()),
        T.StructField("low_count", T.IntegerType()),
        T.StructField("info_count", T.IntegerType()),
    ]
)

HOST_VULN_SCHEMA = T.StructType(
    [
        T.StructField("host_vuln_id", T.LongType()),
        T.StructField("nessus_host_id", T.IntegerType()),
        T.StructField("scan_run_id", T.IntegerType()),
        T.StructField("plugin_id", T.IntegerType()),
    ]
)

PLUGIN_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("plugin_id", T.IntegerType()),
        T.StructField("severity", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("synopsis", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("solution", T.StringType()),
        T.StructField("cvss_base_score", T.DoubleType()),
        T.StructField("cvss3_base_score", T.DoubleType()),
        T.StructField("cvss_vector", T.StringType()),
        T.StructField("cvss3_vector", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("pub_date", T.StringType()),
        T.StructField("mod_date", T.StringType()),
    ]
)

VULN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vuln_output_id", T.LongType()),
        T.StructField("host_vuln_id", T.LongType()),
        T.StructField("port", T.StringType()),
        T.StructField("output", T.StringType()),
    ]
)

SILVER_TABLES = (
    "folder",
    "scan",
    "scan_run",
    "host",
    "host_vuln",
    "plugin",
    "vuln_output",
)
