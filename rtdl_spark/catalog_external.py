"""External-catalog registration — Glue & Snowflake parity (SURVEY A20/A21).

The reference registers every written dataset in up to three catalogs:
Dremio (A19 — our session-catalog `register_lake_table` owns that), AWS
Glue (crawler per stream/table, reference ingester/ingester.go:704-775),
and Snowflake (schema + stage + external table, ingester.go:609-701).

Glue and Snowflake are environment-bound services; executing against them
belongs to deployment, not the engine. What IS engine surface — and what
this module implements with exact reference parity — is *generating* the
registration artifacts from a stream config:

- ``glue_crawler_request``      → the CreateCrawler request body (name,
                                  S3 target path, role, cron schedule with
                                  the reference's daily default);
- ``snowflake_registration_sql`` → the schema/stage/external-table DDL
                                  batch, with the reference's identifier
                                  cleansing (``s_`` prefix, hyphens→
                                  underscores) and per-store credentials
                                  clause shape (credentials REDACTED by
                                  default — the reference inlines secrets
                                  into SQL text, ingester.go:640-655, which
                                  we reproduce only on explicit opt-in).

Executing them is one boto3 / snowflake-connector call at deploy time.
"""

from __future__ import annotations

from rtdl_spark.config.registry import StreamConfig

GLUE_DEFAULT_CRON = "cron(0 0 * * ? *)"  # reference daily default (:760)


def glue_crawler_request(cfg: StreamConfig, message_type: str) -> dict:
    """The Glue CreateCrawler request the reference issues per
    (stream, table) — ingester.go:757-763. Raises if the role is missing,
    matching the reference's hard requirement (:751-754)."""
    if not cfg.glue_role:
        raise ValueError(
            "AWS Role ARN for accessing Glue Services must be provided"
        )
    path = f"s3://{cfg.bucket_name}"
    if cfg.folder_name:
        path += f"/{cfg.folder_name}"
    path += f"/{message_type}"
    schedule = (
        f"cron({cfg.glue_schedule_cron})"
        if cfg.glue_schedule_cron
        else GLUE_DEFAULT_CRON
    )
    return {
        "Name": f"{cfg.stream_id}_{message_type}",
        "DatabaseName": cfg.stream_id,
        "Role": cfg.glue_role,
        "Targets": {"S3Targets": [{"Path": path}]},
        "Schedule": schedule,
    }


def snowflake_registration_sql(
    cfg: StreamConfig,
    message_type: str,
    source_type: str,
    location_url: str,
    include_credentials: bool = False,
) -> list[str]:
    """The schema → stage → external-table DDL batch the reference runs
    (ingester.go:609-701), identifier cleansing included: schema is
    ``s_<stream_id>`` with hyphens replaced, stage/table share the cleansed
    message type. Credentials are redacted unless explicitly requested —
    the reference interpolates raw keys into SQL text."""
    schema = "s_" + cfg.stream_id.replace("-", "_")
    stage = message_type.replace("-", "_")

    if source_type == "S3":
        key = cfg.aws_access_key_id if include_credentials else "<REDACTED>"
        secret = (
            cfg.aws_secret_access_key if include_credentials else "<REDACTED>"
        )
        creds = f" CREDENTIALS = (AWS_KEY_ID = '{key}' AWS_SECRET_KEY = '{secret}')"
    elif source_type == "Azure":
        tok = (
            cfg.azure_storage_access_key if include_credentials else "<REDACTED>"
        )
        creds = f" CREDENTIALS = (AZURE_SAS_TOKEN = '{tok}')"
    elif source_type == "GCS":
        creds = ""  # reference uses a pre-configured storage integration
    else:
        raise ValueError(f"unsupported Snowflake source type: {source_type}")

    return [
        f"create schema if not exists {schema};",
        f"use schema {schema}; create stage if not exists {stage} "
        f"URL = '{location_url}'{creds};",
        f"use schema {schema}; create external table if not exists {stage} "
        f"location = @{stage} auto_refresh = false "
        f"file_format = (type = PARQUET);",
    ]
