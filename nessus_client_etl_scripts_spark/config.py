"""Config surface — SURVEY.md §1.3 (config.ini parity).

Same keys as the reference's ``config.ini`` (`[nessus]` host/port/keys,
`[aws]` creds/region/bucket, `[scanner]` deployment_id —
config.ini.example:1-14, read at export.py:17-33), with the all-present
validation of export.py:36-39 (P9). The S3 surface maps to ``s3a://``
paths consumed by Spark's Hadoop connector instead of boto3 calls.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass


@dataclass(frozen=True)
class NessusConfig:
    hostname: str
    port: str
    access_key: str
    secret_key: str

    @property
    def base_url(self) -> str:
        return f"https://{self.hostname}:{self.port}"

    @property
    def api_headers(self) -> dict[str, str]:
        # X-ApiKeys auth header (export.py:24-26)
        return {
            "X-ApiKeys": f"accessKey={self.access_key}; secretKey={self.secret_key}"
        }


@dataclass(frozen=True)
class LakeConfig:
    bucket: str
    region: str

    @property
    def root(self) -> str:
        """Spark-native sink root: s3a:// replaces boto3 put_object."""
        return f"s3a://{self.bucket}"


@dataclass(frozen=True)
class EngineConfig:
    nessus: NessusConfig
    lake: LakeConfig
    deployment_id: str

    def spark_hadoop_conf(self, aws_key: str, aws_secret: str) -> dict[str, str]:
        """The s3a credentials/conf the session needs to write the lake."""
        return {
            "spark.hadoop.fs.s3a.access.key": aws_key,
            "spark.hadoop.fs.s3a.secret.key": aws_secret,
            "spark.hadoop.fs.s3a.endpoint.region": self.lake.region,
        }


def load_config(path: str) -> EngineConfig:
    """Parse + validate (P9: every key present or raise,
    export.py:36-39 — fail fast at init, not mid-pipeline)."""
    cp = configparser.ConfigParser()
    if not cp.read(path):
        raise ValueError(f"config not readable: {path}")
    try:
        nessus = NessusConfig(
            hostname=cp["nessus"]["hostname"],
            port=cp["nessus"]["port"],
            access_key=cp["nessus"]["access_key"],
            secret_key=cp["nessus"]["secret_key"],
        )
        lake = LakeConfig(
            bucket=cp["aws"]["bucket_name"],
            region=cp["aws"]["region_name"],
        )
        deployment_id = cp["scanner"]["deployment_id"]
    except KeyError as e:
        raise ValueError(f"config missing required key: {e}") from e
    values = [
        nessus.hostname, nessus.port, nessus.access_key, nessus.secret_key,
        lake.bucket, lake.region, deployment_id,
    ]
    if not all(values):
        raise ValueError("config contains empty required values")
    return EngineConfig(nessus=nessus, lake=lake, deployment_id=deployment_id)
