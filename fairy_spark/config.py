"""Engine configuration.

Parity target: the reference's TOML+env settings loader
(common/src/settings.rs:90-121) with its KV options
(common/src/settings/local_kv_options.rs:9-34 — ``num_bucket`` default
1024, ``chuck_size`` [sic] default 128 KiB). We keep the same knobs,
re-interpreted for Spark: bucket fanout becomes table bucketing /
shuffle partitioning; chunk size maps to parquet scan split size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    # KV store (reference: local_kv_options.rs defaults)
    kv_num_buckets: int = 1024          # reference default num_bucket=1024
    kv_chunk_size: int = 128 * 1024     # reference default chuck_size=128KiB

    # Spark execution
    master: str = "local[*]"
    app_name: str = "fairy_spark"
    shuffle_partitions: int = 32
    driver_memory: str = "32g"
    session_timezone: str = "UTC"
    adaptive_enabled: bool = True
    # At 100 TB this is the lever that sizes scan tasks (analog of the
    # reference's chunked streaming reads, worker/src/h2_service.rs:93-121).
    max_partition_bytes: str = "134217728"  # 128 MiB
    broadcast_threshold: str = "67108864"   # 64 MiB — dims up to this size broadcast

    # Warehouse for managed/bucketed tables (KV store backing)
    warehouse_dir: str = field(
        default_factory=lambda: os.environ.get(
            "FAIRY_SPARK_WAREHOUSE", "/tmp/fairy_spark_warehouse"
        )
    )

    @classmethod
    def from_env(cls, prefix: str = "FAIRY_SPARK_") -> "EngineConfig":
        """Env-overlay loading, mirroring the reference's env-over-file
        precedence (common/src/settings.rs:101-115)."""
        cfg = cls()
        for f in fields(cfg):
            env_key = prefix + f.name.upper()
            if env_key in os.environ:
                raw = os.environ[env_key]
                if f.type in ("int", int):
                    setattr(cfg, f.name, int(raw))
                elif f.type in ("bool", bool):
                    setattr(cfg, f.name, raw.lower() in ("1", "true", "yes"))
                else:
                    setattr(cfg, f.name, raw)
        return cfg
