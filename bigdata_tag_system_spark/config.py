"""Multi-environment configuration layer.

Mirrors the reference's config system in shape — per-environment config
objects resolved by name through a manager with an env-var fallback
(``src/config/manager.py:23-52``), dataclasses per concern with a merged
Spark-conf view and a validate step (``src/config/base.py:11-140``,
``environments/{local,glue-dev,glue-prod}/config.py``) — re-expressed
for this engine:

- Environments are **data, not code**: built-ins plus JSON files (pass a
  ``*.json`` path or drop one in ``$SPARK_GRAFT_ENV_DIR``), instead of
  the reference's dynamically-imported per-env Python modules. Secrets
  never live in the profile — JDBC credentials resolve from environment
  variables named by the profile, matching the reference's
  ``os.getenv``-based env configs.
- The Spark profile feeds :func:`~bigdata_tag_system_spark.session.get_spark`,
  so every environment inherits the engine's scale defaults (AQE, Kryo,
  Arrow, UTC) and only overrides what differs: master, memory, shuffle
  partitions, extra conf.
- The store profile carries the CLI's file-store defaults (path, bucket
  count, user key), so ``--env prod`` replaces four flags; explicit
  flags still win.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class SparkProfile:
    """Session knobs layered over the engine defaults in ``session.py``."""

    app_name: str = "bigdata-tag-system-spark"
    master: str | None = None          # None → local[$SPARK_GRAFT_CPUS] / spark-submit
    shuffle_partitions: int | None = None
    driver_memory: str | None = None
    extra_conf: dict[str, str] = field(default_factory=dict)

    def to_conf(self) -> dict[str, str]:
        conf = dict(self.extra_conf)
        if self.driver_memory:
            conf["spark.driver.memory"] = self.driver_memory
        return conf


@dataclass
class StoreProfile:
    """File-store defaults for the CLI (reference: per-env S3 paths)."""

    path: str | None = None
    buckets: int = 0                   # 0 = plain parquet store
    user_col: str = "user_id"
    rules_path: str | None = None


@dataclass
class JdbcProfile:
    """JDBC sink coordinates (reference ``MySQLConfig``). Credentials are
    NOT stored here — ``user_env``/``password_env`` name the environment
    variables to read at connect time."""

    url: str = ""
    table: str = ""
    dialect: str = "mysql"
    batch_size: int = 2000
    max_partitions: int = 8
    user_env: str = "TAG_DB_USER"
    password_env: str = "TAG_DB_PASSWORD"

    def connection_properties(self) -> dict[str, str]:
        props = {"batchsize": str(self.batch_size)}
        user = os.environ.get(self.user_env, "")
        password = os.environ.get(self.password_env, "")
        if user:
            props["user"] = user
        if password:
            props["password"] = password
        return props


@dataclass
class EnvConfig:
    """One named environment: session + store + optional sink profile."""

    name: str
    spark: SparkProfile = field(default_factory=SparkProfile)
    store: StoreProfile = field(default_factory=StoreProfile)
    jdbc: JdbcProfile | None = None
    log_level: str = "WARN"

    def validate(self) -> "EnvConfig":
        if not self.name:
            raise ValueError("environment needs a name")
        if self.store.buckets < 0:
            raise ValueError(f"store.buckets must be >= 0, got {self.store.buckets}")
        if self.jdbc is not None and not self.jdbc.url:
            raise ValueError(f"env {self.name!r}: jdbc profile without url")
        if self.log_level not in ("DEBUG", "INFO", "WARN", "ERROR"):
            raise ValueError(f"env {self.name!r}: bad log_level {self.log_level!r}")
        return self

    def session(self, app_name: str | None = None):
        """Build (or fetch) the SparkSession for this environment."""
        from bigdata_tag_system_spark.session import get_spark

        return get_spark(
            app_name=app_name or self.spark.app_name,
            master=self.spark.master,
            shuffle_partitions=self.spark.shuffle_partitions,
            extra_conf=self.spark.to_conf(),
        )

    def to_dict(self) -> dict:
        return asdict(self)


def _from_dict(name: str, raw: dict) -> EnvConfig:
    spark = SparkProfile(**raw.get("spark", {}))
    store = StoreProfile(**raw.get("store", {}))
    jdbc = JdbcProfile(**raw["jdbc"]) if raw.get("jdbc") else None
    return EnvConfig(
        name=raw.get("name", name),
        spark=spark,
        store=store,
        jdbc=jdbc,
        log_level=raw.get("log_level", "WARN"),
    ).validate()


# Built-in environments — the reference ships local / glue-dev / glue-prod;
# here: a laptop/test profile and a cluster profile that defers master and
# sizing to spark-submit.
_BUILTIN: dict[str, dict] = {
    "local": {
        "spark": {"app_name": "tag-engine-local", "shuffle_partitions": 32},
        "store": {"buckets": 0},
        "log_level": "WARN",
    },
    "cluster": {
        "spark": {
            "app_name": "tag-engine",
            # master/shuffle sizing come from spark-submit on a real cluster
            "extra_conf": {"spark.sql.adaptive.enabled": "true"},
        },
        # bucketed store by default at scale: the incremental merge reads
        # the (large) store side with zero Exchange
        "store": {"buckets": 256},
        "log_level": "WARN",
    },
}

_REGISTERED: dict[str, EnvConfig] = {}


def register_environment(cfg: EnvConfig) -> EnvConfig:
    """Register a programmatic environment (tests, embedding apps)."""
    _REGISTERED[cfg.name] = cfg.validate()
    return cfg


def load_env(name: str | None = None) -> EnvConfig:
    """Resolve an environment by precedence:

    1. explicit ``name`` (or ``$SPARK_GRAFT_ENV``, default ``local``)
    2. a ``*.json`` path — the file IS the environment
    3. programmatically registered environments
    4. ``$SPARK_GRAFT_ENV_DIR/<name>.json``
    5. built-ins (``local``, ``cluster``)
    """
    name = name or os.environ.get("SPARK_GRAFT_ENV", "local")
    if name.endswith(".json"):
        with open(name) as fh:
            raw = json.load(fh)
        stem = os.path.splitext(os.path.basename(name))[0]
        return _from_dict(stem, raw)
    if name in _REGISTERED:
        return _REGISTERED[name]
    env_dir = os.environ.get("SPARK_GRAFT_ENV_DIR")
    if env_dir:
        candidate = os.path.join(env_dir, f"{name}.json")
        if os.path.exists(candidate):
            with open(candidate) as fh:
                return _from_dict(name, json.load(fh))
    if name in _BUILTIN:
        return _from_dict(name, _BUILTIN[name])
    known = sorted({*_BUILTIN, *_REGISTERED})
    raise KeyError(f"unknown environment {name!r} (known: {known})")
