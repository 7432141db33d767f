"""Engine facade — the SousChef-equivalent entry point.

Reproduces the reference's declarative lifecycle (reference:
src/sous_chef/sous_chef.py — __init__ :47-98, _resolve_path :100-105,
_import_source_class :107-117, _filter_source_config :119-125,
_init_data_sources :127-160, create_from_yaml :167-260) WITHOUT Feast:
applied objects land in a JSON manifest registry, and
``get_historical_features`` is a real Ray Data point-in-time join
(stages/asof.py) instead of a Feast delegation.

DTYPE_MAP / SOURCE_PARAMS / error strings keep the reference contract
(unknown dtype → KeyError; unknown source type → ImportError listing
available types; dry_run returns objects without applying).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from datetime import timedelta
from pathlib import Path
from typing import Dict, List, Optional, Union

import pandas as pd
import pyarrow as pa
import yaml

from sous_chef_ray.schema import DTYPE_MAP
from sous_chef_ray.sources.registry import SOURCE_PARAMS, SourceRegistry, filter_source_config
from sous_chef_ray.sqlschema import SQLSourceRegistry
from sous_chef_ray.validators import ConfigValidator

logger = logging.getLogger("sous_chef_ray")
logger.propagate = False


@dataclass
class Entity:
    name: str
    join_keys: List[str]
    description: str = ""
    tags: Dict = field(default_factory=dict)


@dataclass
class DataSource:
    name: str
    source_type: str
    params: Dict = field(default_factory=dict)

    def load(self, columns=None):
        """Open this source as a ray.data.Dataset."""
        reader = SourceRegistry.get_source(self.source_type)
        return reader(columns=columns, **self.params)


@dataclass
class Field_:
    name: str
    dtype: pa.DataType
    tags: Dict = field(default_factory=dict)


@dataclass
class FeatureView:
    name: str
    entities: List[Entity]
    schema: List[Field_]
    source: DataSource
    ttl: timedelta = timedelta(days=1)
    tags: Dict = field(default_factory=dict)


@dataclass
class FeatureService:
    name: str
    features: List[FeatureView]
    description: str = ""
    tags: Dict = field(default_factory=dict)


class Engine:
    """YAML-driven feature-view compiler + Ray Data retrieval engine."""

    DTYPE_MAP = DTYPE_MAP
    SOURCE_PARAMS = SOURCE_PARAMS

    def __init__(
        self,
        repo_path: str,
        config: Dict,
        metadata_rules: Dict,
        check_dirs: bool = True,
        log_level: str = "INFO",
        native_dtypes: bool = False,
    ):
        """``native_dtypes=True`` opts into the full Arrow dtype table
        (schema.NATIVE_DTYPE_MAP: ARRAY_INT32 token columns, TIMESTAMP,
        BINARY, ...) for YAML schemas — lifting the reference's
        FLOAT/INT64-only declared universe and its arrays-as-STRING
        collapse (SURVEY §1.3). Default False keeps reference-exact
        behavior (unknown dtype → KeyError)."""
        logger.handlers = []
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
        logger.setLevel(getattr(logging, log_level.upper()))

        self.native_dtypes = native_dtypes
        if native_dtypes:
            from sous_chef_ray.schema import NATIVE_DTYPE_MAP

            self.dtype_map = NATIVE_DTYPE_MAP
        else:
            self.dtype_map = self.DTYPE_MAP
        if not config:
            raise ValueError("feast_config is required")
        if not metadata_rules:
            raise ValueError("metadata_rules is required")

        self.repo_path = Path(repo_path)
        self.metadata_rules = metadata_rules
        self.config = config
        self.offline_store_type = config.get("offline_store", {}).get("type", "file")

        self._entities: Dict[str, Entity] = {}
        self._sources: Dict[str, DataSource] = {}
        self._applied: Dict[str, object] = {}

        if check_dirs:
            repo = self.repo_path / "feature_repo"
            repo.mkdir(parents=True, exist_ok=True)
            with open(repo / "feature_store.yaml", "w") as f:
                yaml.dump(config, f)
            self.registry_path = repo / "registry.json"
            self._init_data_sources(config)
        else:
            self.registry_path = None

    # -- registration ------------------------------------------------------

    def _resolve_path(self, path: str) -> str:
        abs_path = self.repo_path / path
        abs_path.parent.mkdir(parents=True, exist_ok=True)
        return str(abs_path)

    def _init_data_sources(self, config: Dict) -> None:
        for spec in config.get("entities", []):
            ent = Entity(
                name=spec["name"],
                join_keys=[spec["join_key"]],
                description=spec.get("description", ""),
            )
            self._entities[ent.name] = ent

        for name, spec in config.get("data_sources", {}).items():
            spec = dict(spec)
            source_type = spec.pop("type", "file").lower()
            # raises ImportError with available types on unknown type
            SourceRegistry.get_source(source_type)
            if "path" in spec:
                spec["path"] = self._resolve_path(spec["path"])
            params = filter_source_config(source_type, spec)
            self._sources[name] = DataSource(name=name, source_type=source_type, params=params)
        self._write_registry()

    def _write_registry(self) -> None:
        if self.registry_path is None:
            return
        doc = {
            "entities": {n: vars(e) for n, e in self._entities.items()},
            "sources": {
                n: {"type": s.source_type, "params": s.params}
                for n, s in self._sources.items()
            },
            "applied": sorted(self._applied),
        }
        with open(self.registry_path, "w") as f:
            json.dump(doc, f, indent=2, default=str)

    def get_entity(self, name: str) -> Optional[Entity]:
        return self._entities.get(name)

    def get_data_source(self, name: str) -> Optional[DataSource]:
        return self._sources.get(name)

    # -- YAML compiler -----------------------------------------------------

    def create_from_yaml(
        self,
        yaml_path: Union[str, Path],
        apply: bool = True,
        dry_run: bool = False,
    ) -> Dict[str, Union[FeatureView, FeatureService]]:
        yaml_path = self.repo_path / yaml_path
        if not os.path.exists(yaml_path):
            raise FileNotFoundError(f"Config file not found: {yaml_path}")
        with open(yaml_path) as f:
            config = yaml.safe_load(f)
        if "feature_views" not in config:
            raise ValueError("No feature_views section found in YAML")

        errors = ConfigValidator.validate(config, metadata_rules=self.metadata_rules)
        if errors:
            raise ValueError("Configuration validation failed:\n" + "\n".join(errors))

        views: Dict[str, FeatureView] = {}
        logger.info(f"Creating feature views from {yaml_path}")
        for name, spec in config["feature_views"].items():
            source = self.get_data_source(spec["source_name"])
            if source is None:
                raise ValueError(f"Data source '{spec['source_name']}' not found")
            entities = [self.get_entity(e) for e in spec["entities"]]
            schema = []
            for f in spec["schema"]:
                dtype_name = f["dtype"].upper() if self.native_dtypes else f["dtype"]
                fld = Field_(name=f["name"], dtype=self.dtype_map[dtype_name])
                if "tags" in f:
                    fld.tags = f["tags"]
                schema.append(fld)
            views[name] = FeatureView(
                name=name,
                entities=entities,
                ttl=timedelta(days=spec.get("ttl_days", 1)),
                source=source,
                schema=schema,
                tags=spec.get("tags", {}),
            )

        created: Dict[str, Union[FeatureView, FeatureService]] = dict(views)
        if "feature_services" in config:
            logger.info("Creating feature services")
            for name, spec in config["feature_services"].items():
                members = []
                for view_name in spec["features"]:
                    if view_name not in views:
                        raise ValueError(f"Feature view '{view_name}' not found")
                    members.append(views[view_name])
                created[name] = FeatureService(
                    name=name,
                    features=members,
                    description=spec.get("description", ""),
                    tags=spec.get("tags", {}),
                )

        if apply and not dry_run:
            self.apply(list(created.values()))
        logger.debug(f"Created objects: {list(created.keys())}")
        return created

    def apply(self, objects: List[object]) -> None:
        for obj in objects:
            self._applied[getattr(obj, "name")] = obj
        self._write_registry()

    def get_feature_service(self, name: str) -> FeatureService:
        svc = self._applied.get(name)
        if not isinstance(svc, FeatureService):
            raise KeyError(f"Feature service '{name}' not found")
        return svc

    def _create_sql_source(self, name: str, config: Dict):
        source_class = SQLSourceRegistry.get_source_class(self.offline_store_type)
        if source_class is None:
            raise ValueError(f"Unsupported SQL source type: {self.offline_store_type}")
        return source_class()

    def execute_sql(self, sql: str, data_dir: Optional[str] = None, **kwargs):
        """Run a validated SELECT over ``{data_dir}/{table}.parquet`` via
        the sqlexec compiler — the Ray-native analogue of the reference's
        warehouse pushdown (ref sql_sources.py:315-322: the reference
        SENDS the SQL to Snowflake/Teradata/EMR; this engine executes it
        on Ray Data). When the configured offline store is a SQL dialect,
        the query must also pass that dialect's ported validator first.

        Returns a streaming ``ray.data.Dataset`` (projections/windows) or
        a bounded ``pandas.DataFrame`` (aggregates)."""
        from sous_chef_ray.sqlexec import sql_execute

        if self.offline_store_type != "file":
            src = self._create_sql_source("__exec__", {})
            if not src.validate_query(sql):
                raise ValueError(
                    f"query rejected by {type(src).__name__} validator")
        return sql_execute(sql, data_dir or str(self.repo_path), **kwargs)

    # -- online store (the sqlite analogue the reference configs declare) --

    def _online_store(self, store_path: Optional[str] = None):
        from sous_chef_ray.state.online import SqliteOnlineStore

        if store_path is None:
            cfg = self.config.get("online_store", {}) or {}
            if cfg.get("type", "sqlite") != "sqlite":
                raise ValueError(
                    f"unsupported online store type: {cfg.get('type')!r}")
            store_path = cfg.get("path", "online_store.db")
            store_path = str(self.repo_path / store_path)
        return SqliteOnlineStore(store_path)

    def materialize_online(
        self,
        features: Union[FeatureService, FeatureView, List[FeatureView]],
        store_path: Optional[str] = None,
    ) -> Dict[str, int]:
        """Materialize each view's LATEST feature row per entity key into
        the configured sqlite online store (ref configs declare
        ``online_store: {type: sqlite, path: ...}`` and delegate this to
        Feast — tests/test_feature_services.py:14-19). The latest-row
        reduce is the engine's distributed bucketed plan
        (stages/dedup.latest_per_key); only one row per key reaches the
        writer. Returns {view_name: rows written}."""
        from sous_chef_ray.state.online import materialize_online

        if isinstance(features, FeatureService):
            views = features.features
        elif isinstance(features, FeatureView):
            views = [features]
        else:
            views = list(features)
        store = self._online_store(store_path)
        written: Dict[str, int] = {}
        for view in views:
            key = view.entities[0].join_keys[0]
            ts_field = view.source.params.get(
                "timestamp_field", "event_timestamp")
            created = view.source.params.get("created_timestamp_column")
            value_cols = [f.name for f in view.schema]
            need = [key, ts_field] + ([created] if created else []) \
                + value_cols
            ds = view.source.load(columns=need)
            written[view.name] = materialize_online(
                ds, store, view.name, key, ts_field, tie_col=created)
        return written

    def get_online_features(
        self,
        features: Union[FeatureService, FeatureView, List[FeatureView]],
        entity_rows: List[Dict],
        store_path: Optional[str] = None,
    ) -> pd.DataFrame:
        """Online point lookups: one output row per entity_row, columns
        concatenated across the service's views (same column contract as
        get_historical_features), typed nulls for unknown keys."""
        if isinstance(features, FeatureService):
            views = features.features
        elif isinstance(features, FeatureView):
            views = [features]
        else:
            views = list(features)
        store = self._online_store(store_path)
        out: Optional[pa.Table] = None
        for view in views:
            key = view.entities[0].join_keys[0]
            keys = [row[key] for row in entity_rows]
            t = store.read(view.name, keys)
            cols = {n: t[n] for n in t.column_names}
            for f in view.schema:
                cols[f.name] = t[f.name].cast(f.dtype)
            t = pa.table(cols)
            if out is None:
                out = t
            else:
                for f in view.schema:
                    out = out.append_column(f.name, t[f.name])
        return out.to_pandas()

    # -- retrieval (the data plane Feast used to own) ----------------------

    def get_historical_features(
        self,
        entity_df: Union[pd.DataFrame, pa.Table],
        features: Union[FeatureService, FeatureView, List[FeatureView]],
        concurrency: int | tuple = 4,
    ) -> pd.DataFrame:
        """Point-in-time retrieval: for each spine row return, per member
        view, the latest feature row at-or-before event_timestamp within
        the view's TTL (nulls otherwise) — SURVEY §2.B2/B3/B6/B7."""
        from sous_chef_ray.stages.asof import asof_join_broadcast

        if isinstance(features, FeatureService):
            views = features.features
        elif isinstance(features, FeatureView):
            views = [features]
        else:
            views = list(features)

        spine = (
            pa.Table.from_pandas(entity_df, preserve_index=False)
            if isinstance(entity_df, pd.DataFrame)
            else entity_df
        )
        out = spine
        for view in views:
            key = view.entities[0].join_keys[0]
            ts_field = view.source.params.get("timestamp_field", "event_timestamp")
            created = view.source.params.get("created_timestamp_column")
            value_cols = [f.name for f in view.schema]
            need = [key, ts_field] + ([created] if created else []) + value_cols
            # prune at the read: only join keys, timestamps and declared
            # feature columns leave storage (SURVEY "prune at the read")
            ds = view.source.load(columns=need)
            slim = view.source.load(
                columns=[key, ts_field] + ([created] if created else [])
            )
            joined = asof_join_broadcast(
                ds,
                out,
                key=key,
                spine_ts="event_timestamp",
                feature_ts=ts_field,
                tie_col=created,
                payload_cols=value_cols,
                ttl=pd.Timedelta(view.ttl),
                concurrency=concurrency,
                slim_features=slim,
            )
            # cast to the declared schema (B7)
            cols = {n: joined[n] for n in joined.column_names}
            for f in view.schema:
                cols[f.name] = joined[f.name].cast(f.dtype)
            out = pa.table(cols)
        return out.to_pandas()


# Drop-in alias matching the reference's class name
SousChef = Engine
